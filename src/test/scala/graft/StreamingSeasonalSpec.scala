package graft

import graft.operators.Analytics
import graft.sources.Tables
import graft.streaming.StreamingSeasonal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming seasonal scorer replaying the fixture events against
  * the batch-trained baseline must flag exactly the batch query's
  * alerts — stateless stream-static scoring, so the equivalence is
  * row-for-row regardless of micro-batch boundaries. */
case class SeasonalEv(event_id: Long, event_type: String, ts_sec: Long,
  value: Option[Double])

class StreamingSeasonalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private type Ev = SeasonalEv

  test("micro-batch replay against the trained baseline == batch alerts") {
    implicit val sqlCtx = spark.sqlContext
    // sf0.01, not sf0.001: the smaller fixture's (type, hour) cells all
    // sit below the 24-row min history, which would make this vacuous
    val dir = "/root/testdata/sf0.01"
    val events = Tables.events(spark, dir)
      .select("event_id", "event_type", "ts_sec", "value")
    val baseline = Analytics.seasonalBaseline(
      Analytics.seasonalPrep(events)).localCheckpoint()

    val rows = events.as[SeasonalEv].collect().toSeq.sortBy(_.event_id)
    val ms = MemoryStream[SeasonalEv]
    val q = StreamingSeasonal.alerts(ms.toDF(), baseline)
      .writeStream.format("memory").queryName("seasonal_stream")
      .outputMode("append").start()
    try {
      rows.grouped(211).foreach { g => ms.addData(g); q.processAllAvailable() }
      val got = spark.table("seasonal_stream")
        .select("event_id").as[Long].collect().toSet
      val want = Analytics.seasonalAlerts(spark, dir)
        .select("event_id").as[Long].collect().toSet
      assert(got == want, s"stream ${got.size} vs batch ${want.size}")
      assert(want.nonEmpty) // the equivalence is not vacuous
    } finally q.stop()
  }

  test("null-valued events are ignored by the scorer, as in batch") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = Analytics.seasonalBaseline(Analytics.seasonalPrep(
      Tables.events(spark, dir).select("event_id", "event_type", "ts_sec", "value")))
      .localCheckpoint()
    val ms = MemoryStream[SeasonalEv]
    val q = StreamingSeasonal.alerts(ms.toDF(), baseline)
      .writeStream.format("memory").queryName("seasonal_null")
      .outputMode("append").start()
    try {
      ms.addData(SeasonalEv(1L, "click", 0L, None))
      q.processAllAvailable()
      assert(spark.table("seasonal_null").isEmpty)
    } finally q.stop()
  }
}
