package graft

import graft.streaming.{CusumEvent, HoltDay, StreamingHolt}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Day-close pin for the live forecaster: streaming Holt over a
  * day-ordered 3-micro-batch replay must emit byte-identical
  * (day, y, level8, trend8, forecast8) rows to the batch query for every
  * CLOSED day. */
class StreamingHoltSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDBProvider(body: => Unit): Unit = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streaming day-close Holt == batch recurrence on closed days") {
    withRocksDBProvider {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    val batch = graft.operators.Analytics.holtForecast(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val lastDay = batch.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closedExpect = batch.filter { case ((t, d), _) => d != lastDay(t) }
    assert(closedExpect.nonEmpty)

    val evs = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .as[CusumEvent].collect().sortBy(_.day)
    val days = evs.map(_.day).distinct.sorted
    val cut1 = days(days.length / 3)
    val cut2 = days(2 * days.length / 3)
    val chunks = Seq(
      evs.filter(_.day <= cut1),
      evs.filter(e => e.day > cut1 && e.day <= cut2),
      evs.filter(_.day > cut2))

    val got = new java.util.concurrent.ConcurrentHashMap[(String, String),
      (Long, Long, Long, Long)]()
    val ms = MemoryStream[CusumEvent]
    val q = StreamingHolt.forecasts(ms.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HoltDay], _: Long) =>
        b.collect().foreach(d =>
          got.put((d.event_type, d.day), (d.y, d.level8, d.trend8, d.forecast8)))
        ()
      }.start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    assert(got.asScala.toMap == closedExpect,
      s"streaming ${got.size} rows != batch ${closedExpect.size} closed rows")
    }
  }
}
