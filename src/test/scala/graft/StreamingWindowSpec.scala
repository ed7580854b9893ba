package graft

import graft.streaming.SEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native `session_window` in Structured Streaming: the streaming twin
  * of the batch `session_native` query (same built-in operator, same
  * 30-minute gap), with watermark-driven session finalization in Append
  * mode — sessions are emitted exactly once, when the watermark passes
  * their end. Complements StreamingSessionsSpec, which pins the
  * hand-managed group-state formulation. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming session_window == brute-force gap sessions after watermark flush") {
    val events = graft.operators.Detectors
      .prepareEvents(graft.sources.Tables.events(spark, dir))
      .select("key", "event_id", "ts_sec")
      .as[(String, Long, Long)].collect()
      .sortBy(_._3)
      .map { case (k, id, ts) => SEvent(k, id, ts) }.toSeq
    val maxTs = events.map(_.tsSec).max
    // sentinel far past everything: drives the watermark beyond every
    // real session's end so Append mode flushes them all
    val sentinel = SEvent("__sentinel__", -1L, maxTs + 86400L)

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-swin").toString
    val q = ms.toDS()
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("key"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"),
        col("session_window.start").cast("long").as("start_sec"),
        col("session_window.end").cast("long").as("end_sec"),
        col("n_events"))
      .writeStream.format("memory").queryName("swin_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val got =
      try {
        events.grouped(300).foreach { g => ms.addData(g); q.processAllAvailable() }
        ms.addData(Seq(sentinel)); q.processAllAvailable()
        spark.table("swin_out").as[(String, Long, Long, Long)].collect().toSet
      } finally q.stop()

    // brute-force truth at second precision (gap >= 1800 starts anew)
    val expected = events.groupBy(_.key).flatMap { case (k, es) =>
      val ts = es.map(_.tsSec).sorted
      val sessions = ts.foldLeft(List.empty[List[Long]]) {
        case (Nil, t) => List(List(t))
        case (cur :: done, t) =>
          if (t - cur.head >= 1800L) List(t) :: cur :: done
          else (t :: cur) :: done
      }
      sessions.map(s => (k, s.last, s.head + 1800L, s.length.toLong))
    }.toSet
    assert(got == expected)
  }
}
