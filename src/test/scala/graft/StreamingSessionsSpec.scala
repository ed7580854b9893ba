package graft

import graft.streaming.{SEvent, SessionOut, StreamingSessions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sessionization: closed-session equivalence with the batch
  * `sessionize` operator over the real fixture, and watermark-driven
  * closure of idle sessions. */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("closed sessions match batch sessionize over the fixture replay") {
    // fixture events in eventId order (= the batch operator's lag order)
    val events = graft.operators.Detectors
      .prepareEvents(graft.sources.Tables.events(spark, dir))
      .select("key", "event_id", "ts_sec")
      .as[(String, Long, Long)].collect()
      .sortBy(_._2)
      .map { case (k, id, ts) => SEvent(k, id, ts) }.toSeq

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val q = StreamingSessions.sessions(ms.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val got =
      try {
        events.grouped(200).foreach { g => ms.addData(g); q.processAllAvailable() }
        spark.table("sessions_out").as[SessionOut].collect().toSeq
      } finally q.stop()

    // batch truth: every session except each key's last (still open in
    // the stream — no successor event ever closes it)
    val batch = graft.operators.Analytics.sessionize(spark, dir)
      .select("key", "session_id", "n_events", "start_sec", "end_sec", "duration_sec")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val lastPerKey = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expectClosed = batch.filter { r => r._2 != lastPerKey(r._1) }
      .map(r => SessionOut(r._1, r._2, r._3, r._4, r._5, r._6)).toSet
    assert(got.toSet == expectClosed)
    assert(got.size == expectClosed.size)
  }

  test("watermark closes idle sessions without a successor event") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-wm").toString
    val q = StreamingSessions.sessions(ms.toDS(), gapSec = 10,
        closeOnWatermark = true)
      .writeStream.format("memory").queryName("sessions_wm")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // key A: 3 events within the gap -> one open session
      ms.addData(Seq(SEvent("A", 1, 100), SEvent("A", 2, 103), SEvent("A", 3, 105)))
      q.processAllAvailable()
      assert(spark.table("sessions_wm").isEmpty)
      // key B far in the future advances the watermark past A's
      // close boundary (105 + 10); the next batch fires A's timeout
      ms.addData(Seq(SEvent("B", 4, 1000)))
      q.processAllAvailable()
      ms.addData(Seq(SEvent("B", 5, 1001)))
      q.processAllAvailable()
      val closed = spark.table("sessions_wm").as[SessionOut].collect()
      assert(closed.toSeq == Seq(SessionOut("A", 1, 3, 100, 105, 5)))
    } finally q.stop()
  }
}
