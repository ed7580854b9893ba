package graft

import graft.operators.Detectors
import graft.sources.Tables
import graft.streaming.{SAlert, StreamingThrottle}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming alert throttle vs the batch form: replaying the fixture's
  * threshold alerts in arrival order must pass exactly the batch
  * survivors (first per (rule, key, bucket)); a straggler for an
  * already-emitted bucket must stay suppressed across batches and a
  * RocksDB state round-trip. */
class StreamingThrottleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val period = 600L

  /** transformWithState needs a multi-column-family store: run `body`
    * with RocksDB as the provider, restoring the prior conf after. */
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

  test("ordered replay passes exactly the batch survivors; stragglers suppressed") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      val batchAlerts = Detectors.thresholdAlerts(
        Tables.events(spark, dir), SparkEntry.FixtureRules.threshold)
      val alerts = batchAlerts.as[SAlert].collect().toSeq
        .sortBy(a => (a.ts_sec, a.event_id))
      val ms = MemoryStream[SAlert]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-thr-ckpt").toString
      val q = StreamingThrottle.throttled(ms.toDS(), period)
        .writeStream.format("memory").queryName("thr_stream")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        alerts.grouped(37).foreach { g => ms.addData(g); q.processAllAvailable() }
        val got = spark.table("thr_stream").as[SAlert].collect()
          .map(a => (a.rule_name, a.key, a.ts_sec, a.event_id)).toSet
        val want = Detectors.throttle(batchAlerts, period)
          .select("rule_name", "key", "ts_sec", "event_id")
          .as[(String, String, Long, Long)].collect().toSet
        assert(got == want)

        // stragglers: re-send every survivor — all buckets already
        // emitted, so nothing new may pass
        val before = spark.table("thr_stream").count()
        ms.addData(alerts)
        q.processAllAvailable()
        assert(spark.table("thr_stream").count() == before)
      } finally q.stop()
    }
  }

  test("checkpoint recovery: a straggler for a pre-restart bucket stays suppressed") {
    withRocksDBProvider { recoveryBody() }
  }

  private def recoveryBody(): Unit = {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-thr-src")
    val outDir = java.nio.file.Files.createTempDirectory("graft-thr-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-thr-rec").toString
    def alert(id: Long, ts: Long): String =
      s"""{"rule_name":"r1","key":"u1","ts_sec":$ts,"event_id":$id,""" +
        s""""value":1.0,"details":"d","original_event":"{}"}"""
    val schema = org.apache.spark.sql.Encoders.product[SAlert].schema
    def runOnce(): Unit = {
      val alerts = spark.readStream.schema(schema).json(srcDir.toString)
        .as[SAlert]
      val q = StreamingThrottle.throttled(alerts, period)
        .writeStream.format("json").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    // bucket 1666 = ts 999600..1000199 (1000000 div 600): two alerts in
    // it, first survives; ts 1000600 below is bucket 1667
    java.nio.file.Files.writeString(srcDir.resolve("a.json"),
      Seq(alert(1, 1000000L), alert(2, 1000010L)).mkString("\n"))
    runOnce()
    // restart: a straggler in the SAME bucket only stays suppressed if
    // the lastBucket state was recovered from the checkpoint; the
    // next-bucket alert must pass
    java.nio.file.Files.writeString(srcDir.resolve("b.json"),
      Seq(alert(3, 1000020L), alert(4, 1000600L)).mkString("\n"))
    runOnce()
    val got = spark.read.schema(schema).json(outDir).as[SAlert]
      .collect().map(_.event_id).toSet
    assert(got == Set(1L, 4L))
  }
}
