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

  test("ordered replay passes exactly the batch survivors; stragglers suppressed") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
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
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
