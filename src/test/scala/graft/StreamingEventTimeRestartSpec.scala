package graft

import graft.model._
import graft.operators.Detectors
import graft.streaming.{SEvent, StreamingDetectors}

/** Checkpoint-restart continuity for the EVENT-TIME mode under
  * out-of-order replay (VERDICT r9 item 8): the query is stopped while
  * per-key ListState still BUFFERS undrained out-of-order events and
  * event-time timers are armed; the restarted query must restore
  * buffers + timers + watermark and end with EXACTLY the batch
  * (event-time-ordered) alert set. EquivalenceSpec pins
  * disorder == batch for an uninterrupted run; this pins that a
  * mid-disorder restart changes nothing. Scale twin: the `etrestart`
  * phase of [[graft.tools.StateScaleBench]] (1M keys, SCALE_NOTES).
  */
class StreamingEventTimeRestartSpec extends SparkSpec {
  import spark.implicits._

  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("thr", "value", 50.0),
    RateRule("rate", "user_id", 30, 2.0),
    StatisticalRule("stat", "value", 4, 1.5))

  test("event-time restart mid-disorder reproduces the batch alerts") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val rnd = new scala.util.Random(424242)
      val n = 60
      val evs = (0 until n).map { i =>
        SEvent(rnd.nextInt(3).toString, i.toLong, 1000L + i * 7L,
          Some(rnd.nextInt(10000) / 100.0))
      }
      val df = evs.map(e => (e.eventId, e.tsSec, e.key.toLong, e.fields("value")))
        .toDF("event_id", "ts_sec", "user_id", "value")
      val batch = Detectors.allAlerts(df, rules)
        .select("rule_name", "key", "event_id")
        .as[(String, String, Long)].collect().toSet
      assert(batch.nonEmpty)
      // bounded disorder, as in EquivalenceSpec: shuffle inside blocks of
      // 6 (max displacement 35 s) < the 60 s watermark delay
      val arrival = evs.grouped(6).flatMap(b => rnd.shuffle(b)).toSeq
      val maxTs = evs.map(_.tsSec).max
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[SEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-etrst").toString
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String, Long)]()
      def startQ() = StreamingDetectors.alertsEventTime(ms.toDS(), rules,
          java.time.Duration.ofSeconds(60))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.SAlert], _: Long) =>
          b.toDF().select("rule_name", "key", "event_id")
            .as[(String, String, Long)].collect().foreach(got.add)
          ()
        }.start()
      var q = startQ()
      try {
        val groups = arrival.grouped(10).toSeq
        groups.zipWithIndex.foreach { case (g, i) =>
          ms.addData(g)
          q.processAllAvailable()
          if (i == 2) {
            // stop with ~half the stream ingested: later blocks are still
            // buffered below the watermark, timers armed — the hard case
            q.stop()
            q = startQ()
          }
        }
        // sentinels push the watermark past every real event
        ms.addData(SEvent("zz_flush", n.toLong, maxTs + 1000L))
        q.processAllAvailable()
        ms.addData(SEvent("zz_flush", n.toLong + 1, maxTs + 2000L))
        q.processAllAvailable()
      } finally q.stop()
      import scala.jdk.CollectionConverters._
      assert(got.iterator().asScala.toSet == batch,
        s"restarted event-time run diverged: got=${got.size} batch=${batch.size}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
