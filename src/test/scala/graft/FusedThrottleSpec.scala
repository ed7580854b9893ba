package graft

import graft.model._
import graft.streaming.{SAlert, SEvent, StreamingDetectors, StreamingThrottle}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The fused detect+throttle operator ([[StreamingDetectors.alertsTwsThrottled]],
  * one exchange + one RocksDB store) against the staged form
  * (`throttled(alertsTws(...))`, two of each): on a storm replay — the
  * regime the throttle exists for, alert volume ~ event volume — the two
  * topologies must emit the SAME alert set, byte-equal per field, across
  * every micro-batch boundary; and the fused state (detector deques AND
  * per-rule throttle watermarks in one row) must survive a checkpoint
  * restart. */
class FusedThrottleSpec extends SparkSpec {
  import spark.implicits._

  private val period = 600L
  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("t1", "value", 70.0),
    RateRule("r1", "key", 3600, 3.0),
    StatisticalRule("s1", "value", windowSize = 5, deviationFactor = 2.0))

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

  /** Storm workload: 12 keys, 2400 events, ts advancing one second per
    * event-id so period buckets roll over mid-run; values cycle 0..99
    * (threshold fires on >70, the stat window sees genuine outliers, and
    * the 3600 s rate deque never evicts, so the rate rule fires on
    * EVERY event once the deque passes 3) — alert volume ~ event
    * volume, plus a sprinkle of events missing the measured field. */
  private def storm: Seq[SEvent] = (0 until 2400).map { i =>
    val fields =
      if (i % 31 == 30) Map.empty[String, Double]
      else Map("value" -> (i * 37 % 100).toDouble)
    SEvent(s"k${i % 12}", i.toLong, i.toLong, fields, s"""{"i":$i}""")
  }

  private type Key =
    (String, String, Long, Long, Double, String, String)
  private def key(a: SAlert): Key =
    (a.rule_name, a.key, a.ts_sec, a.event_id, a.value, a.details,
      a.original_event)

  test("fused == staged on a storm replay, every field byte-equal") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      def run(name: String,
          build: org.apache.spark.sql.Dataset[SEvent] =>
            org.apache.spark.sql.Dataset[SAlert]): Set[Key] = {
        val ms = MemoryStream[SEvent]
        val ckpt =
          java.nio.file.Files.createTempDirectory(s"graft-fus-$name").toString
        val q = build(ms.toDS()).writeStream.format("memory")
          .queryName(s"fused_eq_$name").outputMode("append")
          .option("checkpointLocation", ckpt).start()
        try {
          storm.grouped(571).foreach { g =>
            ms.addData(g); q.processAllAvailable()
          }
          spark.table(s"fused_eq_$name").as[SAlert].collect().map(key).toSet
        } finally q.stop()
      }
      val staged = run("staged", ev =>
        StreamingThrottle.throttled(
          StreamingDetectors.alertsTws(ev, rules), period))
      val fused = run("fused", ev =>
        StreamingDetectors.alertsTwsThrottled(ev, rules, period))
      assert(staged.nonEmpty, "storm produced no staged alerts — dead test")
      assert(fused == staged)
      // sanity: the throttle actually suppressed something (the raw
      // detector output must be strictly larger than the survivors)
      val raw = run("raw", ev => StreamingDetectors.alertsTws(ev, rules))
      assert(raw.size > staged.size)
    }
  }

  test("fused restart: deques continue and pre-restart buckets stay suppressed") {
    withRocksDBProvider { restartBody() }
  }

  test("idle-evicted key cannot re-emit an already-emitted bucket") {
    withRocksDBProvider { idleEvictBody() }
  }

  /** The r14-documented duplicate window, now closed: the detector TTL
    * evicts an idle key's deques, the key re-awakens INSIDE a period
    * bucket it already emitted — the separate (unbounded-TTL) throttle
    * slot must still suppress it. The stat rule doubles as the eviction
    * witness: if the deques had survived, the post-idle outlier would
    * fire against the pre-idle window; with eviction its history is
    * empty and it stays silent — so the test cannot pass vacuously. */
  private def idleEvictBody(): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.TTLConfig
    val evictRules: Seq[DetectionRule] = Seq(
      RateRule("r1", "key", 3600, 0.0), // fires on every event
      StatisticalRule("s1", "value", windowSize = 5, deviationFactor = 2.0))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fus-ttl").toString
    val gotBuf = new scala.collection.mutable.ArrayBuffer[SAlert]
    // ONE MemoryStream across both runs (the checkpoint's committed
    // offsets are source positions — a fresh stream would replay as
    // already-consumed). NOT processAllAvailable/AvailableNow: a TTL
    // query runs in ProcessingTime mode and keeps scheduling batches for
    // TTL cleanup, so neither ever settles (the documented alertsTws TTL
    // caveat). Poll the progress stream until the fed rows are consumed,
    // then stop the query explicitly.
    val ms = MemoryStream[SEvent]
    def runOnce(data: Seq[SEvent]): Unit = {
      ms.addData(data)
      val q = StreamingDetectors.alertsTwsThrottled(ms.toDS(), evictRules,
          period, ttl = TTLConfig(java.time.Duration.ofMillis(900)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SAlert], _: Long) =>
          val rows = b.collect()
          gotBuf.synchronized { gotBuf ++= rows }
          ()
        }.start()
      try {
        val deadline = System.currentTimeMillis() + 120000L
        def consumed(): Long = q.recentProgress.map(_.numInputRows).sum
        while (consumed() < data.size && System.currentTimeMillis() < deadline)
          q.awaitTermination(100L)
        assert(consumed() >= data.size,
          s"query consumed ${consumed()} of ${data.size} rows before timeout")
      } finally q.stop()
    }
    def ev(id: Long, ts: Long, v: Double): SEvent =
      SEvent("k1", id, ts, Map("value" -> v), "{}")
    // run 1: three events in bucket 0 feed the deques; the rate rule's
    // survivor for bucket 0 is id 0
    runOnce(Seq(ev(0L, 0L, 10.0), ev(1L, 1L, 10.0), ev(2L, 2L, 10.0)))
    // idle past the detector TTL so the deques evict
    Thread.sleep(2500L)
    // run 2, same checkpoint: id 10 re-awakens INSIDE bucket 0 (ts 10) —
    // its rate alert must stay suppressed; id 11 opens bucket 1 (ts 700)
    runOnce(Seq(ev(10L, 10L, 99.0), ev(11L, 700L, 99.0)))
    val got = gotBuf.synchronized(gotBuf.toVector)
    assert(got.filter(_.rule_name == "r1").map(_.event_id).toSet ==
      Set(0L, 11L),
      s"bucket 0 must not re-emit after idle eviction: $got")
    // eviction witness: with the pre-idle window ([10,10,10], sigma 0)
    // surviving, value 99 at id 10 would have fired the stat rule; an
    // evicted (empty) history cannot (needs >= 2 prior values)
    assert(!got.exists(a => a.rule_name == "s1" && a.event_id == 10L),
      s"stat fired against a window the TTL should have evicted: $got")
  }

  private def restartBody(): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fus-rec").toString
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink shape (same as AlertSink's delivery path)
    val gotBuf = new scala.collection.mutable.ArrayBuffer[SAlert]
    val ms = MemoryStream[SEvent]
    def startQ() =
      StreamingDetectors.alertsTwsThrottled(ms.toDS(), rules, period)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SAlert], _: Long) =>
          val rows = b.collect()
          gotBuf.synchronized { gotBuf ++= rows }
          ()
        }.start()
    def ev(id: Long, ts: Long, v: Double): SEvent =
      SEvent("k1", id, ts, Map("value" -> v), "{}")
    // run 1, bucket 0 (ts < 600): rate deque reaches 4 (> 3) at id 3 ->
    // ONE rate survivor for bucket 0; stat window fills with 10.0s
    val q1 = startQ()
    try { ms.addData((0L until 6L).map(i => ev(i, i, 10.0))); q1.processAllAvailable() }
    finally q1.stop()
    // run 2, same checkpoint: a straggler still in bucket 0 (ts 10) must
    // stay suppressed (throttle watermark survived the restart), and a
    // stat outlier must fire computed against the PRE-RESTART window
    // (deques survived) — its own alert lands in bucket 1 (ts 700)
    val q2 = startQ()
    try { ms.addData(Seq(ev(100L, 10L, 10.0), ev(101L, 700L, 99.0))); q2.processAllAvailable() }
    finally q2.stop()
    val got = gotBuf.synchronized(gotBuf.toVector)
    val rateAlerts = got.filter(_.rule_name == "r1").map(_.event_id).toSet
    // bucket 0's rate survivor is id 3 (first to exceed the deque
    // threshold); id 100's rate alert (bucket 0 again) is suppressed;
    // id 101 (bucket 1) passes
    assert(rateAlerts == Set(3L, 101L))
    val statAlerts = got.filter(_.rule_name == "s1")
    assert(statAlerts.exists(_.event_id == 101L),
      "stat alert for the post-restart outlier missing — the value deque " +
        "did not survive the restart")
    // mean of the restored window of 10.0s is 10.00, stddev 0.00
    val s = statAlerts.find(_.event_id == 101L).get
    assert(s.details.contains("mean=10.00") && s.details.contains("stddev=0.00"))
  }
}
