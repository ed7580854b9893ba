package graft.tools

import graft.model._
import graft.streaming.{SEvent, StreamingDetectors}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig

/** Scratch probe: `alertsTws` (transformWithState on RocksDB) at high key
  * cardinality — the measurement behind the 100 TB state-scale claim.
  *
  * Phase 1 (growth): 8 batches x 250k events, every event a NEW key ->
  * 2M distinct keys of live detector state (one rate deque + one stat
  * deque + threshold evaluation per key). Records per-batch wall time,
  * store rows, and RocksDB on-disk/memory size from the progress metrics:
  * batch cost must track BATCH SIZE, not total state size, and memory
  * must stay bounded (RocksDB spills to SST files, unlike the in-heap
  * HDFS-backed store).
  *
  * Phase 2 (revisit): 4 more batches re-touching a 250k-key slice -> the
  * read path against a 2M-key store; same flat-cost expectation.
  *
  * Phase 3 (TTL): a fresh query with a 5 s processing-time TTL ingests
  * 250k keys, idles past the TTL, and reports expired-value removals —
  * the unbounded-state fix the reference lacks (no TTL anywhere in its
  * keyed state, AnomalyProcessFunction.java). A TTL query batches on
  * EVERY trigger and `processAllAvailable` never settles on it
  * (alertsTws scaladoc), so this phase polls `lastProgress`.
  *
  * Run: `sbt "runMain graft.tools.StateScaleBench [grow|hot|etime|ttl|json|restart]"`
  * (no arg = all); results recorded in SCALE_NOTES.md (rounds 7-8):
  * grow/revisit = key-cardinality growth, hot = hot-key adversary (the
  * phase that exposed the quadratic rate-deque eviction), etime =
  * event-time buffering, ttl = idle-state eviction, json = end-to-end
  * raw-JSON topology throughput, restart = stop/restore a 1M-key store
  * mid-stream with an alert-multiset continuity oracle. */
object StateScaleBench {

  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("t1", "value", 95.0),
    RateRule("r1", "key", 3600, 5.0),
    StatisticalRule("s1", "value", windowSize = 10, deviationFactor = 3.0))

  private def mkEvents(firstId: Long, n: Int, keyOf: Long => Long): Seq[SEvent] =
    (0 until n).map { i =>
      val id = firstId + i
      SEvent(s"k${keyOf(id)}", id, id / 1000,
        Map("value" -> (id % 100).toDouble), "{}")
    }

  private def report(tag: String, q: org.apache.spark.sql.streaming.StreamingQuery,
      sec: Double): Unit = {
    val p = q.lastProgress
    val so = p.stateOperators.apply(0)
    val cm = so.customMetrics
    def m(k: String): Long = Option(cm.get(k)).map(_.longValue).getOrElse(-1L)
    println(f"$tag%-12s ${sec}%6.2f s  rows=${so.numRowsTotal}%9d " +
      f"updated=${so.numRowsUpdated}%8d memMB=${so.memoryUsedBytes / 1e6}%8.1f " +
      f"sstMB=${m("rocksdbSstFileSize") / 1e6}%8.1f " +
      f"ttlExpired=${m("numValuesRemovedDueToTTLExpiry")}%d")
  }

  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_MASTER=local-cluster[4,8,8192] runs the probe with
    // separate executor JVMs (state store + changelog upload + restore on
    // the executor side, shuffled over RPC); requires SPARK_SCALA_VERSION
    // to be exported for the standalone executor launcher
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]")
    val spark = graft.sources.Sessions.builder(master, 16)
      .config("spark.executor.memory", "7g")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Changelog checkpointing is the large-state production posture: each
    // commit uploads the batch's delta; full snapshots move to the
    // background maintenance thread. Without it every task commit zips and
    // uploads its ENTIRE store — measured here at minutes/batch once the
    // store holds ~2M keys, wholly checkpoint overhead, not compute.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val perBatch = 250000
    val phase = if (args.nonEmpty) args(0) else "all"

    if (phase == "all" || phase == "grow") {
      val ms = MemoryStream[SEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ssb").toString
      val q = StreamingDetectors.alertsTws(ms.toDS(), rules)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      try {
        // phase 1: 8 batches, all-new keys -> 2M keys of live state
        (0 until 8).foreach { b =>
          ms.addData(mkEvents(b.toLong * perBatch, perBatch, id => id))
          val t0 = System.nanoTime()
          q.processAllAvailable()
          report(s"grow b$b", q, (System.nanoTime() - t0) / 1e9)
        }
        // phase 2: 4 batches revisiting the first 250k keys
        (0 until 4).foreach { b =>
          ms.addData(mkEvents((8L + b) * perBatch, perBatch, id => id % perBatch))
          val t0 = System.nanoTime()
          q.processAllAvailable()
          report(s"revisit b$b", q, (System.nanoTime() - t0) / 1e9)
        }
      } finally q.stop()
    }

    if (phase == "all" || phase == "restart") {
      // phase 5: checkpoint-restore at state scale. Grow 1M keys under
      // query A (4 batches), STOP, start query B on the same checkpoint
      // (executor-side RocksDB restore from changelog + SST), then 2
      // batches revisiting the first 500k keys — their rate/stat
      // evaluations only come out right if the restored deques hold the
      // pre-restart history. Continuity oracle: an uninterrupted control
      // run of the same 6 batches on a fresh checkpoint must produce the
      // IDENTICAL alert multiset (count + order-independent hash).
      def runSeq(label: String, stopAfter: Option[Int]): (Long, Long) = {
        val ms = MemoryStream[SEvent]
        val ckpt = java.nio.file.Files.createTempDirectory("graft-ssb-rst").toString
        val nAlerts = new java.util.concurrent.atomic.AtomicLong
        val hAlerts = new java.util.concurrent.atomic.AtomicLong
        def startQ() = StreamingDetectors.alertsTws(ms.toDS(), rules)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.SAlert], _: Long) =>
            import org.apache.spark.sql.functions._
            val r = b.toDF().agg(count(lit(1)),
              sum(hash(col("rule_name"), col("key"), col("event_id")).cast("long"))).collect()(0)
            nAlerts.addAndGet(r.getLong(0))
            hAlerts.addAndGet(if (r.isNullAt(1)) 0L else r.getLong(1))
            ()
          }.start()
        var q = startQ()
        try {
          (0 until 6).foreach { b =>
            // b0-b3: all-new keys -> 1M; b4-b5: revisit the first 500k
            ms.addData(mkEvents(b.toLong * perBatch, perBatch,
              id => if (b < 4) id else id % (2L * perBatch)))
            val t0 = System.nanoTime()
            q.processAllAvailable()
            report(s"$label b$b", q, (System.nanoTime() - t0) / 1e9)
            if (stopAfter.contains(b)) {
              q.stop()
              val t1 = System.nanoTime()
              q = startQ()
              println(f"$label%-12s restart submitted after b$b " +
                f"(${(System.nanoTime() - t1) / 1e9}%5.2f s to start)")
            }
          }
        } finally q.stop()
        (nAlerts.get(), hAlerts.get())
      }
      val control = runSeq("rst-ctrl", None)
      val restarted = runSeq("rst-kill", Some(3))
      println(s"restart-parity control=$control restarted=$restarted " +
        (if (control == restarted) "MATCH" else "*** MISMATCH ***"))
    }

    if (phase == "all" || phase == "etrestart") {
      // phase 5b (round 10): checkpoint-restore for the EVENT-TIME mode
      // under out-of-order replay — the restart probe above, but with
      // per-key ListState BUFFERS and armed event-time timers live at the
      // stop point. b0-b3 grow 1M keys (300 s disorder bands, 60 s
      // watermark), b4-b5 revisit the first 500k; the kill lands after b3
      // with band 3 still buffered below the watermark. Continuity
      // oracle: identical alert multiset to an uninterrupted control.
      val etPerBatch = perBatch
      def runSeqEt(label: String, stopAfter: Option[Int]): (Long, Long) = {
        val ms = MemoryStream[SEvent]
        val ckpt = java.nio.file.Files.createTempDirectory("graft-ssb-etr").toString
        val nAlerts = new java.util.concurrent.atomic.AtomicLong
        val hAlerts = new java.util.concurrent.atomic.AtomicLong
        def startQ() = StreamingDetectors.alertsEventTime(ms.toDS(), rules,
            java.time.Duration.ofSeconds(60))
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.SAlert], _: Long) =>
            import org.apache.spark.sql.functions._
            val r = b.toDF().agg(count(lit(1)),
              sum(hash(col("rule_name"), col("key"), col("event_id")).cast("long"))).collect()(0)
            nAlerts.addAndGet(r.getLong(0))
            hAlerts.addAndGet(if (r.isNullAt(1)) 0L else r.getLong(1))
            ()
          }.start()
        var q = startQ()
        try {
          (0 until 6).foreach { b =>
            val base = b.toLong * 300L
            val evs = (0 until etPerBatch).map { i =>
              val id = b.toLong * etPerBatch + i
              val ts = base + (id * 2654435761L) % 300L // in-band shuffle
              val key = if (b < 4) id else id % (2L * etPerBatch)
              SEvent(s"k$key", id, ts,
                Map("value" -> (id % 100).toDouble), "{}")
            }
            ms.addData(evs)
            val t0 = System.nanoTime()
            q.processAllAvailable()
            report(s"$label b$b", q, (System.nanoTime() - t0) / 1e9)
            if (stopAfter.contains(b)) {
              q.stop()
              val t1 = System.nanoTime()
              q = startQ()
              println(f"$label%-12s restart submitted after b$b " +
                f"(${(System.nanoTime() - t1) / 1e9}%5.2f s to start)")
            }
          }
          // sentinel far-future event drains every buffered band
          ms.addData(Seq(SEvent("zz_flush", 6L * etPerBatch, 1000000L,
            Map("value" -> 1.0), "{}")))
          val tf = System.nanoTime()
          q.processAllAvailable()
          report(s"$label flush", q, (System.nanoTime() - tf) / 1e9)
        } finally q.stop()
        (nAlerts.get(), hAlerts.get())
      }
      val controlEt = runSeqEt("etr-ctrl", None)
      val restartedEt = runSeqEt("etr-kill", Some(3))
      println(s"etrestart-parity control=$controlEt restarted=$restartedEt " +
        (if (controlEt == restartedEt) "MATCH" else "*** MISMATCH ***"))
    }

    if (phase == "all" || phase == "json") {
      // phase 0: the reference's own end-to-end use case — raw JSON in,
      // JSON alerts out (parse -> null filter -> keyBy -> stateful
      // detect -> serialize), 1M events over 100k keys. The headline
      // events/s/node number comparable to the reference topology.
      val msJ = MemoryStream[String]
      val ckptJ = java.nio.file.Files.createTempDirectory("graft-ssb-json").toString
      val qJ = StreamingDetectors.jsonPipeline(
          msJ.toDS().toDF("value"), rules, keyField = "user_id")
        .writeStream.format("noop")
        .option("checkpointLocation", ckptJ).start()
      try {
        (0 until 4).foreach { b =>
          val raw = (0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            s"""{"user_id":"u${id % 100000}","event_id":$id,"ts":${id / 1000},"value":${id % 100}}"""
          }
          msJ.addData(raw)
          val t0 = System.nanoTime()
          qJ.processAllAvailable()
          report(s"json b$b", qJ, (System.nanoTime() - t0) / 1e9)
        }
      } finally qJ.stop()
    }

    if (phase == "all" || phase == "hot") {
      // phase 1b: hot-key adversary for the streaming path — 50% of
      // every batch lands on ONE key, the rest spread over 125k keys.
      // The hot key's ~125k events serialize through one task's
      // processEvent loop; per-key state stays bounded (deque windows),
      // so the cost is the loop, not memory.
      val msH = MemoryStream[SEvent]
      val ckptH = java.nio.file.Files.createTempDirectory("graft-ssb-hot").toString
      val qH = StreamingDetectors.alertsTws(msH.toDS(), rules)
        .writeStream.format("noop")
        .option("checkpointLocation", ckptH).start()
      try {
        (0 until 4).foreach { b =>
          msH.addData(mkEvents(b.toLong * perBatch, perBatch,
            id => if (id % 2 == 0) 42L else id))
          val t0 = System.nanoTime()
          qH.processAllAvailable()
          report(s"hot b$b", qH, (System.nanoTime() - t0) / 1e9)
        }
      } finally qH.stop()
    }

    if (phase == "all" || phase == "etime") {
      // phase 4: the event-time mode — 1M out-of-order events over 250k
      // keys, 300 s disorder bands, 60 s watermark delay. Every batch
      // buffers into per-key ListState and registers a timer; the next
      // batch's watermark advance drains the prior band through
      // processEvent in (tsSec, eventId) order. Measures the
      // buffer-then-drain cost the arrival-order paths don't pay.
      val ms3 = MemoryStream[SEvent]
      val ckpt3 = java.nio.file.Files.createTempDirectory("graft-ssb-et").toString
      val q3 = StreamingDetectors.alertsEventTime(ms3.toDS(), rules,
          java.time.Duration.ofSeconds(60))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt3).start()
      try {
        (0 until 4).foreach { b =>
          val base = b.toLong * 300L
          val evs = (0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            // deterministic shuffle of event times inside the band
            val ts = base + (id * 2654435761L) % 300L
            SEvent(s"k${id % 250000L}", id, ts,
              Map("value" -> (id % 100).toDouble), "{}")
          }
          ms3.addData(evs)
          val t0 = System.nanoTime()
          q3.processAllAvailable()
          report(s"etime b$b", q3, (System.nanoTime() - t0) / 1e9)
        }
        // sentinel far-future event pushes the watermark past every band
        ms3.addData(Seq(SEvent("flush", 4L * perBatch, 1000000L,
          Map("value" -> 1.0), "{}")))
        val tf = System.nanoTime()
        q3.processAllAvailable()
        report("etime flush", q3, (System.nanoTime() - tf) / 1e9)
      } finally q3.stop()
    }

    if (phase == "all" || phase == "rfm") {
      // phase 6 (round 10): the streaming feature store at 1M-user state.
      // Grow 4 batches of 250k NEW users, revisit the first 250k with
      // later-day events, kill + restore from the checkpoint mid-profile,
      // revisit again — continuity oracle: sampled users' features must
      // equal an exact driver-side fold of everything fed (value state
      // AND the per-user day map must both restore coherently).
      import graft.streaming.{RfmEvent, RfmFeatures, StreamingRfm}
      val sampleMod = 100000L
      // per sampled user: (n, cents, distinct day set) — the exact fold
      val expected = scala.collection.mutable.Map[Long, (Long, Long, Set[Long])]()
      def mkRfm(firstId: Long, n: Int, userOf: Long => Long, day: Long): Seq[RfmEvent] =
        (0 until n).map { i =>
          val id = firstId + i
          val u = userOf(id)
          val e = RfmEvent(u, day * 86400L + (id % 86400L), Some((id % 1000L) / 100.0))
          if (u % sampleMod == 0) {
            val cents = math.floor(e.value.get * 100.0 + 0.5).toLong
            val (pn, pc, pd) = expected.getOrElse(u, (0L, 0L, Set.empty[Long]))
            expected(u) = (pn + 1, pc + cents, pd + e.ts_sec / 86400L)
          }
          e
        }
      val got = new java.util.concurrent.ConcurrentHashMap[Long, RfmFeatures]()
      val ms3 = MemoryStream[RfmEvent]
      val ckpt3 = java.nio.file.Files.createTempDirectory("graft-ssb-rfm").toString
      def startRfm() = StreamingRfm.features(ms3.toDS())
        .writeStream.option("checkpointLocation", ckpt3)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RfmFeatures], _: Long) =>
          b.filter(f => f.user_id % sampleMod == 0).collect().foreach { f =>
            got.merge(f.user_id, f, (a, x) => if (x.n_events > a.n_events) x else a)
          }
          ()
        }.start()
      var q3 = startRfm()
      try {
        (0 until 4).foreach { b =>
          ms3.addData(mkRfm(b.toLong * perBatch, perBatch, id => id, day = 0L))
          val t0 = System.nanoTime()
          q3.processAllAvailable()
          report(s"rfm grow b$b", q3, (System.nanoTime() - t0) / 1e9)
        }
        ms3.addData(mkRfm(4L * perBatch, perBatch, id => id % perBatch, day = 1L))
        var t0 = System.nanoTime()
        q3.processAllAvailable()
        report("rfm revisit", q3, (System.nanoTime() - t0) / 1e9)
        q3.stop()
        t0 = System.nanoTime()
        q3 = startRfm()
        ms3.addData(mkRfm(5L * perBatch, perBatch, id => id % perBatch, day = 2L))
        q3.processAllAvailable()
        report("rfm restore+revisit", q3, (System.nanoTime() - t0) / 1e9)
      } finally q3.stop()
      import scala.jdk.CollectionConverters._
      var ok = true
      expected.foreach { case (u, (n, cents, days)) =>
        val f = got.get(u)
        if (f == null || f.n_events != n ||
            !f.total_value.contains(cents.toDouble / 100.0) ||
            f.active_days != days.size) {
          ok = false
          println(s"[ssb] rfm DIVERGED user $u: got $f want n=$n cents=$cents days=${days.size}")
        }
      }
      println(s"[ssb] rfm continuity ${if (ok) "OK" else "FAILED"} " +
        s"(${expected.size} sampled users)")
    }

    if (phase == "all" || phase == "thrttl") {
      // phase 7 (round 16): the FUSED operator's throttle-watermark slot
      // at 1M keys (r15 verdict #7). Every event alerts (value 99 > t1's
      // 95), so every key writes a detthr_thr watermark. Detector slot
      // TTL = 5 s both runs; run A leaves thrTtl unbounded (the default),
      // run B sets thrTtl = 15 s. After idling past the TTLs, run A's
      // store converges to the THROTTLE-ONLY footprint — the per-(rule,
      // key) long the scaladoc prices — while run B's collapses toward
      // zero. The delta between the two converged row counts/mem IS the
      // throttle slot's cost at 1M keys; the sizing rule it backs lives
      // on alertsTwsThrottled's scaladoc.
      def runThr(tag: String, thrTtl: TTLConfig): Unit = {
        val ms = MemoryStream[SEvent]
        val ckpt = java.nio.file.Files.createTempDirectory("graft-ssb-thr").toString
        val q = StreamingDetectors.alertsTwsThrottled(ms.toDS(), rules,
            periodSec = 3600L,
            ttl = TTLConfig(java.time.Duration.ofSeconds(5)),
            thrTtl = thrTtl)
          .writeStream.format("noop")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("2 seconds"))
          .option("checkpointLocation", ckpt).start()
        def rowsNow: Long = Option(q.lastProgress)
          .filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
        def waitFor(t: String, deadlineSec: Int)(done: => Boolean): Unit = {
          val t0 = System.nanoTime()
          while (!done && (System.nanoTime() - t0) / 1e9 < deadlineSec)
            Thread.sleep(500)
          report(t, q, (System.nanoTime() - t0) / 1e9)
        }
        try {
          (0 until 4).foreach { b =>
            ms.addData((0 until perBatch).map { i =>
              val id = b.toLong * perBatch + i
              SEvent(s"k$id", id, id / 1000,
                Map("value" -> 99.0), "{}")
            })
          }
          // both slots populated: >= 1M keys' worth of state rows
          waitFor(s"$tag fill", 600)(rowsNow >= 4L * perBatch)
          val peak = rowsNow
          // idle past the detector TTL (and run B's throttle TTL): run A
          // converges to the throttle-only floor (well below peak, well
          // above zero), run B toward zero — the printed report lines
          // carry the converged rows/mem the sizing rule reads
          waitFor(s"$tag evict", 600)(
            rowsNow >= 0 && (if (thrTtl == TTLConfig.NONE)
              rowsNow < peak - 3L * perBatch else rowsNow < perBatch / 10))
        } finally q.stop()
      }
      runThr("thr-unbounded", TTLConfig.NONE)
      runThr("thr-ttl15s", TTLConfig(java.time.Duration.ofSeconds(15)))
    }

    if (phase == "all" || phase == "ttl") {
      // phase 3: TTL eviction. No processAllAvailable here — a TTL query
      // batches on every trigger and never satisfies its no-new-data
      // condition (alertsTws scaladoc); poll lastProgress instead.
      val ms2 = MemoryStream[SEvent]
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ssb-ttl").toString
      val q2 = StreamingDetectors.alertsTws(ms2.toDS(), rules,
          TTLConfig(java.time.Duration.ofSeconds(5)))
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("2 seconds"))
        .option("checkpointLocation", ckpt2).start()
      def rowsNow: Long = Option(q2.lastProgress)
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
      def waitFor(tag: String, deadlineSec: Int)(done: => Boolean): Unit = {
        val t0 = System.nanoTime()
        while (!done && (System.nanoTime() - t0) / 1e9 < deadlineSec)
          Thread.sleep(500)
        report(tag, q2, (System.nanoTime() - t0) / 1e9)
      }
      try {
        ms2.addData(mkEvents(0L, perBatch, id => id))
        waitFor("ttl fill", 300)(rowsNow >= perBatch)
        // idle past the TTL; the per-trigger cleanup scan evicts expired
        // values and numRowsTotal collapses
        waitFor("ttl evict", 300)(rowsNow >= 0 && rowsNow < perBatch / 10)
      } finally q2.stop()
    }
    spark.stop()
  }
}
