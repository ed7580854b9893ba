package graft

import graft.model._
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming parity: replay the reference's `examples/sample-events.json`
  * cohort structure (FIXTURES.md §A.1) through `flatMapGroupsWithState`
  * and assert the exact alert set the reference engine would emit under
  * its default config/rules.yml (high_rate: rate/userId/10s/5;
  * high_amount: threshold/amount/10000; unusual_amount:
  * statistical/amount/20/2.5). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val rules: Seq[DetectionRule] = Seq(
    RateRule("high_rate", "userId", 10, 5.0),
    ThresholdRule("high_amount", "amount", 10000.0),
    StatisticalRule("unusual_amount", "amount", 20, 2.5))

  private def replay(events: Seq[SEvent], batches: Int = 1): Seq[SAlert] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = StreamingDetectors.alerts(ms.toDS(), rules)
      .writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val groups = events.grouped(math.max(1, events.size / batches)).toSeq
      groups.foreach { g => ms.addData(g); q.processAllAvailable() }
      spark.table("alerts_out").as[SAlert].collect().toSeq
    } finally q.stop()
  }

  private def cohortEvents: Seq[SEvent] = {
    var id = 0L
    // the cohort rules measure the "amount" field, as the reference's
    // sample does — the event map carries it under that name
    def next(key: String, ts: Long, v: Double): SEvent = {
      id += 1; SEvent(key, id, ts, Map("amount" -> v))
    }
    val t0 = 1000000L
    // user_001 + user_004: 6 events 1/s inside 10 s -> high_rate on the 6th
    val u1 = (0 until 6).map(i => next("user_001", t0 + i, 50.0))
    val u4 = (0 until 6).map(i => next("user_004", t0 + 30 + i, 60.0))
    // user_002: amounts 15000, 25000 -> high_amount twice
    val u2 = Seq(next("user_002", t0 + 100, 15000.0),
      next("user_002", t0 + 160, 25000.0))
    // user_003: the reference sample baseline then 5000 ->
    // unusual_amount on the 5000 (and on nothing before it)
    val u3 = Seq(102.5, 98.75, 101.2, 99.8, 103.1, 5000.0).zipWithIndex
      .map { case (v, i) => next("user_003", t0 + 200 + i * 30, v) }
    // user_005: sparse control -> nothing
    val u5 = Seq(next("user_005", t0 + 400, 42.0))
    u1 ++ u4 ++ u2 ++ u3 ++ u5
  }

  test("sample-events cohort replay emits the reference alert set") {
    val alerts = replay(cohortEvents)
    val byRule = alerts.groupBy(_.rule_name).view.mapValues(_.map(_.key).sorted).toMap
    assert(byRule("high_rate") == Seq("user_001", "user_004"))
    assert(byRule("high_amount") == Seq("user_002", "user_002"))
    assert(byRule("unusual_amount") == Seq("user_003"))
    // the statistical alert is the 5000 event, checked against its own
    // trailing baseline
    val statAlert = alerts.find(_.rule_name == "unusual_amount").get
    assert(statAlert.value == 5000.0)
    assert(statAlert.details.startsWith("Statistical outlier: amount=5000.00 (mean=101.07"))
  }

  test("state persists across micro-batches (same alerts in 4 batches)") {
    val oneBatch = replay(cohortEvents, batches = 1)
      .map(a => (a.rule_name, a.key, a.event_id)).sorted
    val fourBatches = replay(cohortEvents, batches = 4)
      .map(a => (a.rule_name, a.key, a.event_id)).sorted
    assert(oneBatch == fourBatches)
  }

  test("streaming matches batch on threshold + statistical over the fixture") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.sources.Tables.events(spark, dir)
    val rules2: Seq[DetectionRule] = Seq(
      SparkEntry.FixtureRules.threshold, SparkEntry.FixtureRules.statistical)
    // batch
    val batch = graft.operators.Detectors
      .allAlerts(df, rules2)
      .select("rule_name", "key", "event_id").as[(String, String, Long)]
      .collect().toSeq.sorted
    // streaming path on the same rows (single batch; eventId = arrival)
    val sev = StreamingDetectors.toSEvents(df).collect().toSeq
      .sortBy(_.eventId)
    val streamed = replay2(sev, rules2)
      .map(a => (a.rule_name, a.key, a.event_id)).sorted
    assert(streamed == batch)
  }

  private def replay2(events: Seq[SEvent], rs: Seq[DetectionRule]): Seq[SAlert] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = StreamingDetectors.alerts(ms.toDS(), rs)
      .writeStream.format("memory").queryName("alerts_out2")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      ms.addData(events); q.processAllAvailable()
      spark.table("alerts_out2").as[SAlert].collect().toSeq
    } finally q.stop()
  }

  test("toSEventsFor carries the fields the rules measure (non-value field)") {
    val df = Seq(
      (1L, 0L, 7L, 5.0, 15000.0), (2L, 1L, 7L, 5.0, 20.0))
      .toDF("event_id", "ts_sec", "user_id", "value", "amount")
    val amountRule: Seq[DetectionRule] =
      Seq(ThresholdRule("high_amount", "amount", 10000.0))
    val sev = StreamingDetectors.toSEventsFor(df, amountRule).collect().toSeq
    assert(sev.forall(_.fields.contains("amount")))
    val alerts = replay2(sev, amountRule)
    // the rule fires on the amount measure — the fieldNames default
    // (Seq("value")) would have silently dropped it
    assert(alerts.map(a => (a.rule_name, a.event_id, a.value)) ==
      Seq(("high_amount", 1L, 15000.0)))
  }

  test("watermarked tumbling-window aggregation over the event stream") {
    // SURVEY §2 op 3: the reference declares a 5 s watermark; here it is
    // actually consumed by an aligned windowed count (the Spark-native
    // aggregation surface the reference lacks)
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wm-ckpt").toString
    val agg = ms.toDS()
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val t0 = 1700000040L // 60-aligned: all 5 events land in one window
      ms.addData((0 until 5).map(i => SEvent("u1", i, t0 + i * 10, Some(1.0))))
      q.processAllAvailable()
      // advance the watermark far past the first windows, closing them
      ms.addData(Seq(SEvent("u1", 99, t0 + 600, Some(1.0))))
      q.processAllAvailable()
      ms.addData(Seq(SEvent("u1", 100, t0 + 700, Some(1.0))))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .selectExpr("key", "n").as[(String, Long)].collect().toSeq
      // first minute: 5 events in window [t0, t0+60); append mode emits it
      // once the watermark passes
      assert(rows.contains(("u1", 5L)))
    } finally q.stop()
  }

  test("query listener surfaces latency percentiles + counters (SentinelMetrics parity)") {
    val listener = new graft.observe.SentinelQueryListener()
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[SEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-lst-ckpt").toString
      val observed = graft.observe.Metrics.observeAlerts(
        StreamingDetectors.alerts(ms.toDS(), rules).toDF())
      val q = observed.writeStream.format("memory").queryName("alerts_lst")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        cohortEvents.grouped(8).foreach { g => ms.addData(g); q.processAllAvailable() }
        // listener delivery is async on the listener bus — poll to settle
        val deadline = System.currentTimeMillis + 20000
        var st = listener.snapshot
        while ((st.rows < cohortEvents.size || st.anomalies < 5) &&
            System.currentTimeMillis < deadline) {
          Thread.sleep(100); st = listener.snapshot
        }
        assert(st.batches >= 3) // cohort fed in ceil(21/8) = 3 data batches
        assert(st.rows == cohortEvents.size)
        // 2 high_rate + 2 high_amount + 1 unusual_amount (cohort contract)
        assert(st.anomalies == 5)
        assert(st.p50Ms >= 0 && st.p50Ms <= st.p95Ms && st.p95Ms <= st.p99Ms)
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }

  test("transformWithState path emits the same alert set (Spark 4 API)") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[SEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt").toString
      val q = StreamingDetectors.alertsTws(ms.toDS(), rules)
        .writeStream.format("memory").queryName("alerts_tws")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      val tws =
        try {
          // multiple batches: state must round-trip through RocksDB
          cohortEvents.grouped(7).foreach { g => ms.addData(g); q.processAllAvailable() }
          spark.table("alerts_tws").as[SAlert].collect().toSeq
        } finally q.stop()
      val fmgws = replay(cohortEvents)
      assert(tws.map(a => (a.rule_name, a.key, a.event_id, a.details)).sorted ==
        fmgws.map(a => (a.rule_name, a.key, a.event_id, a.details)).sorted)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("alertsTws stop/restart: restored RocksDB state continues the deques") {
    // Rate rule with threshold 2: a key's THIRD event alerts only if the
    // deque holding its first two timestamps survived the restart. Two
    // events per key pre-restart, one post-restart: every post-restart
    // event must alert — a query that lost state would see count 1 and
    // stay silent, so the assertion bites exactly on restore.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rr = Seq(RateRule("r", "key", 1000000, 2.0))
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[SEvent]
      // the memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable sink shape (same as AlertSink's delivery path)
      val got = new scala.collection.mutable.ArrayBuffer[SAlert]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-restart").toString
      val keys = (1 to 50).map(i => s"k$i")
      def startQ() =
        StreamingDetectors.alertsTws(ms.toDS(), rr)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[SAlert], _: Long) =>
            val rows = b.collect()
            got.synchronized { got ++= rows }
            ()
          }.start()
      val q1 = startQ()
      try {
        ms.addData(keys.zipWithIndex.map { case (k, i) => SEvent(k, i, 10, Some(1.0)) })
        ms.addData(keys.zipWithIndex.map { case (k, i) => SEvent(k, 100 + i, 11, Some(1.0)) })
        q1.processAllAvailable()
        assert(got.synchronized(got.isEmpty), "no key has 3 events yet")
      } finally q1.stop()
      val q2 = startQ()
      try {
        ms.addData(keys.zipWithIndex.map { case (k, i) => SEvent(k, 200 + i, 12, Some(1.0)) })
        q2.processAllAvailable()
        val alerts = got.synchronized(got.toVector)
        assert(alerts.map(_.key).sorted == keys.sorted,
          "every key's third event must fire against the restored deque")
        assert(alerts.forall(a => a.value == 3.0 && a.event_id >= 200),
          "counts must continue from the pre-restart history")
      } finally q2.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState TTL evicts idle-key detector state") {
    // Rate rule with a huge window and threshold 2: the 3rd event for a
    // key alerts IF its deque survived. Two events, an idle gap past the
    // TTL, two more: with eviction the counts restart at 1 -> NO alert;
    // state surviving the gap would fire on both later events. The no-TTL
    // control in the same layout must fire, proving the assertion bites.
    import org.apache.spark.sql.streaming.TTLConfig
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rr = Seq(RateRule("r", "key", 1000000, 2.0))
      // A TTL query batches on every trigger and processAllAvailable
      // never settles on it (alertsTws scaladoc). recentProgress is a
      // BOUNDED buffer (~100 entries) that the per-trigger empty batches
      // can flush real entries out of under CI stalls — accumulate input
      // rows through a StreamingQueryListener instead, which sees every
      // progress event exactly once.
      def run(ttl: TTLConfig, gapMs: Long): Long = {
        implicit val sqlCtx = spark.sqlContext
        val ms = MemoryStream[SEvent]
        val ckpt = java.nio.file.Files.createTempDirectory("graft-ttl").toString
        val name = s"ttl_out_${System.nanoTime()}"
        val totals =
          new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
        import org.apache.spark.sql.streaming.StreamingQueryListener
        val lst = new StreamingQueryListener {
          override def onQueryStarted(
              e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: StreamingQueryListener.QueryProgressEvent): Unit =
            totals.merge(e.progress.runId,
              java.lang.Long.valueOf(e.progress.numInputRows),
              (a, b) => java.lang.Long.valueOf(a + b))
          override def onQueryTerminated(
              e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(lst)
        val q = StreamingDetectors.alertsTws(ms.toDS(), rr, ttl)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
          .start()
        def ingested: Long =
          Option(totals.get(q.runId)).map(_.longValue).getOrElse(0L)
        def await(n: Long): Unit = {
          val t0 = System.nanoTime()
          while (ingested < n && (System.nanoTime() - t0) / 1e9 < 60)
            Thread.sleep(100)
          assert(ingested >= n, s"timed out waiting for $n input rows")
        }
        try {
          ms.addData(Seq(SEvent("k", 1, 10, Some(1.0)), SEvent("k", 2, 11, Some(1.0))))
          await(2)
          Thread.sleep(gapMs)
          ms.addData(Seq(SEvent("k", 3, 12, Some(1.0)), SEvent("k", 4, 13, Some(1.0))))
          await(4)
          spark.table(name).count()
        } finally {
          q.stop()
          spark.streams.removeListener(lst)
        }
      }
      assert(run(TTLConfig.NONE, gapMs = 0L) == 2L,
        "control: without TTL the 3rd and 4th events must alert")
      assert(run(TTLConfig(java.time.Duration.ofSeconds(1)), gapMs = 2500L) == 0L,
        "idle state outliving its TTL must be evicted, resetting the deque")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("full EP1 topology: raw JSON in, JSON alerts out, malformed dropped") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ep1-ckpt").toString
    val out = StreamingDetectors.jsonPipeline(
      ms.toDS().toDF("value"), rules, keyField = "userId")
    val q = out.writeStream.format("memory").queryName("ep1_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      def ev(id: Long, user: String, ts: Long, amount: Double): String =
        s"""{"event_id": $id, "userId": "$user", "ts": $ts, "amount": $amount}"""
      val t0 = 1000000L
      val lines =
        // user_002: two amounts over the 10000 threshold
        Seq(ev(1, "user_002", t0 + 100, 15000.0), ev(2, "user_002", t0 + 160, 25000.0)) ++
        // user_001: 6 events inside the 10 s rate window -> fires on the 6th
        (0 until 6).map(i => ev(10 + i, "user_001", t0 + i, 50.0)) ++
        // malformed + keyless records: dropped / keyed __unknown__
        Seq("{not json", """{"event_id": 99, "ts": 1000500, "amount": 1.0}""")
      ms.addData(lines)
      q.processAllAvailable()
      val alerts = spark.table("ep1_out").select(col("value")).as[String].collect()
      // 2 threshold + 1 rate; the malformed line vanishes silently
      assert(alerts.length == 3)
      assert(alerts.count(_.contains("\"rule_name\":\"high_amount\"")) == 2)
      assert(alerts.count(_.contains("\"rule_name\":\"high_rate\"")) == 1)
      // the original event rides inline, byte-for-byte the raw JSON
      val thr = alerts.filter(_.contains("high_amount"))
      assert(thr.exists(_.contains("\\\"amount\\\": 15000.0")))
    } finally q.stop()
  }

  test("jsonPipeline ingestionClock: reference clock, event ts ignored") {
    // ADVICE r8 item 1 closure, opt-in half: with `ingestionClock = true`
    // the pipeline stamps EVERY event with ingest_ts (the reference's
    // clock, EventDeserializationSchema.java:36) — monotone per key by
    // construction, so the rate deque's head-only eviction is exact and
    // the event-time over-count space (DequeDifferentialSpec's
    // out-of-order differential) is unreachable. Witness: 6 events whose
    // OWN ts values are years apart (event-time clock: no rate window
    // ever holds >1, stays silent) all land on the one ingestion second,
    // so the ingestion clock fires the rate rule where the default
    // clock cannot.
    import org.apache.spark.sql.functions.col
    def ev(id: Long, ts: Long): String =
      s"""{"event_id": $id, "userId": "u1", "ts": $ts, "amount": 1.0}"""
    val years = (0 until 6).map(i => ev(i, 1000000L + i * 86400L * 365L))
    val raw = years.toDF("value")
    val silent = StreamingDetectors.jsonPipeline(raw, rules, keyField = "userId")
      .select(col("value")).as[String].collect()
    assert(silent.isEmpty, "event-time clock must not fire across years")
    val t0 = System.currentTimeMillis() / 1000L
    val fired = StreamingDetectors.jsonPipeline(raw, rules,
        keyField = "userId", ingestionClock = true)
      .select(col("value")).as[String].collect()
    assert(fired.count(_.contains("\"rule_name\":\"high_rate\"")) == 1,
      "ingestion clock lands all six on one second -> rate fires once")
    // the alert clock IS ingestion time, not the event's ancient ts
    val tsSecs = fired.map(a =>
      "\"ts_sec\":(\\d+)".r.findFirstMatchIn(a).get.group(1).toLong)
    assert(tsSecs.forall(_ >= t0 - 60),
      "alert ts_sec must be the ingestion stamp, not the event ts")
  }

  test("checkpoint recovery: restart resumes state, file sink stays exactly-once") {
    import org.apache.spark.sql.functions.col
    val srcDir = java.nio.file.Files.createTempDirectory("graft-rec-src")
    val outDir = java.nio.file.Files.createTempDirectory("graft-rec-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rec-ckpt").toString
    def ev(id: Long, user: String, ts: Long, amount: Double): String =
      s"""{"event_id": $id, "userId": "$user", "ts": $ts, "amount": $amount}"""
    val t0 = 2000000L
    // the rate burst (6 events in 10 s, threshold 5) STRADDLES the
    // restart: the alert on event 16 only fires if the first run's
    // deque state is recovered from the checkpoint
    val half1 = (0 until 3).map(i => ev(11 + i, "u1", t0 + i, 50.0)) :+
      ev(1, "u2", t0 + 100, 15000.0)
    val half2 = (3 until 6).map(i => ev(11 + i, "u1", t0 + i, 50.0)) :+
      ev(2, "u2", t0 + 160, 25000.0)
    def runOnce(): Unit = {
      val raw = spark.readStream.text(srcDir.toString).toDF("value")
      val q = StreamingDetectors.jsonPipeline(raw, rules, keyField = "userId")
        .writeStream.format("text").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    java.nio.file.Files.writeString(srcDir.resolve("a.json"),
      half1.mkString("\n"))
    runOnce()
    java.nio.file.Files.writeString(srcDir.resolve("b.json"),
      half2.mkString("\n"))
    runOnce()
    val got = spark.read.text(outDir).select(col("value")).as[String]
      .collect().toSeq.sorted
    // batch truth over the concatenated input (EP1 plan is batch-runnable)
    val expect = StreamingDetectors.jsonPipeline(
        (half1 ++ half2).toDF("value"), rules, keyField = "userId")
      .select(col("value")).as[String].collect().toSeq.sorted
    assert(expect.nonEmpty)
    assert(expect.exists(_.contains("high_rate"))) // the straddling alert
    assert(got == expect)
  }

  test("streaming exact dedup: first-seen survives, state watermark-bounded") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString
    val docs = ms.toDS().toDF("doc_id", "ts_sec", "text")
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
    val q = graft.operators.Dedup.streamingExact(docs)
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val t0 = 1700000000L
      // batch 1: A, B, dup-of-A (same content, later id)
      ms.addData(Seq((1L, t0, "alpha text"), (2L, t0 + 1, "beta text"),
        (3L, t0 + 2, "alpha text")))
      q.processAllAvailable()
      // batch 2: another dup of A within the watermark window -> dropped
      ms.addData(Seq((4L, t0 + 5, "alpha text"), (5L, t0 + 6, "gamma text")))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[(Long, String)].collect().toSeq
      assert(out.map(_._2).sorted == Seq("alpha text", "beta text", "gamma text"))
      // the FIRST-arrived alpha survived, not a later duplicate
      assert(out.find(_._2 == "alpha text").get._1 == 1L)
    } finally q.stop()
  }

  test("idle-key TTL evicts state (improvement over the reference)") {
    // pure state-transition check: TTL wiring is exercised via the
    // processing-time timeout path; here we pin the transition function
    val st0 = DetState(Map.empty, Map.empty)
    val r = Seq[DetectionRule](RateRule("r", "k", 10, 1.0))
    val (a1, st1) = StreamingDetectors.processEvent(r, SEvent("k", 1, 100, None), st0)
    assert(a1.isEmpty && st1.rate("r") == Seq(100L))
    val (a2, st2) = StreamingDetectors.processEvent(r, SEvent("k", 2, 105, None), st1)
    assert(a2.size == 1 && st2.rate("r") == Seq(100L, 105L))
  }
}
