package graft.tools

import graft.model._
import graft.streaming.{SEvent, StreamingDetectors, StreamingThrottle}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Sustained streaming THROUGHPUT — the measurement behind the
  * reference's one unanswered BASELINE row ("scales to millions of
  * events per second", PRODUCT_OVERVIEW.md:166). StateScaleBench proves
  * state SCALE (2M keys, kill/restore); this measures steady-state
  * events/sec with the full production configuration live:
  *
  *  - phase `core`: [[SEvent]] stream → `alertsTws` (all three rule
  *    kinds, per-rule containment structurally engaged — every arm
  *    evaluates under `guarded`) → throttle (second transformWithState
  *    stage, its own store + exchange) → noop sink. RocksDB provider +
  *    changelog checkpointing, the large-state posture.
  *  - phase `topology`: the reference's whole Kafka-to-Kafka dataflow
  *    minus the broker — raw JSON in → parse/null-filter/keyBy →
  *    `alertsTws` → throttle → JSON-serialize out → noop. This is the
  *    number comparable to the reference claim (its counts include
  *    deserialization).
  *
  * Workload: `batches` x `perBatch` events (defaults 24 x 500k = 12M)
  * over a fixed 100k-key population, values 0..99 so the threshold rule
  * fires on ~4% of events, the stat rule keeps a full 10-deep window per
  * key, and the rate deque stays loaded (3600 s window, per-key interval
  * short enough that nothing evicts) — the worst steady state for the
  * rate rule's memory, the honest one for its cost.
  *
  * Reported per phase: per-batch wall times, steady-state events/sec
  * (batches after the first `warm`), and batch-time p50/p95, as one JSON
  * line. Run:
  *   sbt "runMain graft.tools.StreamThroughputBench [core|topology] [perBatch] [batches]"
  * with SPARK_GRAFT_MASTER=local[32] (default) or
  * local-cluster[4,8,8192] (export SPARK_SCALA_VERSION=2.13). */
object StreamThroughputBench {

  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("t1", "value", 95.0),
    RateRule("r1", "key", 3600, 5.0),
    StatisticalRule("s1", "value", windowSize = 10, deviationFactor = 3.0))

  private val nKeys = 100000L
  private val warm = 3

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((p * (s.size - 1)).round.toInt)
  }

  /** Where the batch went: per-stateful-operator update/commit time from
    * the progress metrics — the measured basis for naming the bottleneck
    * (detector loop vs RocksDB commit vs everything else). */
  private def opBreakdown(q: org.apache.spark.sql.streaming.StreamingQuery)
      : String = {
    val p = q.lastProgress
    val ops = p.stateOperators.zipWithIndex.map { case (so, i) =>
      f"op$i upd=${so.allUpdatesTimeMs / 1000.0}%.1fs " +
        f"commit=${so.commitTimeMs / 1000.0}%.1fs rows=${so.numRowsTotal}"
    }.mkString("  ")
    // the engine's own phase decomposition (ms): addBatch = plan execution,
    // the rest is trigger machinery — the measured basis for "where does
    // the non-state time go"
    val dur = p.durationMs.entrySet().iterator()
    val sb = new StringBuilder
    while (dur.hasNext) {
      val e = dur.next()
      if (e.getValue >= 100L) sb.append(s" ${e.getKey}=${e.getValue / 1000.0}s")
    }
    ops + sb.toString
  }

  private def summarize(tag: String, times: Seq[Double], perBatch: Int): String = {
    // steady-state = batches after the warm-up; with <= warm batches there
    // IS no steady state, so fall back to the full list rather than index
    // into an empty Seq / divide by zero (ADVICE r12)
    val steady = if (times.size > warm) times.drop(warm) else times
    val eps = steady.size.toLong * perBatch / steady.sum
    f"""{"phase":"$tag","batches":${times.size},"per_batch":$perBatch,""" +
      f""""steady_events_per_sec":${eps.round},"batch_p50_s":${pct(steady, 0.5)}%.2f,""" +
      f""""batch_p95_s":${pct(steady, 0.95)}%.2f,"total_s":${times.sum}%.1f}"""
  }

  private val phases = Set("all", "core", "fusedcore", "topology",
    "fusedtopology", "narrowtopology", "batchref")

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("all")
    // a typo'd phase would otherwise match no tag and silently run
    // NOTHING — the same loud-misuse posture as Verify --only
    require(phases.contains(phase),
      s"unknown phase '$phase'; expected one of ${phases.mkString(", ")}")
    val perBatch = args.lift(1).map(_.toInt).getOrElse(500000)
    val batches = args.lift(2).map(_.toInt).getOrElse(24)
    require(batches > warm, s"need > $warm batches (the warm-up) for a " +
      s"steady-state measurement; got $batches")
    require(perBatch > 0, s"perBatch must be positive; got $perBatch")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val spark = graft.sources.Sessions.builder(master, 32)
      .config("spark.executor.memory", "7g")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // purge committed MemoryStream batches promptly: at the default
    // retention (100 batches) the driver pins every generated event for
    // the whole run (~12M objects), and the resulting full GCs showed up
    // as 50 s batch-time spikes that were harness artifact, not pipeline
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val summaries = scala.collection.mutable.ArrayBuffer.empty[String]

    // `core` = staged throttled(alertsTws(...)) — the r12 protocol;
    // `fusedcore` = the fused alertsTwsThrottled single-operator topology
    // on the same MemoryStream protocol, so the two are directly
    // comparable (the harness tax — java-deserializing driver-held
    // MemoryStream rows into tasks each batch — is identical in both;
    // tools/StreamCoreBench measures the tax-free numbers).
    for (tag <- Seq("core", "fusedcore") if phase == "all" || phase == tag) {
      val ms = MemoryStream[SEvent]
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-stb-$tag").toString
      val alerts =
        if (tag == "fusedcore")
          StreamingDetectors.alertsTwsThrottled(ms.toDS(), rules, 600L)
        else StreamingThrottle.throttled(
          StreamingDetectors.alertsTws(ms.toDS(), rules), 600L)
      val q = alerts
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      val times = Seq.newBuilder[Double]
      try {
        (0 until batches).foreach { b =>
          val evs = (0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            SEvent(s"k${id % nKeys}", id, id / 1000,
              Map("value" -> (id % 100).toDouble), "{}")
          }
          ms.addData(evs)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          times += dt
          println(f"$tag b$b%-3d ${dt}%6.2f s  ${perBatch / dt}%,.0f ev/s  " +
            opBreakdown(q))
        }
      } finally q.stop()
      summaries += summarize(tag, times.result(), perBatch)
    }

    if (phase == "all" || phase == "topology") {
      val ms = MemoryStream[String]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stb-topo").toString
      val sev = StreamingDetectors.parsedEvents(
        ms.toDS().toDF("value"), rules, keyField = "user_id")
      val q = graft.sources.EventJson.serializeAlerts(
          StreamingThrottle.throttled(
            StreamingDetectors.alertsTws(sev, rules), 600L).toDF())
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      val times = Seq.newBuilder[Double]
      try {
        (0 until batches).foreach { b =>
          val raw = (0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            s"""{"user_id":"u${id % nKeys}","event_id":$id,"ts":${id / 1000},"value":${id % 100}}"""
          }
          ms.addData(raw)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          times += dt
          println(f"topo b$b%-3d ${dt}%6.2f s  ${perBatch / dt}%,.0f ev/s  " +
            opBreakdown(q))
        }
      } finally q.stop()
      summaries += summarize("topology", times.result(), perBatch)
    }

    if (phase == "all" || phase == "fusedtopology") {
      // same full topology (raw JSON in -> JSON alerts out) with the
      // r13 FUSED detect+throttle core in place of the staged pair
      val ms = MemoryStream[String]
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-stb-ftopo").toString
      val sev = StreamingDetectors.parsedEvents(
        ms.toDS().toDF("value"), rules, keyField = "user_id")
      val q = graft.sources.EventJson.serializeAlerts(
          StreamingDetectors.alertsTwsThrottled(sev, rules, 600L).toDF())
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      val times = Seq.newBuilder[Double]
      try {
        (0 until batches).foreach { b =>
          val raw = (0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            s"""{"user_id":"u${id % nKeys}","event_id":$id,"ts":${id / 1000},"value":${id % 100}}"""
          }
          ms.addData(raw)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          times += dt
          println(f"ftopo b$b%-3d ${dt}%6.2f s  ${perBatch / dt}%,.0f ev/s  " +
            opBreakdown(q))
        }
      } finally q.stop()
      summaries += summarize("fusedtopology", times.result(), perBatch)
    }

    if (phase == "all" || phase == "narrowtopology") {
      // the r14 production EP1 plan: pruned-schema parse (from_json on a
      // struct of ONLY the rule-referenced fields — no event map ever
      // materializes) -> the fused detect+throttle single operator ->
      // JSON alerts out; directly comparable to `fusedtopology`, whose
      // only delta is the map-shaped parse
      val ms = MemoryStream[String]
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-stb-ntopo").toString
      val q = StreamingDetectors.jsonPipelineFused(
          ms.toDS().toDF("value"), rules, keyField = "user_id", periodSec = 600L)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      val times = Seq.newBuilder[Double]
      try {
        (0 until batches).foreach { b =>
          val raw = (0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            s"""{"user_id":"u${id % nKeys}","event_id":$id,"ts":${id / 1000},"value":${id % 100}}"""
          }
          ms.addData(raw)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          times += dt
          println(f"ntopo b$b%-3d ${dt}%6.2f s  ${perBatch / dt}%,.0f ev/s  " +
            opBreakdown(q))
        }
      } finally q.stop()
      summaries += summarize("narrowtopology", times.result(), perBatch)
    }

    if (phase == "all" || phase == "batchref") {
      // the same events through the BATCH detector plans + throttle —
      // the price floor the micro-batch path is measured against: one
      // windowed whole-stage-codegen pass, no per-event state store, no
      // per-batch commit. The streaming-vs-batch ratio IS the measured
      // cost of incremental delivery (exactly-once RocksDB state + the
      // typed processor boundary), paid back in latency: the batch plan
      // answers once, the stream answers every trigger.
      import org.apache.spark.sql.functions.{concat, expr, lit, timestamp_micros}
      val n = batches.toLong * perBatch
      val ev = spark.range(n).select(
          org.apache.spark.sql.functions.col("id").as("event_id"),
          (expr("id div 1000") * lit(1000000000L)).as("ts_ns"),
          concat(lit("k"), expr(s"id % $nKeys")).as("user_id"),
          lit("evt").as("event_type"),
          expr("CAST(id % 100 AS DOUBLE)").as("value"),
          lit("{}").as("props"))
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      // same rule set, batch column names (the stream keys on SEvent.key;
      // the batch frame keys on user_id)
      val batchRules: Seq[DetectionRule] = Seq(
        ThresholdRule("t1", "value", 95.0),
        RateRule("r1", "user_id", 3600, 5.0),
        StatisticalRule("s1", "value", windowSize = 10, deviationFactor = 3.0))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Detectors.throttle(
            graft.operators.Detectors.allAlerts(ev, batchRules), 600L)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"batchref ${dt}%6.2f s  ${n / dt}%,.0f ev/s ($n events)")
        dt
      }
      summaries += f"""{"phase":"batchref","events":$n,""" +
        f""""events_per_sec":${(n / times.min).round},"wall_s":${times.min}%.1f}"""
    }

    summaries.foreach(println)
    spark.stop()
  }
}
