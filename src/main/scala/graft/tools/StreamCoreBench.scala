package graft.tools

import graft.model._
import graft.streaming.{SEvent, StreamingDetectors, StreamingThrottle}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-core throughput WITHOUT the MemoryStream harness tax.
  *
  * Round-13 thread-profile finding: in [[StreamThroughputBench]]'s `core`
  * phase the top RUNNABLE executor frames are `UnsafeRow.readExternal`
  * under `ObjectInputStream` — JAVA deserialization of the driver-held
  * MemoryStream rows being shipped to tasks every batch. That is the
  * measurement HARNESS, not the detector pipeline: the round-12
  * decomposition's "~70% micro-batch machinery" is mostly this tax, which
  * also explains why pipeline-side exchange optimizations barely move the
  * MemoryStream number.
  *
  * This bench swaps the source for `rate-micro-batch` — a deterministic
  * rows-per-trigger source whose rows are SYNTHESIZED ON THE EXECUTORS
  * from (start, end) offset ranges (nothing driver-held, no Java
  * serialization) — and builds the exact same workload in Catalyst:
  * 100k-key population, values cycling 0..99 (threshold fires ~4%), the
  * rate deque fully loaded, `original` = "{}". Same rules, same throttle,
  * same RocksDB/changelog posture as the `core` phase; what remains is
  * the pipeline itself: exchange + detector transition + state store.
  *
  * Per-batch times come from the engine's own progress stream
  * (`triggerExecution` ms per completed batch via `recentProgress`), so
  * the driver's pacing loop adds nothing to what's measured. Run:
  *   sbt "runMain graft.tools.StreamCoreBench [perBatch] [batches]"
  * with SPARK_GRAFT_MASTER=local[32] (default). */
object StreamCoreBench {

  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("t1", "value", 95.0),
    RateRule("r1", "key", 3600, 5.0),
    StatisticalRule("s1", "value", windowSize = 10, deviationFactor = 3.0))

  private val nKeys = 100000L
  // steady state starts once the 3600 s rate window SATURATES: tsSec
  // advances perBatch/1000 per batch, so saturation takes
  // ceil(3.6e6 / perBatch) batches of deque growth (and growing RocksDB
  // values) before the per-batch work is stationary — ~7.2 with the
  // default 500k, but inversely MORE with smaller batches, so warm is
  // derived from perBatch rather than hardcoded for the default
  private def warmFor(batches: Int, perBatch: Int): Int =
    math.min(batches - 1, (3600000L + perBatch - 1) / perBatch + 1).toInt

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((p * (s.size - 1)).round.toInt)
  }

  def main(args: Array[String]): Unit = {
    val perBatch = args.lift(0).map(_.toInt).getOrElse(500000)
    val batches = args.lift(1).map(_.toInt).getOrElse(24)
    // staged = throttled(alertsTws(...)) (two stateful ops);
    // fused = alertsTwsThrottled (one exchange, one store);
    // jsontopo / jsonnarrow = the FULL topology (raw JSON in -> JSON
    // alerts out) with executor-synthesized JSON lines — map-shaped
    // parse vs the r14 pruned-schema parse. Suffix "-wide" pads each
    // event with 12 decoy fields (a realistic bus event carries far
    // more fields than any rule set references — the population the
    // pruned parse exists for).
    // jsonnoser[-wide] = jsonnarrow minus the output serializer (typed
    // alerts straight to the noop sink): the jsonnarrow delta over it is
    // the alert-serialization residual, measured differentially
    val topo = args.lift(2).getOrElse("staged")
    val topos = Set("staged", "fused", "jsontopo", "jsonnarrow",
      "jsontopo-wide", "jsonnarrow-wide", "jsonnoser", "jsonnoser-wide")
    require(topos.contains(topo), s"unknown topology: $topo")
    val warm = warmFor(batches, perBatch)
    require(batches > warm, s"need > $warm batches (rate-window " +
      s"saturation at $perBatch rows/batch) for a steady state")
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
    // recentProgress is a ring buffer (default 100 entries); a run with
    // more batches would silently lose the EARLIEST ones and drop(warm)
    // would then discard the wrong batches — size it to hold every batch
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (batches + 16).toString)
    import spark.implicits._

    val src = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", perBatch.toLong)
      .option("numPartitions", 32)
      .load()
    // same event formula as StreamThroughputBench.core, built in Catalyst:
    // id -> (key, eventId, tsSec, {value -> id % 100}, "{}")
    val ev = src.select(
        concat(lit("k"), expr(s"value % $nKeys")).as("key"),
        col("value").as("eventId"),
        expr("value div 1000").as("tsSec"),
        map(lit("value"), expr("CAST(value % 100 AS DOUBLE)")).as("fields"),
        lit("{}").as("original"))
      .as[SEvent]

    // same event content as `ev`, rendered as a JSON line IN CATALYST on
    // the executors (codegen'd concat — negligible next to the parse it
    // feeds); the wide form appends 12 decoy fields the rules never read
    val wide = topo.endsWith("-wide")
    val decoys = if (!wide) lit("}") else
      concat(lit(",\"source\":\"bench\",\"region\":\"r"),
        expr("value % 7"),
        lit("\",\"sess\":\"s"), expr("value % 1000"),
        lit("\",\"f1\":1,\"f2\":2.5,\"f3\":\"abc\",\"f4\":true,\"f5\":null," +
          "\"f6\":[1,2,3],\"f7\":{\"nested\":{\"deep\":1}}," +
          "\"f8\":\"xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx\",\"f9\":"),
        expr("value % 97"), lit(",\"f10\":\"tail\"}"))
    val raw = src.select(concat(
        lit("{\"user_id\":\"u"), expr(s"value % $nKeys"),
        lit("\",\"event_id\":"), col("value"),
        lit(",\"ts\":"), expr("value div 1000"),
        lit(",\"value\":"), expr("value % 100"),
        decoys).as("value"))
    // jsontopo rules key on the user_id FIELD (the json pipelines
    // extract the key from the event, not from a pre-built column)
    val jsonRules: Seq[DetectionRule] = Seq(
      ThresholdRule("t1", "value", 95.0),
      RateRule("r1", "user_id", 3600, 5.0),
      StatisticalRule("s1", "value", windowSize = 10, deviationFactor = 3.0))

    val ckpt = java.nio.file.Files.createTempDirectory("graft-scb").toString
    val alerts: org.apache.spark.sql.DataFrame =
      if (topo == "fused")
        StreamingDetectors.alertsTwsThrottled(ev, rules, 600L).toDF()
      else if (topo.startsWith("jsonnarrow"))
        StreamingDetectors.jsonPipelineFused(raw, jsonRules, "user_id", 600L)
      else if (topo.startsWith("jsonnoser"))
        StreamingDetectors.fusedAlertsFromJson(
          raw, jsonRules, "user_id", 600L).toDF()
      else if (topo.startsWith("jsontopo"))
        graft.sources.EventJson.serializeAlerts(
          StreamingDetectors.alertsTwsThrottled(
            StreamingDetectors.parsedEvents(raw, jsonRules, "user_id"),
            jsonRules, 600L).toDF())
      else StreamingThrottle.throttled(
        StreamingDetectors.alertsTws(ev, rules), 600L).toDF()
    val q = alerts
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

    try {
      // drain until `batches` batches have completed (batchIds 0..batches-1)
      while (Option(q.lastProgress).forall(_.batchId < batches - 1)) {
        q.awaitTermination(200L)
      }
      q.stop()
      val prog = q.recentProgress.toSeq
        .filter(p => p.batchId < batches && p.numInputRows > 0)
        .sortBy(_.batchId)
      prog.foreach { p =>
        val dt = p.durationMs.get("triggerExecution").toDouble / 1000.0
        val ops = p.stateOperators.zipWithIndex.map { case (so, i) =>
          f"op$i upd=${so.allUpdatesTimeMs / 1000.0}%.1f commit=${so.commitTimeMs / 1000.0}%.1f" }
          .mkString(" ")
        val add = p.durationMs.get("addBatch") / 1000.0
        println(f"coregen b${p.batchId}%-3d ${dt}%6.2f s  " +
          f"${p.numInputRows / dt}%,.0f ev/s  addBatch=$add%.1f  $ops")
      }
      val times = prog.drop(warm)
        .map(_.durationMs.get("triggerExecution").toDouble / 1000.0)
      val rows = prog.drop(warm).map(_.numInputRows).sum
      val eps = rows / times.sum
      println(f"""{"phase":"coregen-$topo","batches":${prog.size},"per_batch":$perBatch,""" +
        f""""steady_events_per_sec":${eps.round},"batch_p50_s":${pct(times, 0.5)}%.2f,""" +
        f""""batch_p95_s":${pct(times, 0.95)}%.2f,"total_s":${times.sum}%.1f}""")
    } finally if (q.isActive) q.stop()
    spark.stop()
  }
}
