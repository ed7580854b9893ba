package graft.streaming

import graft.model.{JobConfig, RulesLoader}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's production entry point (StreamSentinelJob.main,
  * flink-job/.../StreamSentinelJob.java:61-93) re-expressed as a Spark
  * Structured Streaming job:
  *
  *   1. config from env (JobConfig.fromEnvironment — :81-98)
  *   2. rules (explicit path -> env -> classpath, loadRules :146-152)
  *   3. Kafka source, earliest offsets (:106-112)
  *   4. the EP1 dataflow ([[buildPipeline]]: deserialize -> null filter
  *      -> keyBy -> stateful multi-rule process [fused with the alert
  *      throttle when configured] -> serialize; engine selected by
  *      DETECTOR_ENGINE — the measured-best transformWithState plan by
  *      default, the reference-parity flatMapGroupsWithState on request)
  *   5. Kafka sink to the alerts topic (:129-139)
  *   6. checkpointing (:154-165 — Spark: checkpointLocation; exactly-once
  *      state, at-least-once Kafka publish; the delta is documented in
  *      SURVEY §2 op 18)
  *
  * The `kafka` format resolves at query start from the classpath. This
  * container deliberately ships no `spark-sql-kafka` connector (offline,
  * SURVEY §2 op 1), so [[main]] is compile-complete but will fail to
  * start here; every piece below the source — the whole pipeline — is
  * end-to-end tested through MemoryStream in StreamingSpec, and the same
  * jar-present deployment runs unchanged. The metrics listener is
  * registered exactly as a production run would ([[graft.observe.SentinelQueryListener]]).
  */
object SentinelJob {

  def kafkaSource(spark: SparkSession, cfg: JobConfig): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.kafkaBootstrapServers)
      .option("subscribe", cfg.kafkaInputTopic)
      .option("kafka.group.id", cfg.kafkaGroupId)
      .option("startingOffsets", "earliest") // OffsetsInitializer.earliest()
      .load()

  /** Alerts (a one-column `value` JSON DataFrame) -> the alerts topic.
    * The micro-batch trigger runs at the configured checkpoint interval
    * (FLINK_CHECKPOINT_INTERVAL_MS): Spark checkpoints once per
    * micro-batch, so the trigger cadence IS the checkpoint cadence — the
    * closest Structured-Streaming analog of the reference's
    * `enableCheckpointing(intervalMs)` (StreamSentinelJob.java:154-165). */
  def kafkaSink(alerts: DataFrame, cfg: JobConfig,
      checkpointDir: String): StreamingQuery =
    alerts.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.kafkaBootstrapServers)
      .option("topic", cfg.kafkaAlertTopic)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(cfg.checkpointIntervalMs))
      .start()

  /** The EP1 dataflow for a raw source frame, selected by config — the
    * testable seam between the Kafka edges and the engine (EndToEndSpec
    * drives it through the YAML -> config -> alerts lifecycle on a
    * MemoryStream):
    *
    *  - `detectorEngine = "tws"` (default): the measured-best topology —
    *    pruned-schema parse ([[StreamingDetectors.narrowParse]]: only
    *    rule-referenced fields leave Jackson) into ONE
    *    `transformWithState` operator, fused with the alert throttle
    *    when `alertThrottleSec > 0` ([[StreamingDetectors
    *    .jsonPipelineFused]], the r13 1.75x-core plan). Requires the
    *    RocksDB state store provider ([[main]] sets it).
    *  - `detectorEngine = "fmgws"`: the reference-parity
    *    `flatMapGroupsWithState` topology ([[StreamingDetectors
    *    .jsonPipeline]]) for HDFS-backed-store deployments; no throttle
    *    (validation rejects the combination).
    *
    * COMPATIBILITY: the engines persist different state schemas
    * ("detectors" narrow/Map forms vs "detthr"), so switching engines —
    * or toggling the throttle under tws — needs a fresh
    * checkpointLocation; detector state rebuilds within one trailing
    * window. */
  def buildPipeline(raw: DataFrame, cfg: JobConfig,
      rules: Seq[graft.model.DetectionRule]): DataFrame =
    cfg.detectorEngine match {
      case "fmgws" =>
        StreamingDetectors.jsonPipeline(raw, rules, cfg.defaultKeyField)
      case _ =>
        if (cfg.alertThrottleSec > 0)
          StreamingDetectors.jsonPipelineFused(raw, rules,
            cfg.defaultKeyField, cfg.alertThrottleSec)
        else
          StreamingDetectors.jsonPipelineTws(raw, rules, cfg.defaultKeyField)
    }

  def main(args: Array[String]): Unit = {
    val cfg = JobConfig.fromEnvironment()
    val rules = JobConfig.loadRules(cfg).rules
    if (rules.isEmpty) // startup error, StreamSentinelJob.java:70-75
      throw new IllegalStateException("no detection rules configured")
    val builder = graft.sources.Sessions
      .builder(s"local[${cfg.parallelism}]", cfg.parallelism)
      .appName("stream-sentinel-spark")
    // the production engine's stateful operators run on RocksDB
    // (transformWithState does not run on the default HDFS store)
    if (cfg.detectorEngine == "tws")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    val listener = new graft.observe.SentinelQueryListener()
    spark.streams.addListener(listener)
    // K8s probe endpoints (HealthServer.java:46-68) plus the /metrics
    // scrape surface over the listener; daemon-threaded, so it needs no
    // shutdown hook to let the JVM exit.
    val health = new graft.observe.HealthServer(Some(() => listener.snapshot))
    health.start(cfg.healthPort)
    val alerts = buildPipeline(kafkaSource(spark, cfg), cfg, rules)
    val query = kafkaSink(alerts, cfg,
      sys.env.getOrElse("CHECKPOINT_DIR", "/tmp/graft-checkpoint"))
    try query.awaitTermination()
    finally health.stop()
  }
}
