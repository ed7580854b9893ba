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
  *   4. the EP1 dataflow ([[StreamingDetectors.jsonPipeline]]: deserialize
  *      -> null filter -> keyBy -> stateful multi-rule process -> serialize)
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

  def main(args: Array[String]): Unit = {
    val cfg = JobConfig.fromEnvironment()
    val rules = JobConfig.loadRules(cfg).rules
    if (rules.isEmpty) // startup error, StreamSentinelJob.java:70-75
      throw new IllegalStateException("no detection rules configured")
    val spark = graft.sources.Sessions
      .builder(s"local[${cfg.parallelism}]", cfg.parallelism)
      .appName("stream-sentinel-spark")
      .getOrCreate()
    val listener = new graft.observe.SentinelQueryListener()
    spark.streams.addListener(listener)
    // K8s probe endpoints (HealthServer.java:46-68) plus the /metrics
    // scrape surface over the listener; daemon-threaded, so it needs no
    // shutdown hook to let the JVM exit.
    val health = new graft.observe.HealthServer(Some(() => listener.snapshot))
    health.start(cfg.healthPort)
    val alerts = StreamingDetectors.jsonPipeline(
      kafkaSource(spark, cfg), rules, cfg.defaultKeyField)
    val query = kafkaSink(alerts, cfg,
      sys.env.getOrElse("CHECKPOINT_DIR", "/tmp/graft-checkpoint"))
    try query.awaitTermination()
    finally health.stop()
  }
}
