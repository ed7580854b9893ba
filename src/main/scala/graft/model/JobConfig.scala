package graft.model

/** Typed, immutable job-level configuration — env-var parity with the
  * reference's `JobConfig` (flink-job/.../JobConfig.java:81-98, validation
  * at :244-264). Same variable names, same defaults, same validation
  * messages, so a deployment manifest written for the reference drops in
  * unchanged:
  *
  *  - `KAFKA_BOOTSTRAP_SERVERS` (localhost:9092), `KAFKA_INPUT_TOPIC`
  *    (events), `KAFKA_ALERT_TOPIC` (alerts), `KAFKA_GROUP_ID`
  *    (stream-sentinel)
  *  - `FLINK_PARALLELISM` (1) — here the shuffle-partition / local-core
  *    count; `FLINK_CHECKPOINT_INTERVAL_MS` (60000) — the streaming
  *    trigger/checkpoint cadence
  *  - `RULES_CONFIG_PATH` ("" = classpath rules.yml; consumed by
  *    [[RulesLoader.load]])
  *  - `HEALTH_PORT` (8080) — bound by [[graft.observe.HealthServer]]
  *    (SURVEY §2 op 15)
  *  - `DEFAULT_KEY_FIELD` (userId) — the event field keyBy coerces to
  *    string (StreamSentinelJob.java:121-124)
  *
  * Engine-specific extensions beyond the reference's nine variables.
  * Defaults preserve the reference's ALERT SEMANTICS when unset (same
  * alerts, byte-for-byte), but NOT checkpoint compatibility: the
  * default engine is the measured-best `tws` plan, so an in-place
  * upgrade of a pre-r14 deployment that restarts against an existing
  * flatMapGroupsWithState checkpoint fails loudly on the operator
  * mismatch — set `DETECTOR_ENGINE=fmgws` to keep the old topology on
  * the old checkpoint, or start the tws engine from a fresh
  * checkpointLocation (detector state rebuilds within one trailing
  * window).
  *  - `DETECTOR_ENGINE` (tws) — `tws` runs the measured-best production
  *    topology (pruned-schema parse + `transformWithState`/RocksDB;
  *    [[graft.streaming.SentinelJob.buildPipeline]]); `fmgws` keeps the
  *    reference-parity `flatMapGroupsWithState` topology for
  *    HDFS-backed-store deployments. Switching engines (or turning the
  *    throttle on/off under `tws`) changes the state schema — restart
  *    from a fresh checkpointLocation.
  *  - `ALERT_THROTTLE_SEC` (0 = off) — alert-storm suppression period:
  *    at most one alert per (rule, key, period bucket). Requires the
  *    `tws` engine (the throttle is a transformWithState operator).
  *
  * Env semantics match `JobConfig.env` (:278-281): unset OR blank value
  * falls back to the default. Numeric parse failure surfaces as
  * IllegalStateException like `fromEnvironment` (:94-97).
  */
final case class JobConfig(
    kafkaBootstrapServers: String = "localhost:9092",
    kafkaInputTopic: String = "events",
    kafkaAlertTopic: String = "alerts",
    kafkaGroupId: String = "stream-sentinel",
    parallelism: Int = 1,
    checkpointIntervalMs: Long = 60000L,
    rulesConfigPath: String = "",
    healthPort: Int = 8080,
    defaultKeyField: String = "userId",
    detectorEngine: String = "tws",
    alertThrottleSec: Long = 0L) {

  /** Validation identical to JobConfig.Builder.build (:244-264); throws
    * IllegalArgumentException with the reference's messages. */
  def validated: JobConfig = {
    def requireNonBlank(value: String, name: String): Unit =
      if (value == null || value.trim.isEmpty)
        throw new IllegalArgumentException(s"$name must not be null or blank")
    if (kafkaBootstrapServers == null)
      throw new IllegalArgumentException("kafkaBootstrapServers required")
    requireNonBlank(kafkaInputTopic, "kafkaInputTopic")
    requireNonBlank(kafkaAlertTopic, "kafkaAlertTopic")
    requireNonBlank(kafkaGroupId, "kafkaGroupId")
    requireNonBlank(defaultKeyField, "defaultKeyField")
    if (parallelism < 1)
      throw new IllegalArgumentException(
        s"parallelism must be >= 1, got: $parallelism")
    if (checkpointIntervalMs < 1)
      throw new IllegalArgumentException(
        s"checkpointIntervalMs must be >= 1, got: $checkpointIntervalMs")
    if (healthPort < 1 || healthPort > 65535)
      throw new IllegalArgumentException(
        s"healthPort must be in [1, 65535], got: $healthPort")
    if (!Set("tws", "fmgws").contains(detectorEngine))
      throw new IllegalArgumentException(
        s"detectorEngine must be 'tws' or 'fmgws', got: $detectorEngine")
    if (alertThrottleSec < 0)
      throw new IllegalArgumentException(
        s"alertThrottleSec must be >= 0, got: $alertThrottleSec")
    if (alertThrottleSec > 0 && detectorEngine != "tws")
      throw new IllegalArgumentException(
        "alertThrottleSec requires the tws engine (the throttle is a " +
          "transformWithState operator)")
    this
  }
}

object JobConfig {

  /** Resolve from an environment map (injectable for tests; production
    * callers use the default `sys.env`). */
  def fromEnvironment(env: Map[String, String] = sys.env): JobConfig = {
    def e(name: String, default: String): String =
      env.get(name).filter(_.trim.nonEmpty).getOrElse(default)
    try JobConfig(
      kafkaBootstrapServers = e("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"),
      kafkaInputTopic = e("KAFKA_INPUT_TOPIC", "events"),
      kafkaAlertTopic = e("KAFKA_ALERT_TOPIC", "alerts"),
      kafkaGroupId = e("KAFKA_GROUP_ID", "stream-sentinel"),
      parallelism = e("FLINK_PARALLELISM", "1").toInt,
      checkpointIntervalMs = e("FLINK_CHECKPOINT_INTERVAL_MS", "60000").toLong,
      rulesConfigPath = e("RULES_CONFIG_PATH", ""),
      healthPort = e("HEALTH_PORT", "8080").toInt,
      defaultKeyField = e("DEFAULT_KEY_FIELD", "userId"),
      detectorEngine = e("DETECTOR_ENGINE", "tws"),
      alertThrottleSec = e("ALERT_THROTTLE_SEC", "0").toLong
    ).validated
    catch {
      case ex: NumberFormatException =>
        throw new IllegalStateException(
          s"Failed to parse numeric environment variable: ${ex.getMessage}", ex)
    }
  }

  /** The rules for this config: explicit path wins, else the
    * [[RulesLoader.load]] resolution order (env -> classpath), mirroring
    * StreamSentinelJob.loadRules (:146-152). */
  def loadRules(cfg: JobConfig): RulesConfig =
    if (cfg.rulesConfigPath.trim.nonEmpty) RulesLoader.fromFile(cfg.rulesConfigPath)
    else RulesLoader.load()
}
