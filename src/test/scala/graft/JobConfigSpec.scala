package graft

import graft.model.JobConfig
import org.scalatest.funsuite.AnyFunSuite

/** Env-config parity with the reference JobConfig
  * (flink-job/.../JobConfig.java:81-98 resolution, :244-264 validation,
  * :278-281 blank-falls-back-to-default env semantics). */
class JobConfigSpec extends AnyFunSuite {

  test("defaults match the reference fromEnvironment defaults (:81-98)") {
    val c = JobConfig.fromEnvironment(Map.empty)
    assert(c.kafkaBootstrapServers == "localhost:9092")
    assert(c.kafkaInputTopic == "events")
    assert(c.kafkaAlertTopic == "alerts")
    assert(c.kafkaGroupId == "stream-sentinel")
    assert(c.parallelism == 1)
    assert(c.checkpointIntervalMs == 60000L)
    assert(c.rulesConfigPath == "")
    assert(c.healthPort == 8080)
    assert(c.defaultKeyField == "userId")
    // engine extensions default to reference-equivalent behavior
    assert(c.detectorEngine == "tws")
    assert(c.alertThrottleSec == 0L)
  }

  test("engine extensions: resolution and validation") {
    val c = JobConfig.fromEnvironment(Map(
      "DETECTOR_ENGINE" -> "fmgws"))
    assert(c.detectorEngine == "fmgws")
    val t = JobConfig.fromEnvironment(Map("ALERT_THROTTLE_SEC" -> "600"))
    assert(t.alertThrottleSec == 600L && t.detectorEngine == "tws")
    val ex = intercept[IllegalArgumentException] {
      JobConfig(detectorEngine = "flink").validated
    }
    assert(ex.getMessage == "detectorEngine must be 'tws' or 'fmgws', got: flink")
    intercept[IllegalArgumentException](JobConfig(alertThrottleSec = -1L).validated)
    // the throttle is a transformWithState operator: fmgws can't host it
    val ex2 = intercept[IllegalArgumentException] {
      JobConfig(detectorEngine = "fmgws", alertThrottleSec = 60L).validated
    }
    assert(ex2.getMessage.contains("requires the tws engine"))
    intercept[IllegalStateException] {
      JobConfig.fromEnvironment(Map("ALERT_THROTTLE_SEC" -> "10s"))
    }
  }

  test("env values override defaults; blank values fall back (:278-281)") {
    val c = JobConfig.fromEnvironment(Map(
      "KAFKA_BOOTSTRAP_SERVERS" -> "broker:9093",
      "KAFKA_INPUT_TOPIC" -> "  ", // blank -> default, not blank-and-invalid
      "FLINK_PARALLELISM" -> "8",
      "DEFAULT_KEY_FIELD" -> "user_id"))
    assert(c.kafkaBootstrapServers == "broker:9093")
    assert(c.kafkaInputTopic == "events")
    assert(c.parallelism == 8)
    assert(c.defaultKeyField == "user_id")
  }

  test("parallelism < 1 rejected with the reference's message (:251-253)") {
    val ex = intercept[IllegalArgumentException] {
      JobConfig(parallelism = 0).validated
    }
    assert(ex.getMessage == "parallelism must be >= 1, got: 0")
  }

  test("checkpoint interval < 1 rejected (:254-257)") {
    val ex = intercept[IllegalArgumentException] {
      JobConfig(checkpointIntervalMs = 0L).validated
    }
    assert(ex.getMessage == "checkpointIntervalMs must be >= 1, got: 0")
  }

  test("health port out of range rejected (:258-261)") {
    val ex = intercept[IllegalArgumentException] {
      JobConfig(healthPort = 70000).validated
    }
    assert(ex.getMessage == "healthPort must be in [1, 65535], got: 70000")
    intercept[IllegalArgumentException](JobConfig(healthPort = 0).validated)
  }

  test("blank topic / group / key field rejected (:246-249)") {
    val ex = intercept[IllegalArgumentException] {
      JobConfig(kafkaInputTopic = " ").validated
    }
    assert(ex.getMessage == "kafkaInputTopic must not be null or blank")
    intercept[IllegalArgumentException](JobConfig(kafkaAlertTopic = "").validated)
    intercept[IllegalArgumentException](JobConfig(kafkaGroupId = null).validated)
    intercept[IllegalArgumentException](JobConfig(defaultKeyField = "").validated)
  }

  test("unparseable numeric env surfaces as IllegalStateException (:94-97)") {
    val ex = intercept[IllegalStateException] {
      JobConfig.fromEnvironment(Map("FLINK_PARALLELISM" -> "not-a-number"))
    }
    assert(ex.getMessage.startsWith("Failed to parse numeric environment variable"))
  }
}
