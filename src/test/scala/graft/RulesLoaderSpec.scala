package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Port of RulesLoaderTest.java (+ the RulesConfig validation behavior,
  * RulesConfig.java:67-85 / RulesLoader.java:120-136). */
class RulesLoaderSpec extends AnyFunSuite {

  test("classpath YAML load + field round-trip (:14-25)") {
    val cfg = RulesLoader.fromClasspath("test-rules.yml")
    assert(cfg.rules.size == 2)
    assert(cfg.rules.head == RateRule("test_rate", "userId", 5, 3.0))
    assert(cfg.rules(1) == ThresholdRule("test_threshold", "amount", 500.0))
  }

  test("missing classpath resource throws (:27-33)") {
    intercept[IllegalArgumentException] {
      RulesLoader.fromClasspath("no-such.yml")
    }
  }

  test("duplicate YAML keys rejected (RulesLoader.java:121-123)") {
    intercept[Exception] {
      RulesLoader.fromString(
        """rules:
          |  - name: a
          |    name: b
          |    type: threshold
          |    field: f
          |""".stripMargin)
    }
  }

  test("empty config tolerated as empty rule list (:126-129)") {
    assert(RulesLoader.fromString("").rules.isEmpty)
    assert(RulesLoader.fromString("rules:").rules.isEmpty)
  }

  test("validation collects ALL errors before failing (RulesConfig.java:67-85)") {
    val ex = intercept[RulesLoader.RulesValidationException] {
      RulesLoader.fromString(
        """rules:
          |  - name: bad_rate
          |    type: rate
          |  - name: bad_stat
          |    type: statistical
          |    field: f
          |    windowSize: 1
          |""".stripMargin)
    }
    assert(ex.errors.size >= 3) // keyField + windowSeconds + threshold missing
    assert(ex.errors.exists(_.contains("bad_stat")))
  }

  test("threshold-type rules do not validate the threshold value (DetectionRule.java:93-97)") {
    val cfg = RulesLoader.fromString(
      """rules:
        |  - name: zero_thr
        |    type: threshold
        |    field: amount
        |""".stripMargin)
    assert(cfg.rules.head == ThresholdRule("zero_thr", "amount", 0.0))
  }

  test("statistical defaults: windowSize=10, deviationFactor=2.0 (DetectionRule.java:55,58)") {
    val cfg = RulesLoader.fromString(
      """rules:
        |  - name: s
        |    type: statistical
        |    field: v
        |""".stripMargin)
    assert(cfg.rules.head == StatisticalRule("s", "v", 10, 2.0))
  }
}
