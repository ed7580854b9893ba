package graft

import graft.model._
import graft.operators.Detectors
import graft.streaming.StreamingDetectors
import org.apache.spark.sql.functions._

/** The reference's error-containment contract
  * (AnomalyProcessFunction.java:120-134, AlertSerializationSchema.java:
  * 24-30): one broken rule cannot kill the others, and a record that
  * fails to serialize becomes empty bytes, never a crashed job. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private val healthy = Seq[DetectionRule](
    ThresholdRule("high_value", "value", 200.0),
    RateRule("burst", "user_id", 60, 3.0))
  private val broken: DetectionRule =
    ThresholdRule("bad_field", "no_such_column", 1.0)

  test("allAlertsContained: a broken rule is reported, healthy rules run") {
    val events = graft.sources.Tables.events(spark, dir)
    val (alerts, errs) = Detectors.allAlertsContained(
      events, healthy :+ broken)
    assert(errs.map(_.rule_name) == Seq("bad_field"))
    assert(errs.head.error_class.contains("AnalysisException"))
    val expected = Detectors.allAlerts(events, healthy).count()
    assert(expected > 0 && alerts.count() == expected)
  }

  test("allAlertsContained: every rule broken -> empty typed frame + full report") {
    val events = graft.sources.Tables.events(spark, dir)
    val (alerts, errs) = Detectors.allAlertsContained(events,
      Seq(broken, ThresholdRule("bad2", "also_missing", 2.0)))
    assert(errs.map(_.rule_name) == Seq("bad_field", "bad2"))
    assert(alerts.count() == 0)
    assert(alerts.columns.toSeq == Seq("rule_name", "key", "ts_sec",
      "event_id", "value", "details", "original_event"))
  }

  test("guarded: NonFatal is contained and reported; the rest of the rules run") {
    var seen = Option.empty[(String, Throwable)]
    val r = StreamingDetectors.guarded[Int]("r1",
      (n, t) => seen = Some((n, t)))(throw new RuntimeException("boom"))
    assert(r.isEmpty)
    assert(seen.exists { case (n, t) => n == "r1" && t.getMessage == "boom" })
  }

  test("guarded: fatal errors and interrupts propagate (NonFatal contract)") {
    intercept[InterruptedException] {
      StreamingDetectors.guarded[Int]("r1",
        (_, _) => fail("must not contain an interrupt"))(
        throw new InterruptedException())
    }
    Thread.interrupted() // clear the flag for the rest of the suite
  }

  test("serializeAlerts: a row that fails to serialize becomes empty bytes") {
    // assert_true throws mid-evaluation for the value=1.0 row — the analog
    // of Jackson throwing inside the reference's serialize(); TryEval
    // contains it per row, the healthy row still serializes. Range-backed,
    // not Seq-backed: ConvertToLocalRelation would eval the projection at
    // OPTIMIZE time on a LocalRelation and throw before any runtime
    // containment could apply — which is itself a planning-time error, not
    // a per-record serialize failure.
    val df = spark.range(2)
      .select((col("id") * 2 - 1).cast("double").as("value"))
      .withColumn("chk", assert_true(col("value") < 0))
    val out = graft.sources.EventJson.serializeAlerts(df)
      .as[String].collect().sorted
    assert(out.length == 2)
    assert(out.contains(""))
    assert(out.exists(_.contains("\"value\":-1.0")))
  }
}
