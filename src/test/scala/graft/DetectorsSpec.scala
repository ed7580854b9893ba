package graft

import graft.model._
import graft.operators.Detectors
import org.apache.spark.sql.DataFrame

/** Behavioral port of the reference's 18 unit-test cases (SURVEY.md §5)
  * against the BATCH operators. Case sources cited per test (paths
  * relative to /root/reference/core-engine/src/test/java/com/
  * streamsentinel/core/). */
class DetectorsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, Long, Double)]): DataFrame =
    rows.toDF("event_id", "ts_sec", "user_id", "value")

  private def run(df: DataFrame, rule: DetectionRule): Seq[(String, Long)] =
    Detectors.compile(rule)(df)
      .select("rule_name", "event_id").as[(String, Long)].collect().toSeq.sorted

  // ---- ThresholdDetectorTest.java ----------------------------------------

  val thr = ThresholdRule("t", "value", 1000.0)

  test("threshold fires above (:32-41)") {
    assert(run(events(Seq((0L, 0L, 1L, 1500.0))), thr) == Seq(("t", 0L)))
  }

  test("threshold silent below (:43-50)") {
    assert(run(events(Seq((0L, 0L, 1L, 500.0))), thr).isEmpty)
  }

  test("threshold strict: silent at exactly the threshold (:52-59)") {
    assert(run(events(Seq((0L, 0L, 1L, 1000.0))), thr).isEmpty)
  }

  test("threshold skips missing field (:61-68)") {
    val df = Seq((0L, 0L, 1L)).toDF("event_id", "ts_sec", "user_id")
    val r = ThresholdRule("t", "amount", 1000.0) // no `amount` column ->
    // the reference's missing-field skip; batch equivalent: null-cast filter
    val df2 = df.withColumn("amount",
      org.apache.spark.sql.functions.lit(null).cast("double"))
    assert(run(df2, r).isEmpty)
  }

  test("threshold coerces string-encoded numbers (:70-79)") {
    val df = Seq((0L, 0L, 1L, "20000"), (1L, 0L, 1L, "garbage"))
      .toDF("event_id", "ts_sec", "user_id", "value")
    assert(run(df, ThresholdRule("t", "value", 10000.0)) == Seq(("t", 0L)))
  }

  // ---- RateSpikeDetectorTest.java ----------------------------------------

  val rate = RateRule("r", "user_id", 10, 3.0)

  test("rate: 3 events silent, 4th fires (:33-54)") {
    val df = events(Seq((0L, 100L, 1L, 1.0), (1L, 101L, 1L, 1.0),
      (2L, 102L, 1L, 1.0), (3L, 103L, 1L, 1.0)))
    assert(run(df, rate) == Seq(("r", 3L)))
  }

  test("rate: eviction — 3 at t, 1 at t+11s on 10s window: no fire (:56-77)") {
    val df = events(Seq((0L, 100L, 1L, 1.0), (1L, 100L, 1L, 1.0),
      (2L, 100L, 1L, 1.0), (3L, 111L, 1L, 1.0)))
    assert(run(df, rate).isEmpty)
  }

  test("rate sliced == plain across slice boundaries (incl. fixture)") {
    // slice=16s on a 10s window: boundaries at 96, 112, 128... the burst
    // straddles them, exercising context-band counting both ways
    val df = events((0 until 40).map(i =>
      (i.toLong, 90L + i * 2, (i % 3).toLong, 1.0)))
    val r = RateRule("r", "user_id", 10, 2.0)
    def set(d: DataFrame) = d.select("event_id", "value", "details")
      .as[(Long, Double, String)].collect().toSet
    assert(set(Detectors.rateAlertsSliced(df, r, sliceSeconds = 16L)) ==
      set(Detectors.rateAlerts(df, r)))
    // and on the real fixture with the registered rule/default slice
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val fr = graft.SparkEntry.FixtureRules.rate
    assert(set(Detectors.rateAlertsSliced(ev, fr)) ==
      set(Detectors.rateAlerts(ev, fr)))
  }

  test("rate: keys are independent") {
    val df = events(Seq((0L, 100L, 1L, 1.0), (1L, 100L, 2L, 1.0),
      (2L, 100L, 3L, 1.0), (3L, 100L, 4L, 1.0)))
    assert(run(df, rate).isEmpty)
  }

  // ---- StatisticalOutlierDetectorTest.java -------------------------------

  val stat = StatisticalRule("s", "value", 10, 2.0)

  test("statistical warm-up: first 2 events never fire (:33-38)") {
    val df = events(Seq((0L, 0L, 1L, 100.0), (1L, 1L, 1L, 5000.0)))
    assert(run(df, stat).isEmpty)
  }

  // Reference tests assert only the FINAL evaluate()'s outcome — warm-up
  // events may or may not fire on their own small baselines, exactly as in
  // the reference engine. Values below are the reference sample cohort
  // (examples/sample-events.json, user_003-style).
  private val baseline = Seq(102.5, 98.75, 101.2, 99.8, 103.1)

  test("statistical: near-mean value silent (:40-51)") {
    val rows = baseline.zipWithIndex.map { case (v, i) => (i.toLong, i.toLong, 1L, v) }
    val withProbe = rows :+ ((5L, 5L, 1L, 101.0))
    assert(!run(events(withProbe), stat).map(_._2).contains(5L))
  }

  test("statistical: extreme outlier fires (:53-66)") {
    val rows = baseline.zipWithIndex.map { case (v, i) => (i.toLong, i.toLong, 1L, v) }
    val withProbe = rows :+ ((5L, 5L, 1L, 5000.0))
    assert(run(events(withProbe), stat).map(_._2).contains(5L))
  }

  test("statistical: sigma==0 plus any different value fires (:68-79)") {
    val df = events(Seq((0L, 0L, 1L, 100.0), (1L, 1L, 1L, 100.0),
      (2L, 2L, 1L, 101.0)))
    assert(run(df, stat) == Seq(("s", 2L)))
  }

  test("statistical: sigma==0 plus identical value silent") {
    val df = events(Seq((0L, 0L, 1L, 100.0), (1L, 1L, 1L, 100.0),
      (2L, 2L, 1L, 100.0)))
    assert(run(df, stat).isEmpty)
  }

  test("statistical: check-before-insert — value excluded from own baseline") {
    // window [100, 100], current 101: baseline sigma==0, dev=1 -> fires even
    // though including 101 in its own window would give sigma>0, dev<2*sigma
    val df = events(Seq((0L, 0L, 1L, 100.0), (1L, 1L, 1L, 100.0),
      (2L, 2L, 1L, 101.0), (3L, 3L, 1L, 101.0)))
    val fired = run(df, stat).map(_._2)
    assert(fired.contains(2L))
  }

  test("statistical on a non-value field: original_event keeps the raw value") {
    // regression: the measured field used to overwrite `value` before the
    // original_event projection, falsifying the embedded event whenever
    // rule.field != "value"
    val df = Seq(
      (0L, 0L, 1L, 7.5, 100.0), (1L, 1L, 1L, 7.5, 100.0),
      (2L, 2L, 1L, 7.5, 5000.0))
      .toDF("event_id", "ts_sec", "user_id", "value", "amount")
    val alerts = Detectors
      .statisticalAlerts(df, StatisticalRule("s", "amount", 5, 2.0))
      .select("event_id", "value", "original_event")
      .as[(Long, Double, String)].collect()
    assert(alerts.map(_._1).toSeq == Seq(2L))
    assert(alerts.head._2 == 5000.0) // alert value = the measured field
    // the embedded event carries the RAW value column, not the measure
    assert(alerts.head._3.contains("\"value\":7.50"))
  }

  // ---- DetectorFactoryTest.java ------------------------------------------

  test("rule dispatch: type -> operator mapping, unknown type rejected (:14-47)") {
    assert(DetectionRule.validate(DetectionRule.Raw(name = "x",
      `type` = "threshold", field = "f")).isRight)
    assert(DetectionRule.validate(DetectionRule.Raw(name = "x",
      `type` = "RATE", keyField = "k", windowSeconds = 5, threshold = 1))
      .exists(_.isInstanceOf[RateRule])) // type lowercased like :141-143
    assert(DetectionRule.validate(DetectionRule.Raw(name = "x",
      `type` = "statistical", field = "f")).isRight)
    assert(DetectionRule.validate(DetectionRule.Raw(name = "x",
      `type` = "bogus")).isLeft)
  }

  test("ensemble_alerts: fuses all five families, rule lists sorted and duplicate-free") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ensemble_alerts")(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, rules) =>
      val rs = rules.split(",").toSeq
      assert(rs.length == n && rs.distinct == rs, s"event $id")
      assert(rs.sorted == rs, s"event $id rules unsorted")
      assert(rs.forall(Set("high_value", "high_rate", "unusual_value",
        "seasonal_value", "error_burst")), s"event $id unknown rule")
    }
    // the fusion covers exactly the union of the per-family flag sets
    val base = graft.operators.Detectors.allAlerts(
      graft.sources.Tables.events(spark, dir), SparkEntry.FixtureRules.all)
      .select("event_id").as[Long].collect().toSet
    val seas = graft.operators.Analytics.seasonalAlerts(spark, dir)
      .select("event_id").as[Long].collect().toSet
    val burst = graft.operators.Detectors.patternAlerts(spark, dir)
      .select("event_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == (base ++ seas ++ burst))
  }
}
