package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pins the sketch-based scale paths that can't be DuckDB-oracle-checked
  * (different engines ship different sketch algorithms): HLL distinct
  * counting and approximate quantiles, each against the exact value on
  * the sf0.001 fixture. These are the operators you'd substitute for
  * their exact twins ([[graft.operators.Analytics.eventTypeReach]],
  * `value_quantiles`) at 100 TB: one pass, constant memory per group,
  * mergeable across executors. */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per event_type") {
    val ev = Tables.events(spark, dir)
    val both = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id", 0.02).as("hll"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getLong(1).toDouble
      val hll = r.getLong(2).toDouble
      assert(math.abs(hll - exact) / exact <= 0.05,
        s"${r.getString(0)}: exact=$exact hll=$hll")
    }
  }

  test("percentile_approx brackets the exact median of event values") {
    val ev = Tables.events(spark, dir).filter(col("value").isNotNull)
    val approxMed = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(1000))).collect()(0).getDouble(0)
    val sorted = ev.select("value").orderBy("value")
      .collect().map(_.getDouble(0))
    val lo = sorted((sorted.length * 0.45).toInt)
    val hi = sorted((sorted.length * 0.55).toInt)
    assert(approxMed >= lo && approxMed <= hi,
      s"approx median $approxMed outside [$lo, $hi]")
  }

  test("CMS audit: estimates never underestimate; overestimate bounded by collision mass") {
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = graft.operators.TextAnalysis.cmsHeavyHitters(spark, d)
        .select("term", "exact", "est", "over").collect()
      assert(rows.length == 20)
      val totalTerms = Tables.documents(spark, d)
        .select(explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
        .count()
      rows.foreach { r =>
        val (exact, over) = (r.getLong(1), r.getLong(3))
        assert(over >= 0L, s"$d ${r.getString(0)}: CMS underestimated")
        // expected collision mass per cell ~ N/width; 4 independent rows
        // taking the min should stay well under 8x that
        assert(over <= totalTerms / 256 * 8,
          s"$d ${r.getString(0)}: over $over vs exact $exact implausible")
      }
    }
  }

  test("portable HLL audit: error within 3 std errors at two SFs; registers merge") {
    // m = 64 -> std err ~13%; 0.40 is the 3-sigma floor. Unlike the
    // built-in sketch above, hll_distinct_audit is ALSO oracle-gated —
    // this test pins accuracy, the gate pins engine agreement.
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = graft.operators.Analytics.hllDistinctAudit(spark, d)
        .select("event_type", "n_exact", "rel_err").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getDouble(2) <= 0.40,
          s"$d ${r.getString(0)}: rel_err ${r.getDouble(2)} above 3-sigma floor")
      }
    }
  }

  test("KMV audit: exact below k, within 3 std errors above; overlap sane") {
    // k = 64 -> std err ~ 1/sqrt(k-2) ~ 12.7%; 0.38 is the 3-sigma floor
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = graft.operators.Analytics.kmvDistinctAudit(spark, d)
        .select("event_type", "n_exact", "n_kept", "rel_err").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        if (r.getLong(2) < 64)
          assert(r.getDouble(3) == 0.0,
            s"$d ${r.getString(0)}: sub-k sketch must be exact")
        else
          assert(r.getDouble(3) <= 0.38,
            s"$d ${r.getString(0)}: rel_err ${r.getDouble(3)} above 3-sigma floor")
      }
    }
  }

  test("KMV overlap: intersection estimate brackets the exact overlap") {
    // theta-sketch intersections carry more variance than distinct
    // counts (rho is small); pin a loose multiplicative bracket plus the
    // structural invariants instead of a tight error bar
    val rows = graft.operators.Analytics.kmvTypeOverlap(spark, "/root/testdata/sf0.1")
      .select("type_a", "type_b", "rho", "n_kept", "est_inter", "n_exact_inter")
      .collect()
    assert(rows.length == 10) // C(5,2) unordered type pairs
    rows.foreach { r =>
      val (rho, kept) = (r.getLong(2), r.getLong(3))
      val (est, exact) = (r.getDouble(4), r.getLong(5).toDouble)
      assert(rho <= kept)
      assert(est >= rho.toDouble, "scaling up cannot shrink the estimate")
      if (exact > 0)
        assert(est >= exact * 0.4 && est <= exact * 2.5,
          s"${r.getString(0)}x${r.getString(1)}: est $est vs exact $exact")
    }
  }
}
