package graft

import graft.model.RateRule
import graft.operators.Detectors
import graft.plans.RateWindowRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Pins for [[graft.plans.RateWindowRewrite]]: the plain trailing-RANGE
  * count window (Detectors.rateAlerts's shape) must plan as the
  * slice-parallel form by default, produce byte-identical rows to the
  * un-rewritten window, and decline exactly when the rewrite would not be
  * airtight (extra window aggregates, surviving slices, hand-sliced
  * plans, non-count frames). */
class RateWindowRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val rule = RateRule("high_rate", "user_id", 3600, 2.0)

  private def slicedWindows(df: DataFrame): Seq[LWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.exists(
          _.references.exists(_.name == "__graft_slice")) => w
    }

  private def generates(df: DataFrame): Seq[Generate] =
    df.queryExecution.optimizedPlan.collect { case g: Generate => g }

  /** Runs `mk` with the rewrite excluded from the optimizer — the
    * un-rewritten baseline the sliced plan must reproduce exactly. */
  private def withoutRule[A](mk: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, RateWindowRewrite.ruleName)
    try mk
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("fires on the fixture rate_alerts plan, exactly once") {
    val df = Detectors.rateAlerts(graft.sources.Tables.events(spark, dir), rule)
    assert(slicedWindows(df).size == 1)
    assert(generates(df).size == 1)
    // sanity: the excluded-rule baseline really is the plain window plan
    withoutRule {
      val plain = Detectors.rateAlerts(graft.sources.Tables.events(spark, dir), rule)
      assert(slicedWindows(plain).isEmpty && generates(plain).isEmpty)
    }
  }

  test("sliced plan output is byte-identical to the plain window's") {
    val events = graft.sources.Tables.events(spark, dir)
    val got = Detectors.rateAlerts(events, rule).collect()
    val want = withoutRule(Detectors.rateAlerts(events, rule).collect())
    assert(got.nonEmpty)
    assert(got.map(_.toString).sorted.toSeq == want.map(_.toString).sorted.toSeq)
  }

  test("equivalence on adversarial in-memory data: boundaries, ties, nulls") {
    // w=60 -> s=3840; cluster timestamps around slice boundaries so home,
    // context-band, and cross-boundary frames all occur, with RANGE-peer
    // ties and null-ts rows (null ts groups as its own RANGE peer set)
    val w = 60
    val s = RateWindowRewrite.sliceSecondsFor(w) // 3840
    val rnd = new scala.util.Random(20260813L)
    val rows = Seq.tabulate(4000) { i =>
      val base = (rnd.nextInt(5) + 1).toLong * s
      val ts: java.lang.Long = rnd.nextInt(20) match {
        case 0 => null // null ts: RANGE peers with the other nulls only
        case k if k < 8 => base + rnd.nextInt(2 * w + 2) - w - 1 // boundary band
        case _ => base + rnd.nextInt(s.toInt).toLong
      }
      (i.toLong,
        if (ts == null) null else new Timestamp(ts * 1000L),
        (i % 7).toLong, "evt", 1.0, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(11)
    val r = RateRule("r", "user_id", w, 3.0)
    val got = Detectors.rateAlerts(df, r).collect()
    val want = withoutRule(Detectors.rateAlerts(df, r).collect())
    assert(got.nonEmpty)
    assert(got.map(_.toString).sorted.toSeq == want.map(_.toString).sorted.toSeq)
  }

  test("declines when the window carries another aggregate") {
    val df = Seq((1L, 10L), (1L, 20L)).toDF("k", "ts")
    val w = Window.partitionBy("k").orderBy("ts").rangeBetween(-60, 0)
    val twoAggs = df
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sm", sum("ts").over(w))
      .filter(col("cnt") > 1)
    assert(slicedWindows(twoAggs).isEmpty && generates(twoAggs).isEmpty)
    // a non-count aggregate alone declines too
    val sumOnly = df.withColumn("sm", sum("ts").over(w)).filter(col("sm") > 1)
    assert(slicedWindows(sumOnly).isEmpty && generates(sumOnly).isEmpty)
    // ROWS frame (not RANGE) declines
    val rows = df.withColumn("cnt",
        count(lit(1)).over(Window.partitionBy("k").orderBy("ts").rowsBetween(-60, 0)))
      .filter(col("cnt") > 1)
    assert(slicedWindows(rows).isEmpty && generates(rows).isEmpty)
  }

  test("declines on the hand-sliced plan (no double slicing)") {
    val events = graft.sources.Tables.events(spark, dir)
    val hand = Detectors.rateAlertsSliced(events, rule)
    // the hand-written plan's own (key, __graft_slice) window is the only
    // one, and the rule added no Generate on top of its union
    assert(slicedWindows(hand).size == 1)
    assert(generates(hand).isEmpty)
  }

  test("hand-sliced and auto-sliced agree (same oracle contract)") {
    val events = graft.sources.Tables.events(spark, dir)
    val auto = Detectors.rateAlerts(events, rule).collect()
    val hand = Detectors.rateAlertsSliced(events, rule).collect()
    assert(auto.map(_.toString).sorted.toSeq == hand.map(_.toString).sorted.toSeq)
  }
}
