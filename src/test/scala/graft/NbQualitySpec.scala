package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Held-out behavior of the trained quality classifier: the student must
  * (a) cover exactly the held-out population, (b) actually learn the
  * teacher's direction — the share of `hi` predictions in the lowest
  * heuristic band strictly below the highest populated band — and
  * (c) beat the majority-class baseline on held-out accuracy (the
  * fixture's teacher signal is learnable from unigrams; a student that
  * collapses to one class fails here). */
class NbQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("confusion covers the held-out docs; both classes predicted; beats majority") {
    val conf = TextAnalysis.nbQualityClassify(spark, dir).collect()
    val total = conf.map(_.getAs[Long]("n")).sum
    // held-out population: docs with >= 1 token and doc_id % 4 == 0
    val heldOut = TextAnalysis.textStats(spark, dir)
      .filter(col("doc_id") % TextAnalysis.nbTestMod === 0L).count()
    assert(total == heldOut)
    val preds = conf.map(_.getAs[String]("pred_label")).distinct.sorted
    assert(preds.toSeq == Seq("hi", "lo"),
      s"degenerate student: predicted classes $preds")
    val correct = conf.filter(r =>
      r.getAs[String]("label") == r.getAs[String]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    val majority = conf.groupBy(_.getAs[String]("label"))
      .map(_._2.map(_.getAs[Long]("n")).sum).max
    assert(correct > majority,
      s"student accuracy $correct/$total does not beat majority $majority")
  }

  test("calibration: hi-share rises from the lowest to the highest band") {
    val cal = TextAnalysis.nbQualityCalibration(spark, dir)
      .orderBy("band").collect()
    assert(cal.length >= 2, "need at least two populated bands")
    assert(cal.map(_.getAs[Long]("n_docs")).sum > 0)
    val lo = cal.head.getAs[Long]("share_hi_fp")
    val hi = cal.last.getAs[Long]("share_hi_fp")
    assert(lo < hi,
      s"calibration direction inverted: lowest band share $lo >= highest $hi")
    // bands are the teacher score bands: every band the teacher would
    // label lo sits below the threshold band index
    assert(cal.forall(r => r.getAs[Long]("band") >= 0 &&
      r.getAs[Long]("band") <= 9))
  }
}
