package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Structural pins for [[TextAnalysis.nbLangClassify]]: the confusion
  * matrix must conserve the held-out population, its share arithmetic must
  * be internally consistent, and — because the fixture draws every
  * language's text from the same vocabulary — the trained posterior must
  * collapse toward the class PRIOR's argmax (the correct Bayes behavior
  * on label-independent text; a bug that ignored the prior, or double-
  * counted likelihoods, would break this).
  */
class NbLangClassifySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val cells =
    TextAnalysis.nbLangClassify(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private lazy val docs = graft.sources.Tables.documents(spark, dir)

  test("conserves the held-out population per true language") {
    val heldOut = docs.filter(col("doc_id") % TextAnalysis.nbTestMod === 0L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byTrue = cells.groupBy(_._1).map { case (l, cs) => l -> cs.map(_._3).sum }
    assert(byTrue == heldOut)
    // n_true repeats the per-true-language total on every cell
    cells.foreach { case (l, _, _, nTrue, _) => assert(nTrue == heldOut(l)) }
  }

  test("share_fp is exactly n*1e6 div n_true") {
    cells.foreach { case (_, _, n, nTrue, shareFp) =>
      assert(shareFp == n * 1000000L / nTrue)
    }
  }

  test("prior collapse: modal prediction is the majority training language") {
    val majority = docs.filter(col("doc_id") % TextAnalysis.nbTestMod =!= 0L)
      .groupBy("lang").count().collect()
      .maxBy(r => (r.getLong(1), r.getString(0))).getString(0)
    val modalPred = cells.groupBy(_._2).map { case (p, cs) => p -> cs.map(_._3).sum }
      .maxBy(_._2)._1
    assert(modalPred == majority,
      s"label-independent text must collapse toward the prior argmax " +
        s"($majority), predicted mode was $modalPred")
  }
}
