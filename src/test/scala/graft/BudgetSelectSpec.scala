package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Pins [[Corpus.qualityBudgetSelect]]: the selection must be a PREFIX of
  * the quality ordering (no unselected doc outranks a selected one), the
  * distributed prefix-sum must equal a sequential recompute, and the
  * budget spill rule must hold (strictly under budget before the last
  * doc, crossed at or after it).
  */
class BudgetSelectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val sel =
    Corpus.qualityBudgetSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (id, q, _, _) => (-q, id) }

  private lazy val all = graft.operators.TextAnalysis
    .textStatsOf(graft.sources.Tables.documents(spark, dir))
    .select(col("doc_id"), col("quality_score"), col("n_tokens"))
    .collect()
    .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    .sortBy { case (id, q, _) => (-q, id) }

  test("selection is the exact rank-order prefix with exact running sums") {
    assert(sel.nonEmpty && sel.length < all.length,
      "budget must bisect the fixture corpus")
    // same docs, same order, as the sequential prefix
    val prefix = all.take(sel.length)
    assert(sel.map(_._1).toSeq == prefix.map(_._1).toSeq)
    // distributed prefix-sum equals sequential cumulative sum
    var acc = 0L
    sel.zip(prefix).foreach { case ((_, _, nTok, cum), (_, _, n2)) =>
      assert(nTok == n2)
      acc += nTok
      assert(cum == acc, s"cum_tokens $cum != sequential $acc")
    }
  }

  test("budget spill rule: under budget before the last doc, crossed after") {
    val budget = Corpus.selectBudgetTokens
    val lastCum = sel.last._4
    val beforeLast = lastCum - sel.last._3
    assert(beforeLast < budget, s"last doc must START under budget")
    assert(lastCum >= budget || sel.length == all.length,
      "selection stopped before the budget was spent")
  }
}
