package graft

import graft.operators.{Corpus, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins [[Corpus.curationFunnel]]'s first-failing-stage semantics against
  * the gates it summarizes: every document lands in exactly one stage,
  * each stage's population matches an independent recompute from the
  * underlying gate outputs, and the funnel's counts are the aggregate of
  * the per-doc assignment.
  */
class CurationFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val stages =
    Corpus.curationStages(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val docs = graft.sources.Tables.documents(spark, dir)

  test("every document gets exactly one stage") {
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stages.keySet == ids)
  }

  test("stage populations match independent gate recomputes, in order") {
    val evalSet = stages.keySet.filter(_ % 47L == 3L)
    val dupSet = Corpus.dedupClusters(spark, dir)
      .filter(!col("is_keeper")).collect().map(_.getLong(0)).toSet
    val lowQ = TextAnalysis.textStatsOf(docs)
      .filter(col("quality_score") < 0.2)
      .collect().map(_.getLong(0)).toSet
    val contaminated = Corpus.decontaminate(spark, dir)
      .collect().map(_.getLong(0)).toSet

    stages.foreach { case (id, st) =>
      val expected =
        if (evalSet(id)) 0L
        else if (dupSet(id)) 1L
        else if (lowQ(id)) 2L
        else if (contaminated(id)) 3L
        else 4L
      assert(st == expected, s"doc $id: funnel stage $st, gates say $expected")
    }
  }

  test("funnel rows aggregate the per-doc assignment; shares sum to ~1e6") {
    val funnel = Corpus.curationFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byStage = stages.groupBy(_._2).map { case (s, m) => s -> m.size.toLong }
    assert(funnel.map(r => r._1 -> r._3).toMap == byStage)
    val shareSum = funnel.map(_._4).sum
    assert(shareSum > 1000000L - funnel.length && shareSum <= 1000000L)
  }
}
