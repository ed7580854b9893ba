package graft

import graft.operators.Corpus

/** Pins the property [[Corpus.shardPlan]] exists for — token-mass balance
  * across shards — plus conservation (nothing dropped/duplicated by the
  * rank → snake → agg pipeline) and the doc-count invariant of a
  * serpentine deal (shard sizes differ by at most one row).
  */
class ShardPlanSpec extends SparkSpec {

  private lazy val plan =
    Corpus.shardPlan(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)

  test("all shards present, doc counts within one of each other") {
    assert(plan.map(_._1).toSeq == (0L until 8L))
    val counts = plan.map(_._2)
    assert(counts.max - counts.min <= 1,
      s"serpentine deal must spread docs evenly, got ${counts.toSeq}")
  }

  test("token mass is balanced: max/min shard ratio under 1.05") {
    val masses = plan.map(_._3.toDouble)
    val ratio = masses.max / masses.min
    assert(ratio < 1.05,
      s"snake assignment over size-sorted docs should balance token mass " +
        s"to within a block spread, got ratio $ratio (${masses.toSeq})")
  }

  test("conservation: shard sums equal corpus totals; shares sum to ~1e6") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(count(lit(1)).cast("long"),
        sum(size(graft.operators.Dedup.tokens(col("text"))).cast("long")))
      .head()
    assert(plan.map(_._2).sum == docs.getLong(0))
    assert(plan.map(_._3).sum == docs.getLong(1))
    val shareSum = plan.map(_._5).sum
    // floor per shard: total in (1e6 - 8, 1e6]
    assert(shareSum > 1000000L - 8 && shareSum <= 1000000L, s"got $shareSum")
  }

  test("max_doc_tokens: the largest doc lands where rank 0 points (shard 0)") {
    val globalMax = plan.map(_._4).max
    assert(plan.find(_._1 == 0L).get._4 == globalMax)
  }
}
