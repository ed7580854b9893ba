package graft

import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.functions._

/** Pins [[Corpus.dedupBcubed]]: the whole metric recomputed from an
  * independent union-find over the collected edge sets, plus the two
  * structural invariants — LSH candidates are exact-verified so the
  * sketch clustering REFINES the reference (B-Cubed precision exactly
  * 1.0, at least as many clusters).
  */
class BcubedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  test("metric matches an independent union-find + BigInt recompute") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ids = docs.map(_._1).toSeq
    val exact = docs.groupBy(d => d._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.sliding(2).map(p => (p(0), p(1))))
      .toSeq
    val jac = Dedup.ngramJaccard(spark, dir).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lsh = Dedup.minhashLsh(spark, dir).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val labL = unionFind(ids, exact ++ jac)
    val labC = unionFind(ids, exact ++ lsh)
    val n = ids.length.toLong
    val cells = ids.groupBy(i => (labC(i), labL(i)))
      .map { case (k, v) => k -> v.length.toLong }
    val nC = cells.groupBy(_._1._1).map { case (c, v) => c -> v.values.sum }
    val nL = cells.groupBy(_._1._2).map { case (l, v) => l -> v.values.sum }
    val sp = cells.map { case ((c, _), ncl) => ncl * ncl * 1000000000L / nC(c) }.sum
    val sr = cells.map { case ((_, l), ncl) => ncl * ncl * 1000000000L / nL(l) }.sum
    val (pFp, rFp) = (sp / n, sr / n)
    val f1 = if (pFp + rFp > 0) 2L * pFp * rFp / (pFp + rFp) else 0L

    val row = Corpus.dedupBcubed(spark, dir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == labC.values.toSet.size.toLong)
    assert(row.getLong(2) == labL.values.toSet.size.toLong)
    assert(row.getLong(3) == pFp && row.getLong(4) == rFp && row.getLong(5) == f1)
  }

  test("refinement invariants: precision exactly 1.0, clusters never coarser") {
    val row = Corpus.dedupBcubed(spark, dir).collect().head
    assert(row.getLong(3) == 1000000000L,
      "LSH candidates are exact-verified, so C must refine L")
    assert(row.getLong(1) >= row.getLong(2))
    assert(row.getLong(4) <= 1000000000L && row.getLong(4) > 0L)
  }
}
