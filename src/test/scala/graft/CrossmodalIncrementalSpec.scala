package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Pins the union-find merge (VERDICT r13 #4): closing new edges against
  * PERSISTED base components equals re-closing the whole graph —
  * merge(clusters(base), newEdges) == clusters(base UNION batch) — on
  * seeded random graphs (many merge topologies: chains of base clusters
  * bridged by batch docs, pure-batch components, untouched singletons),
  * and the registered query equals the full crossmodal closure on the
  * fixture. */
class CrossmodalIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Reference closure: plain union-find over the collected edges. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum representative
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("merge(clusters(base), batch-incident edges) == clusters(all) on random graphs") {
    val rnd = new scala.util.Random(2026)
    (1 to 8).foreach { trial =>
      val n = 40 + rnd.nextInt(60)
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val inBatch = (d: Long) => d % 5L == 2L
      val baseEdges = edges.filter(e => !inBatch(e._1) && !inBatch(e._2))
      val newEdges = edges.filter(e => inBatch(e._1) || inBatch(e._2))
      // persisted base labels: closure of the base-only edge subset
      val baseDocs = (0L until n.toLong).filterNot(inBatch)
      val baseCl = ufComponents(n, baseEdges)
      val baseLabels = baseDocs.map(d => (d, baseCl(d))).toDF("doc_id", "cluster_id")
      val gotRows = Corpus.crossmodalMerge(baseLabels,
          newEdges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toSeq
      // exactly one label row per doc — a duplicate/conflicting-label
      // regression must fail here, not vanish into the Map collapse
      assert(gotRows.map(_._1).distinct.size == gotRows.size,
        s"trial $trial: duplicate doc_id labels in ${gotRows.sorted}")
      val got = gotRows.toMap
      // expected: full closure, restricted to base docs + touched batch docs
      val full = ufComponents(n, edges)
      val touched = newEdges.flatMap(e => Seq(e._1, e._2)).toSet
      val expect = (baseDocs ++ touched.filter(inBatch)).toSet
        .map((d: Long) => d -> full(d)).toMap
      assert(got == expect, s"trial $trial (n=$n, edges=$edges)")
    }
  }

  test("registered incremental query == full crossmodal closure on the fixture") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "cluster_id", "is_keeper", "cluster_size")
      .as[(Long, Long, Boolean, Long)].collect().sorted.toSeq
    val incr = rows(Corpus.crossmodalIncremental(spark, dir))
    val full = rows(Corpus.crossmodalClusters(spark, dir))
    assert(incr.nonEmpty && incr == full)
    // the split is non-trivial: some merged cluster spans base AND batch
    assert(incr.exists { case (doc, cl, _, _) =>
      doc % 10L == 1L && cl % 10L != 1L })
  }
}
