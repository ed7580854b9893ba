package graft

import graft.operators.Similarity

/** Pins for [[Similarity.decontaminateSemantic]]: the flagged set must lie
  * strictly on the corpus side, match only eval-side vectors, respect the
  * radius, and report exactly one best match per contaminated vector —
  * with that best match verified against an independent exact recompute
  * of the vector's full eval-similarity profile.
  */
class SemanticDecontSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val hits =
    Similarity.decontaminateSemantic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("nonempty; corpus/eval sides and radius are respected") {
    assert(hits.nonEmpty)
    hits.foreach { case (vecId, evalId, simR) =>
      assert(vecId % Similarity.semDecontMod != 0L, s"$vecId is eval-side")
      assert(evalId % Similarity.semDecontMod == 0L, s"$evalId not eval-side")
      assert(simR >= Similarity.semDecontThreshold)
    }
  }

  test("one row per contaminated vector") {
    assert(hits.map(_._1).distinct.length == hits.length)
  }

  test("reported match is the exact argmax over the whole eval set") {
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosR(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    val evalIds = all.keys.filter(_ % Similarity.semDecontMod == 0L).toSeq.sorted
    hits.foreach { case (vecId, evalId, simR) =>
      val (bestSim, bestEval) = evalIds.map(e => (cosR(all(vecId), all(e)), e))
        .maxBy { case (s, e) => (s, -e) }
      assert(bestSim == simR && bestEval == evalId,
        s"vec $vecId: reported ($evalId, $simR) vs exact ($bestEval, $bestSim)")
    }
  }
}
