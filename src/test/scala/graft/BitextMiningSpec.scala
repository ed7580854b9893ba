package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins for [[Similarity.bitextMining]]: sides must come from the label
  * parity split, at most one candidate per source, and the margin must be
  * the ratio the Artetxe-Schwenk criterion defines — verified by an
  * independent exact recompute of both neighborhoods for every emitted
  * pair.
  */
class BitextMiningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val mined =
    Similarity.bitextMining(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val vecs = graft.sources.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  test("nonempty; sides respect the parity split; one candidate per src") {
    assert(mined.nonEmpty)
    val labelOf = vecs.map(t => t._1 -> t._2).toMap
    mined.foreach { case (src, dst, _, marginFp) =>
      assert(labelOf(src) % 2 == 0 && labelOf(dst) % 2 == 1)
      assert(marginFp >= Similarity.bitextMarginFp)
    }
    assert(mined.map(_._1).distinct.length == mined.length)
  }

  test("margin matches an exact recompute of both kNN neighborhoods") {
    def cosFp(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
    }
    val aSide = vecs.filter(_._2 % 2 == 0)
    val bSide = vecs.filter(_._2 % 2 == 1)
    val k = Similarity.bitextK
    mined.foreach { case (src, dst, cosFpOut, marginFp) =>
      val sv = aSide.find(_._1 == src).get._3
      val dv = bSide.find(_._1 == dst).get._3
      assert(cosFp(sv, dv) == cosFpOut)
      val sa = bSide.map(t => (cosFp(sv, t._3), t._1))
        .sortBy { case (c, id) => (-c, id) }.take(k).map(_._1).sum
      val sb = aSide.map(t => (cosFp(t._3, dv), t._1))
        .sortBy { case (c, id) => (-c, id) }.take(k).map(_._1).sum
      assert(marginFp == cosFpOut * 2 * k * 1000000L / (sa + sb),
        s"pair ($src,$dst): margin $marginFp vs recompute with sa=$sa sb=$sb")
    }
  }

  test("hubness cancellation: margin ranking differs from raw-cosine ranking") {
    // if margin were a monotone function of cosine, the criterion would
    // add nothing over raw top-1 cosine; the fixture must exercise the
    // renormalization (some emitted pair is NOT its source's raw argmax,
    // or some source's raw argmax pair is absent)
    def cosFp(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
    }
    val aSide = vecs.filter(_._2 % 2 == 0)
    val bSide = vecs.filter(_._2 % 2 == 1)
    val rawArgmax = aSide.map { case (id, _, v) =>
      id -> bSide.map(t => (cosFp(v, t._3), t._1))
        .maxBy { case (c, i) => (c, -i) }._2
    }.toMap
    val divergent = mined.count { case (src, dst, _, _) => rawArgmax(src) != dst }
    assert(divergent > 0,
      "every mined pair equals the raw-cosine argmax — margin criterion " +
        "not exercised by the fixture")
  }
}
