package graft

import graft.operators.Corpus

/** Pins [[Corpus.lengthMatchSample]] against a sequential recompute of
  * the whole rejection-sampling pipeline (buckets, fixed-point
  * acceptance, salted-hash draws), plus the normalization property: the
  * max-ratio bucket keeps every document.
  */
class LengthMatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def draw(docId: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"lmatch:$docId".getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  private lazy val docs = graft.sources.Tables.documents(spark, dir)
    .select("doc_id", "n_chars").collect()
    .map(r => (r.getLong(0), r.getLong(1)))

  test("report matches the sequential rejection-sampling recompute") {
    val bucketed = docs.map { case (id, nc) =>
      (id, nc / Corpus.lmsBucketChars, id % 47 == 3)
    }
    val target = bucketed.filter(_._3).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val source = bucketed.filterNot(_._3).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (tTot, sTot) = (target.values.sum, source.values.sum)
    val aFp = source.map { case (b, sb) =>
      b -> target.getOrElse(b, 0L) * sTot * 1000000L / (sb * tTot)
    }
    val mFp = aFp.values.max
    val kept = bucketed.filterNot(_._3)
      .filter { case (id, b, _) => draw(id) * mFp < aFp(b) * 1000000L }
    val keptB = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val kTot = keptB.values.sum
    val expected = source.keys.map { b =>
      b -> ((source(b), target.getOrElse(b, 0L), keptB.getOrElse(b, 0L), aFp(b),
        target.getOrElse(b, 0L) * 1000000L / tTot,
        if (kTot > 0) keptB.getOrElse(b, 0L) * 1000000L / kTot else 0L))
    }.toMap
    val got = Corpus.lengthMatchSample(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (b, v) => assert(v == expected(b), s"bucket $b") }
    assert(kTot > 0 && kTot < sTot, "gate must actually thin the corpus")
  }

  test("the max-ratio bucket keeps every source document") {
    val got = Corpus.lengthMatchSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val mFp = got.map(_._4).max
    val full = got.filter(_._4 == mFp)
    assert(full.nonEmpty)
    full.foreach { case (b, sB, nKept, _) =>
      assert(nKept == sB, s"bucket $b: acceptance 1 must keep all $sB docs")
    }
  }
}
