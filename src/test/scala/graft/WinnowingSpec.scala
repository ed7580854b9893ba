package graft

import graft.operators.TextAnalysis

/** Pins [[TextAnalysis.winnowingFingerprint]] against an independent
  * sequential winnow over the same fixture texts: identical selected
  * (fp, pos) sets per document, the MOSS coverage guarantee (every
  * window of w consecutive grams contains a selection), and the
  * rightmost-tie decode round-trip.
  */
class WinnowingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (k, w) = (TextAnalysis.winnowK, TextAnalysis.winnowW)

  private def h40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
      ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** Plain-loop reference: grams, keys, per-window argmin with explicit
    * rightmost tie-break (compare hash first, then position) — no key
    * encoding, so it cross-checks the operator's integer packing. */
  private def reference(text: String): Set[(Long, Long)] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val n = toks.length - k + 1
    if (n < 1) return Set.empty
    val hs = Array.tabulate(n)(i => h40(toks.slice(i, i + k).mkString(" ")))
    val sel = scala.collection.mutable.Set[(Long, Long)]()
    for (p <- 0 until math.max(1, n - w + 1)) {
      var best = p
      for (q <- p + 1 until math.min(p + w, n))
        if (hs(q) < hs(best) || (hs(q) == hs(best) && q > best)) best = q
      sel += ((hs(best), best + 1L)) // 1-indexed pos
    }
    sel.toSet
  }

  private lazy val docs = graft.sources.Tables.documents(spark, dir)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val got = TextAnalysis.winnowingFingerprint(spark, dir)
    .collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }

  test("selected fingerprints match the sequential reference exactly") {
    val ref = docs.map { case (id, t) => id -> reference(t) }
      .filter(_._2.nonEmpty)
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, s) =>
      assert(s == ref(id), s"doc $id: winnow sets diverge")
    }
    assert(got.nonEmpty && got.values.map(_.size).sum > got.size,
      "fixture must exercise multi-selection docs")
  }

  test("MOSS coverage guarantee: every w-window holds a selection") {
    docs.foreach { case (id, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val n = toks.length - k + 1
      if (n >= 1) {
        val pos = got(id).map(_._2)
        for (p <- 1 to math.max(1, n - w + 1))
          assert(pos.exists(x => x >= p && x < p + w),
            s"doc $id: window starting at gram $p has no fingerprint")
      }
    }
  }

  test("copy pairs match a reference inverted-index pairing") {
    val maxDf = TextAnalysis.winnowMaxDf
    val fps = docs.map { case (id, t) => id -> reference(t).map(_._1) }
      .filter(_._2.nonEmpty)
    val df = fps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.size }
    val kept = fps.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
    val expected = (for {
      (d1, s1) <- kept; (d2, s2) <- kept if d1 < d2
      common = (s1 & s2).size if common >= TextAnalysis.winnowMinShared
    } yield (d1, d2) -> ((common.toLong,
      common.toDouble / math.min(s1.size, s2.size)))).toMap
    val gotPairs = TextAnalysis.winnowCopyPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(gotPairs == expected)
    assert(gotPairs.nonEmpty, "fixture must produce copy pairs")
    gotPairs.values.foreach { case (_, cover) =>
      assert(cover > 0.0 && cover <= 1.0)
    }
  }

  test("incremental: batch-vs-base pairs match reference, no base self-pairs") {
    val maxDf = TextAnalysis.winnowMaxDf
    val fps = docs.map { case (id, t) => id -> reference(t).map(_._1) }
      .filter(_._2.nonEmpty)
    val (batch, base) = fps.partition(_._1 % 10 == 7)
    val df = base.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.size }
    def kept(m: Map[Long, Set[Long]]) =
      m.map { case (id, s) => id -> s.filter(df.getOrElse(_, 0) <= maxDf) }
    val (kb, kB) = (kept(batch), kept(base))
    val expected = (for {
      (d1, s1) <- kb; (d2, s2) <- kB
      common = (s1 & s2).size if common >= TextAnalysis.winnowMinShared
    } yield (d1, d2) -> ((common.toLong, common.toDouble / s1.size))).toMap
    val got = TextAnalysis.winnowIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce incremental matches")
    got.keys.foreach { case (b, s) =>
      assert(b % 10 == 7 && s % 10 != 7, "sides swapped or base self-paired")
    }
  }

  test("density: selections are a strict subset on long docs") {
    val long = docs.filter(_._2.split("[^a-zA-Z0-9]+").count(_.nonEmpty) > 50)
    assert(long.nonEmpty)
    long.foreach { case (id, t) =>
      val n = t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty) - k + 1
      assert(got(id).size < n, s"doc $id: winnowing selected every gram")
    }
  }
}
