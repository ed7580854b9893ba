package graft

import graft.operators.{Corpus, TextAnalysis}

/** Pins [[TextAnalysis.blocklistFilter]] (sequential bigram recount, both
  * present and impossible phrases) and [[Corpus.corpusManifest]]
  * (sequential XOR checksum recompute + single-change detection).
  */
class PolicyManifestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = graft.sources.Tables.documents(spark, dir)
    .select("doc_id", "text", "lang", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4)))

  test("blocklist: exact occurrence counts, phrase lists, and verdicts") {
    val bl = TextAnalysis.blocklist.toSet
    val expected = docs.map { case (id, text, _, _, _) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val phs = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
        .filter(bl.contains)
      id -> ((phs.length.toLong, phs.distinct.sorted.mkString(",")))
    }.toMap
    val got = TextAnalysis.blocklistFilter(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == expected.keySet, "every document must be reported")
    got.foreach { case (id, (n, phrases, blocked)) =>
      val (en, ep) = expected(id)
      assert(n == en && phrases == ep, s"doc $id")
      assert(blocked == (n > 0))
    }
    val blockedPhrases = got.values.flatMap(_._2.split(",")).filter(_.nonEmpty).toSet
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "fixture must exercise both verdicts")
    assert(blockedPhrases.nonEmpty &&
      !blockedPhrases.exists(Set("forbidden phrase", "data exfiltration")),
      "impossible phrases must never match")
  }

  private def fp60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("manifest: exact per-partition counts and XOR checksums") {
    val expected = docs.groupBy(d => (d._3, d._4)).map { case (k, ds) =>
      k -> ((ds.length.toLong, ds.map(_._5).sum,
        ds.map(_._1).min, ds.map(_._1).max,
        ds.map(d => fp60(d._2)).reduce(_ ^ _)))
    }
    val got = Corpus.corpusManifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"partition $k") }
    // single-change detection: flipping any one doc's text flips its xor
    val (lang, src) = got.keySet.head
    val ds = docs.filter(d => d._3 == lang && d._4 == src)
    val mutated = ds.map(d =>
      if (d._1 == ds.head._1) fp60(d._2 + "!") else fp60(d._2)).reduce(_ ^ _)
    assert(mutated != got((lang, src))._5)
  }
}
