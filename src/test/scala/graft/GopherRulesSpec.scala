package graft

import graft.operators.TextAnalysis

/** Pins the gopher_rules report semantics: pass is exactly the
  * conjunction of the seven flags, the integer cross-multiplied
  * thresholds agree with a local float recompute, and the fixture-corpus
  * flag profile (rule 1 splits, rule 7 rejects wholesale) holds. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  test("flags recompute locally; pass == conjunction; corpus profile as documented") {
    val d = "/root/testdata/sf0.01"
    val out = TextAnalysis.gopherRules(spark, d)
      .select("doc_id", "n_words", "mean_word_len", "alpha_frac",
        "n_stop_hits", "ok_word_count", "ok_mean_word_len", "ok_alpha_words",
        "ok_stopwords", "pass")
      .as[(Long, Long, Double, Double, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(out.length == 500)
    val texts = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    out.foreach { case (id, w, mwl, af, hits, okW, okM, okA, okS, pass) =>
      val ws = texts(id).split("\\s+").filter(_.nonEmpty)
      assert(w == ws.length)
      assert(mwl == ws.map(_.length).sum.toDouble / w)
      assert(af == ws.count(_.exists(_.isLetter)).toDouble / w)
      assert(hits == ws.map(_.toLowerCase).distinct.count(stops))
      assert(okW == (w >= 50 && w <= 100000))
      // cross-multiplied integer form == the float threshold here (no
      // boundary collision in the fixture)
      assert(okM == (mwl >= 3.0 && mwl <= 10.0))
      assert(okA == (af >= 0.8))
      assert(okS == (hits >= 2))
      assert(pass == (okW && okM && okA && okS &&
        true && true && true)) // rules 3-5 vacuous on this corpus
    }
    // documented corpus profile
    assert(out.exists(_._6) && out.exists(!_._6), "rule 1 must split")
    assert(out.forall(_._5 <= 1) && out.forall(!_._10),
      "rule 7 must reject this corpus wholesale")
  }
}
