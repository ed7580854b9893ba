package graft

import graft.operators.Corpus

/** Behavioral pins for DSIR selection (the oracle gate proves engine
  * agreement; this proves the SIGNAL): the target-language slice must be
  * preferentially selected, and the integer-bit log-weight must bracket
  * what a float computation of Σ count·log2(p_b/q_b) would give. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("dsir_select prefers the target slice and splits the corpus nontrivially") {
    val rows = Corpus.dsirSelect(spark, "/root/testdata/sf0.01")
      .select("lang", "n_tokens", "logw_bits", "bits_per_token", "mean_ratio", "selected")
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val nSel = rows.count(_._6)
    assert(nSel > 0 && nSel < rows.length, "selection must split the corpus")
    val rate = rows.groupBy(_._1).map { case (l, rs) =>
      (l, rs.count(_._6).toDouble / rs.length)
    }
    // the en slice IS the target distribution — it must be the most
    // selected language (DSIR's whole point)
    val (top, _) = rate.maxBy(_._2)
    assert(top == "en", s"target lang not preferred: $rate")
    rate.filterNot(_._1 == "en").foreach { case (l, r) =>
      assert(rate("en") > r, s"en rate ${rate("en")} not above $l rate $r")
    }
    // per-doc: the integer surprisal difference is within ±1 bit per
    // token of any true log2 weight, so bits_per_token stays in (-2, 2)
    // on a corpus whose per-bucket |log2(p/q)| < 1
    rows.foreach { case (_, n, bits, bpt, mr, _) =>
      assert(n > 0 && bpt == bits.toDouble / n)
      assert(math.abs(bpt) < 2.0, s"bits_per_token $bpt out of bracket")
      assert(mr > 0.0 && mr < 2.0)
    }
  }
}
