package graft

import graft.operators.TextAnalysis

/** Pins the lm_perplexity integer-surprisal substitution: the shift
  * formula must equal the MATHEMATICAL ceil(−log2 p) for every bigram
  * type in the corpus, and per-document totals must bracket the float
  * bigram-LM logprob (each occurrence rounds up by < 1 bit). The oracle
  * gate proves Spark == DuckDB; this proves both == the math. */
class LmPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tok(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("shift-formula surprisal == ceil(-log2 p) for every bigram type; doc totals bracket the float LM") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val bigrams = docs.map { case (id, t) =>
      val w = tok(t); (id, w.dropRight(1).zip(w.drop(1)))
    }.filter(_._2.nonEmpty)
    val all = bigrams.flatMap(_._2)
    val c12 = all.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val c1 = all.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val v = all.map(_._2).distinct.length.toLong

    def bitsOf(num: Long, den: Long): Long = {
      val s = java.lang.Long.toBinaryString(den).length -
        java.lang.Long.toBinaryString(num).length
      if (num > ((den - 1) >> s)) s.toLong else s.toLong + 1
    }
    // every bigram TYPE: integer formula == mathematical ceil(-log2 p),
    // with the exact power-of-two boundary resolved in integer space
    c12.foreach { case ((w1, w2), c) =>
      val (num, den) = (2 * c + 1, 2 * c1(w1) + v)
      val got = bitsOf(num, den)
      val exactPow2 = {
        val s = java.lang.Long.toBinaryString(den).length -
          java.lang.Long.toBinaryString(num).length
        (num << s) == den
      }
      val math0 = -math.log(num.toDouble / den.toDouble) / math.log(2.0)
      val want = if (exactPow2) math.round(math0) else math.ceil(math0).toLong
      assert(got == want, s"($w1,$w2): num=$num den=$den got=$got want=$want")
    }

    val out = TextAnalysis.lmPerplexity(spark, dir)
      .select("doc_id", "n_bigrams", "total_bits", "mean_p")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.nonEmpty && out.size == bigrams.length)
    bigrams.foreach { case (id, bs) =>
      val (_, n, bits, meanP) = out(id)
      assert(n == bs.length)
      // float total of -log2 p; ceil per occurrence => bits in [f, f + n)
      val f = bs.map { case (w1, w2) =>
        val (num, den) = (2 * c12((w1, w2)) + 1, 2 * c1(w1) + v)
        -math.log(num.toDouble / den.toDouble) / math.log(2.0)
      }.sum
      assert(bits >= f - 1e-6 && bits < f + n + 1e-6,
        s"doc $id: total_bits=$bits float=$f n=$n")
      assert(meanP > 0.0 && meanP < 1.0)
    }
  }
}
