package graft

import graft.operators.TextAnalysis

/** Pins [[TextAnalysis.knPerplexity]] against a from-scratch sequential
  * Kneser-Ney recompute (BigInt rationals), plus the distributional
  * sanity properties: num <= den for every observed bigram (P <= 1) and
  * per-context probability mass over observed continuations <= 1.
  */
class KnPerplexitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docToks: Map[Long, Array[String]] =
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .toMap

  // corpus-level counts, computed independently of the operator
  private lazy val (c12, c1, n1, n2, bt) = {
    val bigrams = docToks.values.toSeq.flatMap(t => t.zip(t.drop(1)))
    val c12m = bigrams.groupBy(identity).map { case (bg, xs) => bg -> xs.size.toLong }
    val c1m = c12m.groupBy(_._1._1).map { case (w, xs) => w -> xs.values.sum }
    val n1m = c12m.groupBy(_._1._1).map { case (w, xs) => w -> xs.size.toLong }
    val n2m = c12m.groupBy(_._1._2).map { case (w, xs) => w -> xs.size.toLong }
    (c12m, c1m, n1m, n2m, c12m.size.toLong)
  }

  private def numDen(bg: (String, String)): (Long, Long) = {
    val num = math.max(4L * c12(bg) - 3L, 0L) * bt + 3L * n1(bg._1) * n2(bg._2)
    (num, 4L * c1(bg._1) * bt)
  }

  test("doc-level aggregates match the sequential KN recompute exactly") {
    val got = TextAnalysis.knPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val expected = docToks.filter(_._2.length >= 2).map { case (id, t) =>
      val bgs = t.zip(t.drop(1))
      var bits = 0L; var spfp = 0L
      bgs.foreach { bg =>
        val (num, den) = numDen(bg)
        // ceil(log2(den/num)) via the shift trick the operator uses
        val sft = java.lang.Long.toBinaryString(den).length -
          java.lang.Long.toBinaryString(num).length
        bits += (if (num > ((den - 1) >> sft)) sft else sft + 1)
        spfp += math.floor(num.toDouble / den.toDouble * 1e9 + 0.5).toLong
      }
      val n = bgs.length.toLong
      id -> ((n, bits, bits.toDouble / n, spfp.toDouble / n / 1e9))
    }
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (n, tb, bpb, mp)) =>
      val (en, etb, ebpb, emp) = expected(id)
      assert(n == en && tb == etb, s"doc $id: counts/bits diverge")
      assert(bpb == ebpb && mp == emp, s"doc $id: derived doubles diverge")
    }
    assert(got.nonEmpty)
  }

  test("P <= 1 per bigram and observed-continuation mass <= 1 per context") {
    c12.keys.foreach { bg =>
      val (num, den) = numDen(bg)
      assert(num >= 1L && num <= den, s"bigram $bg: p outside (0, 1]")
    }
    c12.keys.groupBy(_._1).foreach { case (w1v, bgs) =>
      val den = BigInt(4L * c1(w1v)) * BigInt(bt)
      val mass = bgs.map(bg => BigInt(numDen(bg)._1)).sum
      assert(mass <= den, s"context $w1v: observed mass exceeds 1")
    }
  }

  test("KN discounts relative to add-smoothing on repeated bigrams") {
    // a bigram seen once in a high-continuation context must get nonzero
    // probability purely from the continuation term (the KN signature)
    val singles = c12.filter(_._2 == 1L).keys.take(20)
    assert(singles.nonEmpty)
    singles.foreach { bg =>
      val (num, _) = numDen(bg)
      // c12=1 leaves exactly 4*1-3 = 1 discounted count: the residual
      // bt plus the full continuation term, nothing else
      assert(num == bt + 3L * n1(bg._1) * n2(bg._2),
        s"bigram $bg: discount residual wrong")
    }
  }
}
