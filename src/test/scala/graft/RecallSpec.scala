package graft

import graft.operators.{Dedup, Similarity}

/** Recall floors for the approximate family (VERDICT r5 next-round #6):
  * every approximate operator is oracle-HASH-exact by construction, so a
  * parameter change that guts recall would still pass the correctness
  * gate — these floors are what actually pins retrieval quality.
  *
  * Ground truths: brute-force cosine top-3 (`annTopkCosine`) for the ANN
  * family; verified n-gram Jaccard pairs (`ngramJaccard`) for the dedup
  * sketches. Floors sit under the values measured at sf0.01 (see
  * SCALE_NOTES "Recall of the approximate family") with slack for future
  * data regeneration, and the data is near-random embeddings — a
  * worst-case corpus for ANN (top-1 cosine ~0.38).
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    df.filter(org.apache.spark.sql.functions.col("rank") <= k)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").as[(Long, Long)].collect().toSet

  private def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    got.intersect(truth).size.toDouble / truth.size

  test("ANN family recall@3 vs brute-force cosine") {
    val bf = topk(Similarity.annTopkCosine(spark, dir), 3)
    assert(bf.nonEmpty)
    val lsh = recall(topk(Similarity.annLshTopk(spark, dir), 3), bf)
    val ivf = recall(topk(Similarity.annIvfTopk(spark, dir), 3), bf)
    val mp = recall(topk(Similarity.annIvfMultiprobe(spark, dir), 3), bf)
    info(f"recall@3 lsh=$lsh%.3f ivf=$ivf%.3f ivf_multiprobe=$mp%.3f")
    // multiprobe (hamming-1 query-side probes) measured 1.000 at sf0.01;
    // floor leaves slack for data regeneration
    assert(lsh >= 0.8, s"multi-probe sign-LSH recall@3 $lsh below floor 0.8")
    assert(ivf >= 0.15, s"IVF nprobe=1 recall@3 $ivf below floor 0.15")
    assert(mp >= 0.3, s"IVF nprobe=2 recall@3 $mp below floor 0.3")
    assert(mp >= ivf, "multi-probe must never lose recall vs nprobe=1")
  }

  test("ANN family recall@3 holds at sf0.1 (10x corpus density)") {
    // Recall degrades with corpus density (more near-ties at the top-k
    // boundary, fuller LSH buckets, coarser IVF cells relative to the
    // data); the sf0.01 floors alone would let a density regression ship.
    val d = "/root/testdata/sf0.1"
    val bf = topk(Similarity.annTopkCosine(spark, d), 3)
    assert(bf.nonEmpty)
    val lsh = recall(topk(Similarity.annLshTopk(spark, d), 3), bf)
    val ivf = recall(topk(Similarity.annIvfTopk(spark, d), 3), bf)
    val mp = recall(topk(Similarity.annIvfMultiprobe(spark, d), 3), bf)
    val pq = recall(topk(Similarity.annIvfPqTopk(spark, d), 3), bf)
    // measured: lsh 1.000, ivf 0.267, multiprobe 0.600, ivfpq 0.267 —
    // density helps IVF here (10x the vectors per cell raises the odds
    // the true top-3 live in the probed cells); floors sit under
    // measurement with slack
    info(f"sf0.1 recall@3 lsh=$lsh%.3f ivf=$ivf%.3f ivf_multiprobe=$mp%.3f ivfpq=$pq%.3f")
    assert(lsh >= 0.8, s"multi-probe sign-LSH recall@3 $lsh below sf0.1 floor 0.8")
    assert(ivf >= 0.2, s"IVF nprobe=1 recall@3 $ivf below sf0.1 floor 0.2")
    assert(mp >= 0.4, s"IVF nprobe=2 recall@3 $mp below sf0.1 floor 0.4")
    assert(mp >= ivf, "multi-probe must never lose recall vs nprobe=1")
    assert(pq >= 0.2, s"IVF-PQ recall@3 $pq below sf0.1 floor 0.2")
  }

  test("SQ8: int8-code scoring holds recall@3 vs the exact float scan") {
    // SQ8 is the lossy-STORAGE tier (not a candidate-pruning tier): the
    // scan is still exhaustive, so any recall loss is pure quantization
    // error. At 64-d max-abs int8 the cosine perturbation is ~1e-3 —
    // below nearly every inter-candidate gap even on near-random
    // embeddings — measured 0.967 at both sf0.01 and sf0.1; floor 0.9.
    for (d <- Seq(dir, "/root/testdata/sf0.1")) {
      val bf = topk(Similarity.annTopkCosine(spark, d), 3)
      val sq8 = recall(topk(Similarity.annSq8Topk(spark, d), 3), bf)
      info(f"recall@3 sq8=$sq8%.3f ($d)")
      assert(sq8 >= 0.9, s"SQ8 recall@3 $sq8 below floor 0.9 at $d")
    }
  }

  test("matryoshka audit: distortion grows monotonically as the prefix shrinks") {
    val rows = Similarity.matryoshkaAudit(spark, dir)
      .select("prefix_dim", "n_pairs", "mean_abs_delta", "max_abs_delta", "n_flips")
      .as[(Int, Long, Double, Double, Long)].collect().sortBy(-_._1)
    assert(rows.map(_._1).toSeq == Seq(32, 16))
    val Seq(h, q) = rows.toSeq
    assert(h._2 == q._2 && h._2 > 0, "same pair grid at both levels")
    // halving the kept dims again must not DECREASE any distortion stat
    assert(q._3 >= h._3 && q._4 >= h._4 && q._5 >= h._5,
      s"d/4 must distort at least as much as d/2: $rows")
    // near-random fixtures have no MRL structure: the audit must say NO
    // (substantial decision flips), not rubber-stamp truncation
    assert(h._5 > 0, "expected range-verdict flips on non-MRL embeddings")
  }

  test("IVF-PQ: compressed-store scoring holds recall vs the exact index") {
    // Two floors. (1) vs brute force: the PQ tier searches the same cells
    // as annIvfTopk, so its bf-recall ceiling IS the ivf number — pin that
    // it doesn't fall below ivf's floor. (2) ADC fidelity: within the
    // shared candidate set, the code-based ranking must mostly agree with
    // the exact full-vector rerank — this is the quantization-quality
    // floor that a codebook regression (still oracle-hash-exact) would
    // gut. Measured at sf0.01: pq_vs_bf 0.200 (== ivf), pq_vs_ivf 0.667;
    // sf0.1: 0.267 (== ivf), 0.767. Floors sit under measurement.
    val bf = topk(Similarity.annTopkCosine(spark, dir), 3)
    val ivf = topk(Similarity.annIvfTopk(spark, dir), 3)
    val pq = topk(Similarity.annIvfPqTopk(spark, dir), 3)
    assert(bf.nonEmpty && ivf.nonEmpty && pq.nonEmpty)
    val vsBf = recall(pq, bf)
    val vsIvf = recall(pq, ivf)
    info(f"ivfpq recall@3 vs_bf=$vsBf%.3f vs_exact_ivf=$vsIvf%.3f")
    assert(vsBf >= 0.15, s"IVF-PQ recall@3 vs brute force $vsBf below floor 0.15")
    assert(vsIvf >= 0.5, s"ADC agreement with exact in-cell rerank $vsIvf below floor 0.5")

    // the two-stage production path (multiprobe ADC shortlist + exact
    // re-rank of 10 rows) must recover the FULL-VECTOR multiprobe
    // index's answers almost exactly — measured 1.000 at sf0.01, 0.967
    // at sf0.1: the compressed store costs ~nothing after refinement
    val mp = topk(Similarity.annIvfMultiprobe(spark, dir), 3)
    val rr = topk(Similarity.annIvfPqRerank(spark, dir), 3)
    val rrVsMp = recall(rr, mp)
    info(f"ivfpq_rerank agreement with full-vector multiprobe=$rrVsMp%.3f")
    assert(rrVsMp >= 0.9, s"reranked PQ diverged from multiprobe: $rrVsMp")
  }

  test("filtered ANN: predicate exact, k never starved, recall vs filtered brute force") {
    import org.apache.spark.sql.functions.col
    val out = Similarity.annFilteredTopk(spark, dir)
      .select(col("q_id"), col("q_label"), col("rank"), col("cand_id"))
      .as[(Long, Int, Int, Long)].collect()
    assert(out.nonEmpty)
    // exact filtered brute-force ground truth, same rounding + tie-break
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
      .as[(Long, Array[Double], Int)].collect()
      .filter(r => math.sqrt(r._2.map(x => x * x).sum) > 0.0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0 + 0.5) / 1000000.0
    }
    val labByid = vs.map(r => r._1 -> r._3).toMap
    val truth = (for {
      q <- vs.filter(_._1 < 10)
      c <- vs.filter(c => c._1 != q._1 && c._3 == q._3)
        .map(c => (c._1, cos(q._2, c._2))).sortBy(t => (-t._2, t._1)).take(3)
    } yield (q._1, c._1)).toSet
    // (1) the predicate is EXACT: every candidate carries the query's label
    out.foreach { case (q, ql, _, cand) =>
      assert(labByid(cand) == ql, s"filter leak: q=$q label=$ql cand=$cand")
    }
    // (2) pre-filtering never starves k: a post-filtered shortlist would —
    // the unfiltered top-3 keeps <3 same-label rows for most queries here
    val perQ = out.groupBy(_._1).map(_._2.length)
    assert(perQ.forall(_ == 3), s"short result lists: ${perQ.toSeq.sorted}")
    val postFiltered = topk(Similarity.annIvfMultiprobe(spark, dir), 3)
      .filter { case (q, cand) => labByid(cand) == labByid(q) }
    assert(postFiltered.size < out.length,
      "post-filtering the unfiltered top-3 should starve k on this corpus")
    // (3) recall vs the exact filtered scan — measured at sf0.01; floor
    // sits under measurement with slack for data regeneration
    val r = recall(out.map(o => (o._1, o._4)).toSet, truth)
    info(f"filtered-ANN recall@3 vs filtered brute force = $r%.3f")
    assert(r >= 0.3, s"filtered-ANN recall@3 $r below floor 0.3")
  }

  test("dedup sketch recall vs verified n-gram Jaccard pairs") {
    val truth = pairs(Dedup.ngramJaccard(spark, dir))
    assert(truth.nonEmpty)
    val minhash = recall(pairs(Dedup.minhashLsh(spark, dir)), truth)
    val simhash = recall(pairs(Dedup.simhashPairs(spark, dir)), truth)
    info(f"recall minhash=$minhash%.3f simhash=$simhash%.3f")
    assert(minhash >= 0.9, s"MinHash-LSH recall $minhash below floor 0.9")
    assert(simhash >= 0.4, s"SimHash recall $simhash below floor 0.4")
  }

  test("semantic dedup (cell-bounded) recall vs the exact all-pairs audit") {
    // SemDeDup's trade: pairs straddling an IVF cell boundary are missed.
    // Pin the fraction found so a centroid/assignment regression (which
    // would still be oracle-hash-exact) can't silently gut it, and pin
    // zero false positives: every emitted pair must be in the audit set
    // (same radius, same rounded-cosine metric).
    import org.apache.spark.sql.functions.col
    def vpairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    val truth = vpairs(Similarity.neardupPairs(spark, dir))
    val got = vpairs(Similarity.semanticDedup(spark, dir))
    assert(truth.nonEmpty && got.nonEmpty)
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    val r = recall(got, truth)
    // measured 0.714 with top-2 probing (0.214 single-cell); floor under
    // measurement with slack for data regeneration
    info(f"semantic-dedup recall=$r%.3f (${got.size}/${truth.size} pairs)")
    assert(r >= 0.5, s"cell-bounded dedup recall $r below floor 0.5")
  }

  test("semantic dedup cell count SCALES with the corpus; pairs stay audit-subset") {
    // The round-8 sf1 probe caught fixed-K as quadratic (14.6x at 10x
    // data); pin the fix at test time: a corpus past ivfCells*cellTarget
    // must train MORE cells (K = ceil(n/256)), and the cell-bounded pairs
    // must remain a subset of the exact audit at the same radius.
    import org.apache.spark.sql.functions.col
    val n = 3000 // > 8*256, -> K = ceil(3000/256) = 12
    val dims = 64
    // deterministic synthetic vectors: a few hundred tight near-dup
    // clusters (base direction per cluster, small per-member perturbation)
    val rows = (0 until n).map { id =>
      val cluster = id % 300
      val v = Array.tabulate(dims) { d =>
        val base = ((cluster * 131 + d * 17) % 19 - 9) / 9.0f
        val eps = ((id * 31 + d * 7) % 11 - 5) / 500.0f
        base + eps
      }
      (id.toLong, v, cluster % 5)
    }
    val tmp = java.nio.file.Files.createTempDirectory("sdscale").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // fixture corpora stay at the K floor; the synthetic corpus scales
    assert(Similarity.centroidsDf(spark, dir).count() == 8L)
    assert(Similarity.centroidsDf(spark, tmp).count() == 12L)
    def vpairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    val truth = vpairs(Similarity.neardupPairs(spark, tmp))
    val got = vpairs(Similarity.semanticDedup(spark, tmp))
    assert(truth.nonEmpty && got.nonEmpty)
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(5)}")
    val r = recall(got, truth)
    info(f"scaled-K (12 cells) recall=$r%.3f (${got.size}/${truth.size} pairs)")
    assert(r >= 0.5, s"scaled-K dedup recall $r below floor 0.5")
  }

  test("neardupPairs refuses corpora above the O(n^2) audit cap") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.neardupPairsCapped(spark, dir, cap = 10L)
    }
    assert(e.getMessage.contains("annLshTopk"),
      s"guard message should point at the scale path: ${e.getMessage}")
    // and the default-capped entry point still runs at fixture scale
    assert(graft.operators.Similarity.neardupPairs(spark, dir).count() > 0)
  }

  test("minhash_accuracy: audits every candidate; verified subset == the LSH output") {
    import org.apache.spark.sql.functions.col
    val audit = Dedup.minhashAccuracy(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(audit.nonEmpty)
    audit.foreach { case (d1, d2, agree, est, j) =>
      assert(d1 < d2)
      assert(agree >= 0L && agree <= 16L)
      assert(est == agree.toDouble / 16.0)
      assert(j >= 0.0 && j <= 1.0)
      // LSH candidacy guarantees at least one full band (4 slots) agrees
      assert(agree >= 4L, s"pair ($d1,$d2) candidate without an agreeing band")
    }
    val verified = audit.filter(_._5 >= 0.8).map(a => (a._1, a._2)).toSet
    val lsh = Dedup.minhashLsh(spark, "/root/testdata/sf0.001")
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    assert(verified == lsh, "audit's >=0.8 slice diverges from the dedup output")
    // the estimator is unbiased-ish on this corpus: mean abs error is
    // well under a band's coarseness (1/4)
    val mae = audit.map(a => math.abs(a._4 - a._5)).sum / audit.length
    assert(mae < 0.25, s"mean |est - exact| = $mae")
  }
}
