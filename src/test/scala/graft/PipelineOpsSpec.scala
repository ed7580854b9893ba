package graft

import graft.operators.{Analytics, Similarity, TextAnalysis}

/** Behavioral pins for the round-2 pipeline operators (chunking, keyword
  * extraction, IVF ANN, cube, band join). The oracle gate checks
  * hash-exactness against DuckDB; these check the semantics a reader
  * cares about. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("doc_chunks: coverage, overlap, and bounds") {
    val chunks = TextAnalysis.docChunks(spark, dir)
      .select("doc_id", "chunk_id", "start", "chunk_len", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    byDoc.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids are dense from 0; starts advance by the stride
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      assert(sorted.forall { case (_, id, start, _, _) => start == id * 150 })
      // every chunk is non-empty and at most the chunk size
      assert(sorted.forall(c => c._4 > 0 && c._4 <= 200))
      // all but the last chunk overlap the next by size - stride = 50
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.drop(150) == b._5.take(a._5.length - 150))
        case _ =>
      }
    }
    // chunks reassemble the document: chunk i contributes its first 150
    // chars, the last chunk contributes everything
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    byDoc.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      val rebuilt = sorted.init.map(_._5.take(150)).mkString + sorted.last._5
      assert(rebuilt == docs(docId))
    }
  }

  test("doc_keywords: no stopwords, rank ordering, count correctness") {
    val kws = TextAnalysis.docKeywords(spark, dir)
      .as[(Long, Int, String, Long)].collect()
    assert(kws.nonEmpty)
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
    assert(kws.forall(k => !stop.contains(k._3) && k._3.length >= 3))
    kws.groupBy(_._1).foreach { case (_, ks) =>
      val sorted = ks.sortBy(_._2)
      assert(sorted.length <= 3)
      // counts are non-increasing with rank; equal counts break ties by term
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
    }
  }

  test("ann_ivf_topk: probes only the query's cell; ranks are dense") {
    val rows = Similarity.annIvfTopk(spark, dir)
      .select("q_id", "rank", "cand_id", "sim_r", "cell")
      .as[(Long, Int, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq)
      // all candidates for one query share one cell (nprobe=1)
      assert(rs.map(_._5).distinct.length == 1)
      // similarity is non-increasing with rank
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("doc_novelty: bounds, totals, and exact duplicates score zero") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val rows = TextAnalysis.docNovelty(spark, dir)
      .select("doc_id", "n_shingles", "n_unique", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, u, nov) =>
      assert(n > 0 && u >= 0 && u <= n, s"doc $id")
      assert(nov == u.toDouble / n, s"doc $id")
    }
    // every shingle of an exact-duplicate doc occurs in its twin too
    val dupIds = docs.select("doc_id", "text").as[(Long, String)].collect()
      .groupBy(_._2).values.filter(_.length > 1).flatten.map(_._1).toSet
    val byId = rows.map(r => r._1 -> r._4).toMap
    dupIds.foreach(id => byId.get(id).foreach(nov =>
      assert(nov == 0.0, s"exact-dup doc $id must have novelty 0")))
    // docs with < 3 tokens emit no row (absence-is-reject contract)
    val shingled = rows.map(_._1).toSet
    assert(shingled.subsetOf(docs.select("doc_id").as[Long].collect().toSet))
  }

  test("corpus_domain_cap: at most K per source, deterministic unbiased pick") {
    val capped = graft.operators.Corpus.domainCap(spark, dir)
      .select("source", "doc_id").as[(String, Long)].collect()
    val bySource = capped.groupBy(_._1)
    bySource.foreach { case (s, rows) =>
      assert(rows.length <= 10, s"source $s over cap")
      assert(rows.map(_._2).distinct.length == rows.length, s"source $s dup doc")
    }
    // deterministic: a second run picks the identical subset
    val again = graft.operators.Corpus.domainCap(spark, dir)
      .select("source", "doc_id").as[(String, Long)].collect()
    assert(capped.toSet == again.toSet)
    // sources with <= K docs are kept in full
    val totals = graft.sources.Tables.documents(spark, dir)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    bySource.foreach { case (s, rows) =>
      assert(rows.length == math.min(10L, totals(s)), s"source $s")
    }
  }

  test("embedding_quantize: int8 error bounded by half the quant step") {
    val rows = Similarity.embeddingQuantize(spark, dir)
      .select("label", "n", "mean_max_err", "worst_err")
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    // |v - q*scale| <= scale/2 for round-half-up, and scale <= maxAbs/127
    val maxAbs = graft.sources.Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.array_max(
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.col("embedding").cast("array<double>"),
          x => org.apache.spark.sql.functions.abs(x))).as("m"))
      .agg(org.apache.spark.sql.functions.max("m")).as[Double].head()
    val bound = maxAbs / 127.0 / 2.0 * (1.0 + 1e-9)
    rows.foreach { case (label, n, mean, worst) =>
      assert(n > 0 && mean >= 0 && worst >= mean, s"label $label")
      assert(worst <= bound, s"label $label: worst_err $worst > bound $bound")
    }
  }

  test("doc_repetition: fraction bounds and internal consistency") {
    val rows = TextAnalysis.docRepetition(spark, dir)
      .as[(Long, Long, Long, Double, Long, Long, Double)].collect()
    assert(rows.length == 500)
    rows.foreach { case (_, nl, ndl, dlf, nb, tbn, tbf) =>
      assert(nl >= ndl && ndl > 0)
      assert(dlf >= 0.0 && dlf < 1.0)
      assert(dlf == 1.0 - ndl.toDouble / nl)
      assert(tbn <= nb)
      if (nb > 0) assert(tbf == tbn.toDouble / nb && tbf > 0.0)
      else assert(tbf == 0.0)
    }
  }

  test("ann_ivf_multiprobe: <=2 cells per query, probe in {1,2}, rank-1 no worse than nprobe=1") {
    val multi = Similarity.annIvfMultiprobe(spark, dir)
      .select("q_id", "rank", "cand_id", "sim_r", "cell", "probe")
      .as[(Long, Int, Long, Double, Long, Int)].collect()
    assert(multi.nonEmpty)
    multi.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq)
      assert(rs.map(_._5).distinct.length <= 2)
      assert(rs.forall(r => r._6 == 1 || r._6 == 2))
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // widening the probe set can only improve the best hit per query
    val single = Similarity.annIvfTopk(spark, dir)
      .select("q_id", "rank", "sim_r").as[(Long, Int, Double)].collect()
    val best1 = single.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    val bestM = multi.filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    best1.foreach { case (q, s) => assert(bestM(q) >= s) }
  }

  test("type_bucket_cube: all four grouping sets present and consistent") {
    val rows = Analytics.typeBucketCube(spark, dir)
      .select("event_type", "bucket", "n")
      .as[(Option[String], Option[Long], Long)].collect()
    val grand = rows.filter(r => r._1.isEmpty && r._2.isEmpty)
    val byType = rows.filter(r => r._1.nonEmpty && r._2.isEmpty)
    val byBucket = rows.filter(r => r._1.isEmpty && r._2.nonEmpty)
    val cells = rows.filter(r => r._1.nonEmpty && r._2.nonEmpty)
    assert(grand.length == 1)
    // every marginal sums to the grand total
    assert(byType.map(_._3).sum == grand.head._3)
    assert(byBucket.map(_._3).sum == grand.head._3)
    assert(cells.map(_._3).sum == grand.head._3)
  }

  test("value_band_join: bands partition the value domain") {
    val rows = Analytics.valueBandJoin(spark, dir)
      .select("band_id", "n").as[(Long, Long)].collect()
    val events = graft.sources.Tables.events(spark, dir)
    val inRange = events.filter("value >= 0.0 AND value < 1000.0").count()
    // half-open bands tile [0, 1000) with no gaps/overlaps, so the
    // per-band counts sum to the in-range event count
    assert(rows.map(_._2).sum == inRange)
  }

  test("hourly_gapfill: dense grid, zeros for absent cells, counts conserved") {
    val rows = Analytics.hourlyGapfill(spark, dir)
      .as[(String, Long, Long)].collect()
    val raw = graft.sources.Tables.events(spark, dir)
      .selectExpr("event_type", "ts_sec div 3600 * 3600 as h")
      .as[(String, Long)].collect()
    val types = raw.map(_._1).distinct
    val (lo, hi) = (raw.map(_._2).min, raw.map(_._2).max)
    val nHours = (hi - lo) / 3600 + 1
    // the grid is the FULL cross product — no hour missing for any type
    assert(rows.length == types.length * nHours)
    assert(rows.map(_._2).distinct.length == nHours)
    // zero cells exist (that is the point of gap fill) and real cells
    // match the raw counts exactly
    assert(rows.exists(_._3 == 0L))
    val want = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (t, h, n) =>
      assert(n == want.getOrElse((t, h), 0L))
    }
  }

  test("funnel_ordered: strict ordering semantics vs in-memory replay") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts_ns")
      .as[(Long, String, Long)].collect()
    def firstAfter(tpe: String, bound: Map[Long, Long]): Map[Long, Long] =
      ev.filter(e => e._2 == tpe && bound.get(e._1).exists(e._3 > _))
        .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val s1 = ev.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val s2 = firstAfter("click", s1)
    val s3 = firstAfter("purchase", s2)
    val got = Analytics.funnelOrdered(spark, dir)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq == Seq(s1.size, s2.size, s3.size).map(_.toLong))
    // the funnel only narrows
    assert(got(0)._3 >= got(1)._3 && got(1)._3 >= got(2)._3)
  }

  test("user_retention: triangle matches in-memory replay; offsets bounded") {
    val ev = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "ts_sec div 86400 as d")
      .as[(Long, Long)].collect()
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = ev.map { case (u, d) =>
      (cohort(u), (d - cohort(u)) / 7, u)
    }.distinct.groupBy(x => (x._1, x._2)).view.mapValues(_.length.toLong).toMap
    val got = Analytics.userRetention(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(got.map { case (c, w, n) => ((c, w), n) }.toMap == want)
    // offset 0 contains every user of its cohort (first activity is
    // inside week 0 by construction)
    val week0 = got.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    cohort.groupBy(_._2).foreach { case (day, us) =>
      assert(week0(day) == us.size)
    }
  }

  test("ann_range_search: threshold semantics and top-k consistency") {
    val got = Similarity.annRangeSearch(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(got.forall(_._3 >= 0.30))
    assert(got.forall(r => r._1 != r._2))
    // a query's top-k hits above the radius must all be range hits with
    // the identical rounded similarity
    val gotSet = got.map(r => (r._1, r._2) -> r._3).toMap
    val topk = Similarity.annTopkCosine(spark, dir)
      .select("q_id", "cand_id", "sim_r").as[(Long, Long, Double)].collect()
    topk.filter(_._3 >= 0.30).foreach { case (q, c, s) =>
      assert(gotSet.get((q, c)).contains(s))
    }
  }

  test("embedding_norm_stats: brute force per label; counts partition the table") {
    val got = Similarity.embeddingNormStats(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect()
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("label", "embedding").as[(Int, Array[Float])].collect()
    assert(got.map(_._2).sum == vecs.length)
    got.foreach { case (label, n, mean, mn, mx) =>
      val normsU = vecs.filter(_._1 == label).map { case (_, emb) =>
        val v = emb.map(_.toDouble)
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.floor(math.sqrt(s) * 1000000.0 + 0.5).toLong
      }
      assert(n == normsU.length)
      assert(mn == normsU.min.toDouble / 1000000.0)
      assert(mx == normsU.max.toDouble / 1000000.0)
      assert(mean == normsU.sum.toDouble / n / 1000000.0)
      assert(mn > 0, "a zero norm would mean a dead vector")
    }
  }

  test("corpus_importance_sample: keep rate tracks quality; HT weights unbiased") {
    val stats = TextAnalysis.textStats(spark, dir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val kept = graft.operators.Corpus.corpusImportanceSample(spark, dir)
      .select("doc_id", "quality_score", "weight")
      .as[(Long, Double, Double)].collect()
    assert(kept.nonEmpty && kept.length < stats.size,
      "the soft gate must keep some and drop some")
    kept.foreach { case (id, q, w) =>
      assert(q == stats(id))
      // weight is exactly the inverse of the quantized keep probability
      val thresh = math.floor(q * 1000000.0 + 0.5).toLong
      assert(w == 1000000.0 / thresh)
    }
    // Horvitz-Thompson: the weighted kept count estimates the corpus
    // size without bias; on the fixture the draw is deterministic, so
    // just bound the realized estimate loosely
    val est = kept.map(_._3).sum
    assert(math.abs(est - stats.size) / stats.size < 0.25,
      s"HT estimate $est vs corpus ${stats.size}")
  }

  test("quality_calibration: exact match vs in-memory type-1 quantiles") {
    val rows = TextAnalysis.qualityCalibration(spark, dir)
      .select("lang", "n_docs", "q25", "q50", "q75")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // independent replay: quantize each doc's score, sort per lang, pick
    // rank floor((n-1)p)+1 (1-based)
    val scored = TextAnalysis.textStats(spark, dir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val langs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = langs.collect { case (id, l) if scored.contains(id) =>
      l -> math.floor(scored(id) * 1000000.0 + 0.5).toLong
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (lang, n, q25, q50, q75) =>
      val vs = byLang(lang)
      assert(n == vs.length, s"lang $lang")
      def tq(p: Double) = vs((math.floor((n - 1) * p) + 1).toInt - 1) / 1000000.0
      assert((q25, q50, q75) == ((tq(0.25), tq(0.50), tq(0.75))), s"lang $lang")
      assert(q25 <= q50 && q50 <= q75, s"lang $lang")
    }
    assert(rows.map(_._2).sum == byLang.values.map(_.length).sum)
  }

  test("dedup_span_profile: exact match vs in-memory replay") {
    val rows = graft.operators.Dedup.spanDedupProfile(spark, dir)
      .select("doc_id", "n_spans", "dup_spans", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, d, f) =>
      assert(n > 0 && d >= 0 && d <= n, s"doc $id")
      assert(f == d.toDouble / n, s"doc $id")
    }
    // independent in-memory replay of the whole profile (500 docs)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val spans: Map[Long, Set[String]] = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      id -> toks.sliding(10).filter(_.length == 10)
        .map(_.mkString(" ")).toSet
    }.toMap
    val df = spans.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val expected = spans.collect { case (id, ss) if ss.nonEmpty =>
      val dup = ss.count(df(_) >= 2).toLong
      id -> ((ss.size.toLong, dup, dup.toDouble / ss.size))
    }
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap == expected)
  }

  test("span_dedup_apply: exact match vs in-memory greedy-removal replay") {
    val rows = graft.operators.Dedup.spanDedupApply(spark, dir)
      .select("doc_id", "n_tokens", "kept_tokens", "clean_md5")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // plain-Scala replay of the whole operator: ALL span occurrences
    // (with positions), global first per span by (doc_id, pos), covered
    // positions dropped, survivors re-joined and md5'd
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val toksOf = docs.map { case (id, text) =>
      id -> text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    }.toMap
    val occ = docs.flatMap { case (id, _) =>
      val t = toksOf(id)
      (0 to t.length - 10).map(p => (t.slice(p, p + 10).mkString(" "), id, p))
    }
    val firstOf = occ.groupBy(_._1).map { case (s, os) =>
      s -> os.map(o => (o._2, o._3)).min
    }
    val covered: Map[Long, Set[Int]] = occ
      .filter { case (s, id, p) => firstOf(s) != ((id, p)) }
      .flatMap { case (_, id, p) => (p until p + 10).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.map { case (id, _) =>
      val t = toksOf(id)
      val keep = t.indices.filterNot(covered.getOrElse(id, Set.empty))
      val cleaned = keep.map(t).mkString(" ")
      md.reset()
      val h = md.digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> ((t.length.toLong, keep.length.toLong, h))
    }.toMap
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap == expected)
    // and the removal is real on this corpus: some doc lost tokens
    assert(rows.exists(r => r._3 < r._2), "no spans were removed")
  }

  test("multimodal_phash_dedup: hash replay + exact duplicates pair at hamming 0") {
    // in-memory replay of the aHash bits on the fixture payloads
    val got = graft.operators.Multimodal.phashDocs(spark, dir)
      .as[(Long, Long)].collect().toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = b.length
      if (n < 60) None
      else {
        val total = b.map(_ & 0xff).map(_.toLong).sum
        var h = 0L
        for (bit <- 0 until 60) {
          val f = (bit.toLong * n / 60).toInt
          val u = ((bit + 1).toLong * n / 60).toInt
          val s = (f until u).map(i => (b(i) & 0xff).toLong).sum
          if (s * n > total * (u - f)) h |= (1L << bit)
        }
        Some(id -> h)
      }
    }.toMap
    assert(got == expected)
    // crafted corpus: exact duplicate payloads must pair at hamming 0
    val tmp = java.nio.file.Files.createTempDirectory("phash").toString
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    Seq((1L, base), (2L, base), (3L, "a completely different text body " * 4))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = graft.operators.Multimodal.phashDedup(spark, tmp)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)), s"missing exact pair: $pairs")
  }

  test("bpe_merge_table: greedy-overlap semantics vs reference trainer") {
    // adversarial corpus: runs of identical tokens (overlapping pair
    // occurrences must merge greedily left-to-right: "x x x" -> [x x, x])
    // and enough repeated bigrams that later rounds merge MERGED tokens
    val docs = Seq(
      (1L, "x x x x x"),
      (2L, "a b a b a b"),
      (3L, "a b c a b c a b c"),
      (4L, "x x a b"),
      (5L, "solo"))
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = graft.operators.TextAnalysis.bpeMergeTable(spark, tmp)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    // reference trainer: plain-Scala greedy merge loop
    def applyMerge(t: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == l && t(i + 1) == r) {
          out += (l + " " + r); i += 2
        } else { out += t(i); i += 1 }
      }
      out.toList
    }
    var st = docs.map(_._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toList)
    val expected = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var round = 0
    var go = true
    while (round < 8 && go) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      st.foreach(_.sliding(2).foreach {
        case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      })
      if (counts.isEmpty) go = false
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        expected += ((round.toLong, l, r, n))
        st = st.map(applyMerge(_, l, r))
      }
      round += 1
    }
    assert(got == expected.toSeq,
      s"got=${got.mkString("; ")}\nexpected=${expected.mkString("; ")}")
    // round 0 merges (a, b): 3 + 3 + 1 = 7 occurrences; the overlap case
    // is exercised when (x, x) merges — its 4 overlapping occurrences in
    // doc 1 must collapse greedily to 2 non-overlapping merges
    assert(expected.head == ((0L, "a", "b", 7L)))
    assert(expected.exists(m => m._2 == "x" && m._3 == "x"),
      "the overlapping-pair case never merged")
  }

  test("embedding_jl_distortion: exact match vs in-memory replay") {
    val rows = Similarity.jlDistortion(spark, dir)
      .select("q_id", "n_pairs", "avg_ratio", "min_ratio", "max_ratio")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 10)
    // independent replay: same md5-parity coefficients, same ascending
    // folds, same 1e-6 fixed-point quantization, plain Scala end to end
    val md = java.security.MessageDigest.getInstance("MD5")
    def coef(j: Int, d: Int): Double = {
      md.reset()
      val hex = md.digest(s"jl_${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      1.0 - 2.0 * (java.lang.Long.parseLong(hex, 16) % 2).toDouble
    }
    val coefs = Array.tabulate(16, 64)(coef)
    val vecsArr = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect()
      .filter { case (_, v) => math.sqrt(v.map(x => x * x).sum) > 0.0 }
      .sortBy(_._1)
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val proj = vecsArr.map { case (id, v) =>
      id -> ((v, coefs.map(c => dotp(v, c))))
    }.toMap
    val expected = proj.keys.filter(_ < 10).map { qid =>
      val (qv, qpv) = proj(qid)
      val fxs = proj.toSeq.collect { case (id, (v, pv)) if id != qid =>
        val d2 = (dotp(qv, qv) + dotp(v, v)) - 2.0 * dotp(qv, v)
        val pd2 = (dotp(qpv, qpv) + dotp(pv, pv)) - 2.0 * dotp(qpv, pv)
        (d2, pd2)
      }.filter(_._1 > 0.0).map { case (d2, pd2) =>
        math.floor(((pd2 / 16.0) / d2) * 1000000.0 + 0.5).toLong
      }
      qid -> ((fxs.size.toLong, fxs.sum.toDouble / fxs.size / 1000000.0,
        fxs.min.toDouble / 1000000.0, fxs.max.toDouble / 1000000.0))
    }.toMap
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap == expected)
    // JL sanity: the cross-anchor mean ratio concentrates near 1
    val grand = rows.map(_._3).sum / rows.length
    assert(grand > 0.7 && grand < 1.3, s"grand mean ratio $grand")
  }

  test("user_rfm_features: invariants + exact recompute for a sample of users") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.userRfmFeatures(spark, dir)
      .as[(Long, Long, Option[Double], Long, Long, Option[Double], Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, _, recency, span, gap, days) =>
      assert(recency >= 0 && span >= 0, s"user $u")
      assert(days >= 1 && days <= n, s"user $u")
      assert(gap.isDefined == (n >= 2), s"user $u gap/n mismatch")
      gap.foreach(g => assert(g == span.toDouble / (n - 1), s"user $u gap"))
    }
    // exact recompute for the 5 busiest users
    val ev = graft.sources.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_sec"), col("value"))
      .as[(Long, Long, Option[Double])].collect()
    val now = ev.map(_._2).max
    val byUser = ev.groupBy(_._1)
    val got = rows.map(r => r._1 -> r).toMap
    byUser.toSeq.sortBy(-_._2.length).take(5).foreach { case (u, es) =>
      val r = got(u)
      assert(r._2 == es.length)
      val cents = es.flatMap(_._3).map(v => math.floor(v * 100.0 + 0.5).toLong)
      if (cents.nonEmpty) assert(r._3.contains(cents.sum.toDouble / 100.0))
      assert(r._4 == now - es.map(_._2).max)
      assert(r._7 == es.map(_._2 / 86400).distinct.length)
    }
  }

  test("bpe_roundtrip: every document decodes exactly; merges compress") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = graft.operators.TextAnalysis.bpeRoundtrip(spark, d).collect()(0)
      val (nDocs, nMatch, nPieces, nTokens) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDocs > 0 && nMatch == nDocs, s"$d: $nMatch/$nDocs round-trips")
      assert(nPieces < nTokens, s"$d: merge table bought no compression")
      assert(r.getDouble(4) == nPieces.toDouble / nTokens)
    }
  }
}
