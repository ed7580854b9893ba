package graft

import graft.operators.{Corpus, Dedup}

/** Behavioral pins for the corpus-assembly operators (cluster assignment,
  * split, packing). The oracle gate checks hash-exactness against DuckDB;
  * these check the invariants a reader cares about. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dedup_clusters: components are closed over both edge sources") {
    val rows = Corpus.dedupClusters(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val cluster = rows.map(r => r._1 -> r._2).toMap
    // every doc is labeled, cluster id is the component min, and the
    // keeper flag marks exactly the rows where the two coincide
    assert(rows.forall { case (id, cl, keep) => cl <= id && keep == (cl == id) })
    // both edge sources land in one cluster: exact-dup groups (none
    // exist at sf0.001, so this arm is vacuous there but real at
    // sf>=0.01)...
    val byText = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .groupBy(_._2).values.filter(_.length > 1)
    byText.foreach { grp =>
      assert(grp.map(g => cluster(g._1)).distinct.length == 1)
    }
    // ...and near-dup pairs
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) => assert(cluster(a) == cluster(b)) }
    // cluster ids are themselves members of their cluster (component min
    // exists as a row)
    val ids = rows.map(_._1).toSet
    assert(rows.forall { case (_, cl, _) => ids.contains(cl) })
  }

  test("dedup_incremental: batch-vs-base semantics") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val isNew = (id: Long) => id % 10 == 7
    val rows = Dedup.incrementalDedup(spark, dir)
      .select("doc_id", "base_doc_id", "kind", "jaccard")
      .as[(Long, Long, String, Double)].collect()
    rows.foreach { case (d, b, kind, j) =>
      assert(isNew(d) && !isNew(b), s"($d, $b) crosses the slice wrong way")
      assert(kind == "exact" || kind == "near")
      if (kind == "near") assert(j >= 0.8 && j <= 1.0)
    }
    // exact hits = precisely the new docs whose text exists in the base,
    // matched to the SMALLEST base doc with that text
    val baseByText = docs.filterNot(d => isNew(d._1))
      .groupBy(_._2).map { case (t, g) => t -> g.map(_._1).min }
    val expectedExact = docs.filter(d => isNew(d._1))
      .flatMap { case (id, t) => baseByText.get(t).map(b => (id, b)) }.toSet
    val gotExact = rows.filter(_._3 == "exact").map(r => (r._1, r._2)).toSet
    assert(gotExact == expectedExact)
    // pipeline order: an exact-matched batch doc never reappears as near
    val exactIds = gotExact.map(_._1)
    assert(rows.filter(_._3 == "near").forall(r => !exactIds.contains(r._1)))
  }

  test("corpus_split: deterministic, total, and roughly proportioned") {
    val rows = Corpus.corpusSplit(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 100))
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "validation", "test"))
    // hash split targets 80/10/10; allow generous tolerance at n=500
    assert(bySplit("train") > 350 && bySplit("train") < 450)
    // stable: recomputing yields the identical assignment
    val again = Corpus.corpusSplit(spark, dir).as[(Long, Long, String)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("components: matches union-find on random graphs") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 8).foreach { _ =>
      val n = 5 + rnd.nextInt(35)
      val m = rnd.nextInt(2 * n)
      val es = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (es.nonEmpty) {
        // reference: in-memory union-find with min-id representatives
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        val got = Corpus.components(es.toDF("d1", "d2"))
          .as[(Long, Long)].collect().toMap
        assert(got == want)
      }
    }
  }

  test("components: empty edge set converges immediately") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Corpus.components(empty).collect().isEmpty)
  }

  test("components: propagation loop (gate disabled) == single-task solve") {
    // the size gate sends every fixture-scale graph to the single-task
    // union-find; force the loop with the gate at 0 and pin that both
    // paths label random graphs (including long chains, the loop's
    // worst case) identically
    val key = "spark.graft.cc.localSolveRows"
    val prev = spark.conf.getOption(key)
    val rnd = new scala.util.Random(20260818L)
    try {
      (1 to 4).foreach { i =>
        val es =
          if (i == 1) (0L until 40L).map(k => (k, k + 1)) // one 41-node chain
          else {
            val n = 5 + rnd.nextInt(35)
            Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
              .filter { case (a, b) => a != b }
          }
        if (es.nonEmpty) {
          spark.conf.unset(key)
          val gate = Corpus.components(es.toDF("d1", "d2"))
            .as[(Long, Long)].collect().toMap
          spark.conf.set(key, "0")
          val loop = Corpus.components(es.toDF("d1", "d2"))
            .as[(Long, Long)].collect().toMap
          assert(loop == gate)
        }
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("corpus_clean: composition agrees with its parts") {
    val rows = Corpus.corpusClean(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val kept = rows.map(_._1).toSet
    // every kept doc is a train-split canonical doc passing the gate
    val train = Corpus.corpusSplit(spark, dir)
      .filter("split = 'train'").select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(train))
    val stats = graft.operators.TextAnalysis.textStats(spark, dir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(kept.forall(id => stats(id) >= 0.2))
    // and nothing eligible was dropped (sf0.001 has no exact dups, so
    // canonical = all docs here)
    val eligible = train.filter(id => stats.get(id).exists(_ >= 0.2))
    assert(kept == eligible)
  }

  test("dedup_canonical: one row per cluster, representative is the longest member") {
    val clusters = Corpus.dedupClusters(spark, dir)
      .as[(Long, Long, Boolean)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val chars = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val rows = Corpus.dedupCanonical(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    // exactly the cluster ids, once each
    assert(rows.map(_._1).toSet == clusters.keySet)
    assert(rows.length == clusters.size)
    rows.foreach { case (cl, canon, nDocs, maxChars) =>
      val members = clusters(cl)
      assert(members.contains(canon))
      assert(nDocs == members.size)
      assert(maxChars == members.map(chars).max)
      // longest member, smallest doc_id on ties
      val want = members.toSeq.map(id => (chars(id), id))
        .sortBy { case (c, id) => (-c, id) }.head._2
      assert(canon == want)
    }
    // totals: every document is in exactly one cluster
    assert(rows.map(_._3).sum == chars.size)
  }

  test("corpus_sample: exact per-stratum hash-gate semantics") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      md.reset()
      val hex = md.digest(s"sample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val rate = Map("en" -> 25L, "fr" -> 50L).withDefaultValue(100L)
    val want = docs.collect {
      case (id, lang) if bucket(id) < rate(lang) => (id, lang, bucket(id))
    }.toSet
    val got = Corpus.corpusSample(spark, dir).as[(Long, String, Long)]
      .collect().toSet
    assert(got == want)
    // the high-resource stratum actually shrank; default strata did not
    val keptEn = got.count(_._2 == "en")
    val allEn = docs.count(_._2 == "en")
    assert(keptEn < allEn / 2)
    assert(got.count(_._2 == "de") == docs.count(_._2 == "de"))
  }

  test("corpus_mixture: copy counts follow the epoch weights exactly") {
    val rows = Corpus.corpusMixture(spark, dir)
      .as[(Long, String, Long)].collect()
    val byDoc = rows.groupBy(_._1)
    // copies are contiguous 1..n
    byDoc.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // integral weights are exact; fractional weights land on floor/ceil
    val copiesByLang = rows.groupBy(_._2).view
      .mapValues(_.groupBy(_._1).values.map(_.length).toSet).toMap
    assert(copiesByLang("en") == Set(1))
    assert(copiesByLang("de") == Set(2))
    assert(copiesByLang("zh") == Set(3))
    assert(copiesByLang("fr").subsetOf(Set(2, 3)))
    assert(copiesByLang("es").subsetOf(Set(1, 2)))
    // deterministic under recomputation
    val again = Corpus.corpusMixture(spark, dir)
      .as[(Long, String, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("seq_packing: packs are contiguous and budget-aligned per shard") {
    val rows = Corpus.seqPacking(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 500)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._1)
      // the running sum is consistent: cum_before = sum of earlier docs
      var cum = 0L
      sorted.foreach { case (id, sh, n, cumBefore, pack) =>
        assert(sh == id % 32)
        assert(cumBefore == cum)
        assert(pack == cumBefore / 1024)
        cum += n
      }
      // pack ids are non-decreasing in doc order
      val packs = sorted.map(_._5)
      assert(packs.zip(packs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("mixture_plan: temperature flattens shares toward uniform; totals conserve") {
    val plan = Corpus.mixturePlan(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(plan.nonEmpty)
    val n = graft.sources.Tables.documents(spark, dir).count()
    assert(plan.map(_._2).sum == n)
    // fixed-point truncation: shares sum to 1e6 minus at most |langs|
    Seq(plan.map(_._4).sum, plan.map(_._5).sum).foreach { s =>
      assert(s <= 1000000L && s > 1000000L - plan.length, s"share sum $s")
    }
    // sqrt-temperature moves every minority language UP and the
    // majority language DOWN (strictly, unless already uniform)
    val maxLang = plan.maxBy(_._2)
    val minLang = plan.minBy(_._2)
    if (maxLang._2 != minLang._2) {
      assert(maxLang._5 < maxLang._4, s"majority not damped: $maxLang")
      assert(minLang._5 > minLang._4, s"minority not boosted: $minLang")
    }
    // and the temperature ORDER preserves the population order
    assert(plan.sortBy(_._2).map(_._1).toSeq == plan.sortBy(_._5).map(_._1).toSeq)
  }

  test("corpus_drift: an injected template flood in the batch split tops the list") {
    // base docs share a uniform vocabulary; every batch-split doc
    // (doc_id % 3 == 0) is flooded with a template term
    val rows = (0L until 90L).map { id =>
      val base = "alpha beta gamma delta epsilon zeta"
      val text = if (id % 3 == 0) base + (" floodterm" * 20) else base
      (id, text, "en", "src0", text.length.toLong)
    }
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val drift = Corpus.corpusDrift(spark, tmp)
      .as[(String, Long, Long, Long)].collect()
    assert(drift.nonEmpty)
    assert(drift.head._1 == "floodterm", s"flood not top: ${drift.take(3).toSeq}")
    // one-sided: the flood exists only in the batch split
    assert(drift.head._2 == 0L && drift.head._3 == 600L)
    // ranked non-increasing by drift score
    assert(drift.map(_._4).toSeq == drift.map(_._4).sortBy(-_).toSeq)
  }
}
