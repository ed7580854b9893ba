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
}
