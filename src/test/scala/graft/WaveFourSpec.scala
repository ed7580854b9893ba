package graft

import graft.operators.{Analytics, Graph, Warehouse}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Behavioral pins for the round-10 fourth wave's sequential-recurrence
  * operators (CUSUM changepoint, Holt level+trend forecast). Each test
  * recomputes the full recurrence independently on the driver from the raw
  * tiny fixture — same integer fixed-point rules, written in plain Scala —
  * and demands equality row-by-row, so a lambda-binding or fold-order bug
  * in the Catalyst `aggregate` HOF cannot hide behind the oracle's
  * identically-shaped SQL recursion. */
class WaveFourSpec extends SparkSpec {

  private val tiny = "/root/testdata/sf0.001"
  private val small = "/root/testdata/sf0.01"

  /** (event_type -> sorted (day, y) series) recomputed from raw events. */
  private def series(dir: String): Map[String, Seq[(String, Long)]] =
    graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case ((t, d), rs) => (t, d, rs.length.toLong) }
      .toSeq.groupBy(_._1)
      .map { case (t, rs) => t -> rs.map(r => (r._2, r._3)).sortBy(_._1) }

  test("cusum_alerts: exact fixed-point recurrence vs driver recompute") {
    // run at BOTH fixtures: sf0.001 for speed, sf0.01 because only there
    // do the tuned constants actually fire the alarm-reset branch — a
    // vacuous alarms>=0 check (review finding) left the reset path pinned
    // only by the identically-shaped oracle
    var alarmsSmall = 0
    Seq(tiny, small).foreach { dir =>
      val got = Analytics.cusumAlerts(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      var expected = 0
      series(dir).foreach { case (t, ser) =>
        val mu8 = (8L * ser.map(_._2).sum) / ser.length
        val k8 = mu8 / 64
        val h8 = mu8 / 4
        var s = 0L
        ser.foreach { case (day, y) =>
          val news = math.max(0L, s + 8 * y - mu8 - k8)
          val alarm = news > h8
          s = if (alarm) 0L else news
          assert(got((t, day)) == ((y, news, alarm)),
            s"cusum mismatch at ($dir, $t, $day)")
          expected += 1
          if (alarm && dir == small) alarmsSmall += 1
        }
      }
      assert(got.size == expected)
    }
    assert(alarmsSmall > 0, "alarm-reset branch never exercised at sf0.01")
  }

  test("holt_forecast: exact level+trend recurrence vs driver recompute") {
    val got = Analytics.holtForecast(spark, tiny).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    var n = 0
    series(tiny).foreach { case (t, ser) =>
      var l = 0L; var b = 0L; var first = true
      ser.foreach { case (day, y) =>
        if (first) { l = 8 * y; b = 0L; first = false }
        else {
          val nl = (8 * y + 3 * (l + b)) / 4
          // Scala / on Long truncates toward zero == Spark `div` == DuckDB `//`
          val nb = (nl - l + 3 * b) / 4
          l = nl; b = nb
        }
        assert(got((t, day)) == ((y, l, b, l + b)),
          s"holt mismatch at ($t, $day): got ${got((t, day))}, want ($y, $l, $b, ${l + b})")
        n += 1
      }
    }
    assert(got.size == n)
    // trend must actually exercise the negative-operand division branch
    assert(got.values.exists(_._3 < 0), "no negative trend rows — fixture too flat")
  }

  test("bloom_prune_audit: no false negatives, counts match a driver bloom") {
    def pos(i: Int, key: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"bf$i:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 8192
    }
    val seg = spark.read.parquet(s"$tiny/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val bits = seg.flatMap(k => (1 to 3).map(i => pos(i, k)))
    val orders = spark.read.parquet(s"$tiny/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val cand = orders.filter { case (_, c) => (1 to 3).forall(i => bits(pos(i, c))) }
    val tru = orders.filter { case (_, c) => seg(c) }
    // a Bloom can only over-approximate: every true match must be a candidate
    assert(tru.map(_._1).toSet.subsetOf(cand.map(_._1).toSet))

    val r = Warehouse.bloomPruneAudit(spark, tiny).collect().head
    assert(r.getAs[Long]("n_fact") == orders.length)
    assert(r.getAs[Long]("n_build") == seg.size)
    assert(r.getAs[Long]("n_candidates") == cand.length)
    assert(r.getAs[Long]("n_true") == tru.length)
    assert(r.getAs[Long]("n_false_pos") == cand.length - tru.length)
  }

  test("copurchase_triangles: degree-ordered count == brute-force recount") {
    val items = spark.read.parquet(s"$tiny/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = items.groupBy(_._1).values.flatMap { o =>
      val ps = o.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    // brute force: for each edge (u, v), common neighbors w with u < v < w
    val tri = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(_ > v).toLong
    }.sum
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum

    val r = Graph.copurchaseTriangles(spark, tiny).collect().head
    assert(r.getAs[Long]("n_nodes") == adj.size)
    assert(r.getAs[Long]("n_edges") == edges.size)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == tri)
    assert(tri > 0, "fixture produced a triangle-free graph — test has no power")
  }

  test("column_profile: counts and mode vs driver recompute, null branch live") {
    val raw = graft.sources.Tables.events(spark, tiny)
      .select("event_type", "user_id", "value", "props").collect()
    val cols: Map[String, Seq[Option[String]]] = Map(
      "event_type" -> raw.toSeq.map(r => Some(r.getString(0))),
      "user_id" -> raw.toSeq.map(r => Option(r.get(1)).map(_.toString)),
      "v_cents" -> raw.toSeq.map(r => Option(r.get(2))
        .map(v => math.floor(v.asInstanceOf[Double] * 100.0 + 0.5).toLong.toString)),
      "purchase_cents" -> raw.toSeq.map(r =>
        if (r.getString(0) == "purchase") Option(r.get(2))
          .map(v => math.floor(v.asInstanceOf[Double] * 100.0 + 0.5).toLong.toString)
        else None),
      "props" -> raw.toSeq.map(r => Option(r.getString(3))))

    val got = graft.operators.Warehouse.columnProfile(spark, tiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toMap
    assert(got.keySet == cols.keySet)
    cols.foreach { case (name, vals) =>
      val nn = vals.flatten
      val (topV, topN) = nn.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.minBy { case (v, n) => (-n, v) }
      assert(got(name) == ((vals.size.toLong, (vals.size - nn.size).toLong,
        nn.distinct.size.toLong, topV, topN)), s"profile mismatch for $name")
    }
    // the sparse derived column must actually exercise the null branch
    assert(got("purchase_cents")._2 > 0)
  }

  test("sample_quantile_audit: driver recompute + bottom-k merge property") {
    def h(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"sq:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = graft.sources.Tables.events(spark, tiny)
      .filter(col("value").isNotNull)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))

    val got = Analytics.sampleQuantileAudit(spark, tiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    rows.groupBy(_._1).foreach { case (t, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.length
      val ex50 = sorted((n - 1) * 5 / 10)
      val ex90 = sorted((n - 1) * 9 / 10)
      val sample = rs.sortBy(r => h(r._2)).take(256).map(_._3).sorted
      val k = sample.length
      val sp50 = sample((k - 1) * 5 / 10)
      val sp90 = sample((k - 1) * 9 / 10)
      assert(got(t) == ((n.toLong, ex50, ex90, k.toLong, sp50, sp90)),
        s"quantile audit mismatch for $t")

      // mergeability: bottom-k of the union == bottom-k of merged per-split
      // bottom-k's — the property that makes the sample shippable as k rows
      // per map task
      val (l, r) = rs.partition(_._2 % 2 == 0)
      val merged = (l.sortBy(x => h(x._2)).take(256) ++ r.sortBy(x => h(x._2)).take(256))
        .sortBy(x => h(x._2)).take(256).map(_._3).sorted
      assert(merged.toSeq == sample.toSeq, s"bottom-k not mergeable for $t")
    }
  }

  test("grouped_split_audit: count algebra == brute-force pairs; group leak 0") {
    def bucket(salt: String, key: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$salt$key".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    def split(b: Long): String =
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    val docs = spark.read.parquet(s"$tiny/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    def brute(assign: ((Long, String)) => String): Long =
      docs.groupBy(_._2).values.map { g =>
        val ss = g.map(assign)
        (for (i <- ss.indices; j <- i + 1 until ss.length
          if ss(i) != ss(j)) yield 1L).sum
      }.sum

    val leakDoc = brute { case (id, _) => split(bucket("split:", id.toString)) }
    val leakGrp = brute { case (_, src) => split(bucket("gsplit:", src)) }
    assert(leakGrp == 0L) // by construction, but pin it against salts drifting

    val got = graft.operators.Corpus.groupedSplitAudit(spark, tiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("doc") == ((docs.length.toLong, docs.map(_._2).distinct.length.toLong, leakDoc)))
    assert(got("group") == ((docs.length.toLong, docs.map(_._2).distinct.length.toLong, 0L)))
    assert(leakDoc > 0, "doc-level split leaked nothing — audit has no power")
  }

  test("hybrid_rrf: driver recompute of the semantic leg and the fusion") {
    // the lexical leg is bm25_topk, which has its own oracle — take its
    // output as given and recompute everything downstream independently
    val lex = graft.operators.Retrieval.bm25Topk(spark, tiny).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(x => (-x._3, x._2)).map(_._2).zipWithIndex
          .map { case (d, i) => (d, i + 1) }).toMap

    val vecs = spark.read.parquet(s"$tiny/embeddings.parquet").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        r.getLong(0) -> v
      }.toMap
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def simR(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      math.floor(d / (norm(a) * norm(b)) * 1000000.0 + 0.5) / 1000000.0
    }
    val expect = lex.flatMap { case (q, lexRanked) =>
      val seed = lexRanked.head._1
      val sv = vecs(seed)
      val sem = vecs.toSeq.filter(v => v._1 != seed && norm(v._2) > 0.0)
        .map { case (id, v) => (id, simR(sv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).zipWithIndex
        .map { case (d, i) => (d, i + 1) }
      val contrib = (lexRanked.map { case (d, r) => (d, r, 1L, 0L) } ++
        sem.map { case (d, r) => (d, r, 0L, 1L) })
      contrib.groupBy(_._1).map { case (d, cs) =>
        (q, d) -> (cs.map(c => 1000000000L / (60 + c._2)).sum,
          cs.map(_._3).max, cs.map(_._4).max)
      }.toSeq.sortBy { case ((_, d), (s, _, _)) => (-s, d) }.take(10)
        .zipWithIndex.map { case (((qq, d), (s, il, is)), i) =>
          (qq, i + 1, d) -> (s, il, is) }
    }.toMap

    val got = graft.operators.Retrieval.hybridRrf(spark, tiny).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    // the fusion must actually mix legs somewhere
    assert(got.values.exists(_._2 == 1L) && got.values.exists(_._3 == 1L))
  }

  test("price_size_skyline: two-phase result == brute-force dominance") {
    val pp = spark.read.parquet(s"$tiny/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong, r.getInt(2).toLong))
    val expect = pp.filter { case (_, p, s) =>
      !pp.exists { case (_, p2, s2) =>
        p2 <= p && s2 <= s && (p2 < p || s2 < s)
      }
    }.map { case (k, p, s) => (k, p, s) }.toSet
    val got = graft.operators.Warehouse.priceSizeSkyline(spark, tiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < pp.length)
  }

  test("copurchase_lift: top-20 support/lift vs driver recompute") {
    val items = spark.read.parquet(s"$tiny/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = items.map(_._1).distinct.length.toLong
    val itemCnt = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = items.groupBy(_._1).values.flatMap { o =>
      val ps = o.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairCnt.toSeq
      .sortBy { case ((u, v), c) => (-c, u, v) }.take(20)
      .map { case ((u, v), c) =>
        (u, v, c, itemCnt(u), itemCnt(v),
          (nOrders * c * 1000000L) / (itemCnt(u) * itemCnt(v)))
      }
    val got = graft.operators.Graph.copurchaseLift(spark, tiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
  }

  test("funnel_time_bound: deadline semantics vs driver recompute") {
    val evs = graft.sources.Tables.events(spark, tiny)
      .select("user_id", "event_type", "ts_ns").collect()
      .map(r => (Option(r.get(0)).map(_.toString).orNull,
        r.getString(1), r.getLong(2)))
      .filter(_._1 != null)
    val W = 6L * 3600 * 1000000000L
    val byUser = evs.groupBy(_._1)
    val s1 = byUser.flatMap { case (u, rs) =>
      rs.filter(_._2 == "signup").map(_._3).minOption.map(u -> _) }
    val s2 = s1.flatMap { case (u, t1) =>
      byUser(u).filter(r => r._2 == "click" && r._3 > t1 && r._3 <= t1 + W)
        .map(_._3).minOption.map(u -> _) }
    val s3 = s2.flatMap { case (u, t2) =>
      byUser(u).filter(r => r._2 == "purchase" && r._3 > t2 && r._3 <= t2 + W)
        .map(_._3).minOption.map(u -> _) }
    val got = Analytics.funnelTimeBound(spark, tiny).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> s1.size.toLong, 2 -> s2.size.toLong, 3 -> s3.size.toLong))
    // the deadline must bind somewhere or the query degenerates to
    // funnel_ordered
    val unbounded = s1.flatMap { case (u, t1) =>
      byUser(u).filter(r => r._2 == "click" && r._3 > t1).map(_._3).minOption }
    assert(s2.size < unbounded.size)
  }

  test("pmi_collocations: bit-exact floor(log2) vs driver recompute") {
    def toks(text: String): Array[String] = // Dedup.tokens, driver form
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val bigrams = spark.read.parquet(s"$tiny/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .flatMap { t => val w = toks(t); w.zip(w.drop(1)) }
    val bc = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c2 = bc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = bigrams.length.toLong
    def floorLog2Ratio(num: Long, den: Long): Long = {
      val d = (64 - java.lang.Long.numberOfLeadingZeros(num)) -
        (64 - java.lang.Long.numberOfLeadingZeros(den))
      val ge = if (d >= 0) (num >> d) >= den else (num << -d) >= den
      d - 1 + (if (ge) 1 else 0)
    }
    val expect = bc.toSeq.filter(_._2 >= 5).map { case ((w1, w2), c12) =>
      (w1, w2, c12, c1(w1), c2(w2),
        floorLog2Ratio(n * c12, c1(w1) * c2(w2)))
    }.sortBy { case (w1, w2, c12, _, _, p) => (-p, -c12, w1, w2) }.take(20)
    val got = graft.operators.TextAnalysis.pmiCollocations(spark, tiny).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
  }

  test("snapshot_diff: class counts vs driver recompute; all classes live at sf0.01") {
    val evs = graft.sources.Tables.events(spark, tiny)
      .filter(col("user_id").isNotNull)
      .select("user_id", "event_type", "ts_ns", "event_id", "value", "ts")
      .withColumn("dd", dayofmonth(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        math.floor(r.getDouble(4) * 100.0 + 0.5).toLong / 5000, r.getInt(6)))
    def snap(p: Int => Boolean): Map[(Long, String), Long] =
      evs.filter(e => p(e._6)).groupBy(e => (e._1, e._2))
        .view.mapValues(_.maxBy(e => (e._3, e._4))._5).toMap
    val a = snap(_ <= 10); val b = snap(_ >= 21)
    val keys = a.keySet ++ b.keySet
    val expect = keys.toSeq.map { k =>
      (a.get(k), b.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(x), Some(y)) if x == y => "unchanged"
        case _ => "changed"
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Warehouse.snapshotDiff(spark, tiny).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)

    // the sf0.01 gate must keep all four classes populated, or the oracle
    // stops exercising part of the case analysis
    val got01 = graft.operators.Warehouse.snapshotDiff(spark, small).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got01.keySet ==
      Set("added", "removed", "changed", "unchanged"), got01.toString)
  }

  test("ann_recall_audit: hit counts == leg intersection; multiprobe never loses") {
    val ex = graft.operators.Similarity.annTopkCosine(spark, small)
      .filter(col("rank") <= 3).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val legs: Map[String, Set[(Long, Long)]] = Seq(
      "ivf_nprobe1" -> graft.operators.Similarity.annIvfTopk(spark, small),
      "ivf_nprobe2" -> graft.operators.Similarity.annIvfMultiprobe(spark, small))
      .map { case (n, df) => n -> df.select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet }.toMap
    val got = graft.operators.Similarity.annRecallAudit(spark, small).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case ((tier, q), nHit) =>
      assert(nHit == (ex & legs(tier)).count(_._1 == q), s"$tier q=$q")
    }
    val byTier = got.groupBy(_._1._1).view.mapValues(_.values.sum)
    assert(byTier("ivf_nprobe2") >= byTier("ivf_nprobe1"))
  }

  test("skew_report: per-key profile vs driver recompute") {
    def prof(rows: Seq[String]): (Long, Long, String, Long, Long) = {
      val cnts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (topK, maxC) = cnts.toSeq.minBy { case (k, n) => (-n, k) }
      (rows.size.toLong, cnts.size.toLong, topK, maxC,
        maxC * cnts.size * 1000000L / rows.size)
    }
    val ev = graft.sources.Tables.events(spark, tiny)
      .select("user_id", "event_type").collect()
    val li = spark.read.parquet(s"$tiny/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0).toString).toSeq
    val expect = Map(
      "events.user_id" -> prof(ev.toSeq.map(r => String.valueOf(r.get(0)))),
      "events.event_type" -> prof(ev.toSeq.map(_.getString(1))),
      "lineitem.l_partkey" -> prof(li))
    val got = graft.operators.Warehouse.skewReport(spark, tiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toMap
    expect.foreach { case (k, v) => assert(got(k) == v, s"mismatch for $k") }
    assert(got.contains("orders.o_custkey"))
  }

  test("pit_features: exactly one version per order; restated epochs split") {
    val hist = graft.operators.Warehouse.scd2CustomerHistory(spark, tiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    val got = graft.operators.Warehouse.pitFeatures(spark, tiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nOrders = spark.read.parquet(s"$tiny/orders.parquet").count()
    assert(got.length == nOrders, "PIT join must keep exactly one version per order")
    got.foreach { case (_, cust, epoch, version) =>
      val (from, to) = hist((cust, version))
      assert(from <= epoch && to.forall(epoch < _),
        s"version $version not valid at epoch $epoch for customer $cust")
    }
    // both epochs and both versions must actually occur
    assert(got.map(_._3).distinct.sorted.toSeq == Seq(0L, 1L))
    assert(got.map(_._4).distinct.sorted.toSeq == Seq(1L, 2L))
  }

  test("join_size_audit: estimator algebra vs driver recompute") {
    def h(k: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"js:$k".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val a = graft.sources.Tables.events(spark, tiny)
      .select(coalesce(col("user_id").cast("string"), lit("__unknown__")).as("k"))
      .collect().map(_.getString(0)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val b = spark.read.parquet(s"$tiny/orders.parquet")
      .select(col("o_custkey").cast("string")).collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val union = a.keySet ++ b.keySet
    val exact = union.toSeq.map(k => a.getOrElse(k, 0L) * b.getOrElse(k, 0L)).sum
    val sample = union.toSeq.sortBy(h).take(64)
    val kept = sample.length
    val sumProd = sample.map(k => a.getOrElse(k, 0L) * b.getOrElse(k, 0L)).sum
    val kth = h(sample.last)
    val estUnion =
      if (kept < 64) kept.toDouble else (63L << 48).toDouble / kth.toDouble
    val estJoin =
      if (kept < 64) sumProd.toDouble else sumProd.toDouble * estUnion / kept

    val r = Analytics.joinSizeAudit(spark, tiny).collect().head
    assert(r.getAs[Long]("n_union") == union.size)
    assert(r.getAs[Long]("exact_join_rows") == exact)
    assert(r.getAs[Long]("n_kept") == kept)
    assert(r.getAs[Long]("sum_prod") == sumProd)
    assert(r.getAs[Double]("est_join") == estJoin)
  }

  test("revenue_concentration: heap-selected shares vs driver recompute") {
    val rev = spark.read.parquet(s"$tiny/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (k, v) => (-v, k) }
    val n = rev.length
    val k1 = (n + 99) / 100; val k10 = (n + 9) / 10
    val total = rev.map(_._2).sum
    val r = graft.operators.Warehouse.revenueConcentration(spark, tiny)
      .collect().head
    assert(r.getAs[Long]("n_customers") == n)
    assert(r.getAs[Long]("total_cents") == total)
    assert(r.getAs[Long]("top1_n") == k1)
    assert(r.getAs[Long]("top1_cents") == rev.take(k1).map(_._2).sum)
    assert(r.getAs[Long]("top10_n") == k10)
    assert(r.getAs[Long]("top10_cents") == rev.take(k10).map(_._2).sum)
  }

  test("bpe_coverage: pair-mass curve vs driver recompute; curve strictly grows") {
    def toks(text: String): Array[String] =
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val pairs = spark.read.parquet(s"$tiny/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .flatMap { t => val w = toks(t); w.zip(w.drop(1)).map(p => s"${p._1} ${p._2}") }
    val cnts = pairs.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (k, n) => (-n, k) }
    val total = pairs.length.toLong
    val got = graft.operators.TextAnalysis.bpeCoverage(spark, tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    Seq(16, 64, 256).foreach { v =>
      val top = cnts.take(v)
      assert(got(v.toLong) == ((top.length.toLong, top.map(_._2).sum,
        total, cnts.length.toLong)), s"coverage mismatch at V=$v")
    }
    // the curve must be non-degenerate: strictly more mass at each level
    assert(got(16L)._2 < got(64L)._2 && got(64L)._2 < got(256L)._2)
  }

  test("embedding_split_drift: fixed-point centroids vs driver recompute") {
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val vecs = spark.read.parquet(s"$tiny/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray))
    def cent(vs: Seq[Array[Long]]): Array[Long] = {
      val d = vs.head.length
      (0 until d).map(j => vs.map(_(j)).sum / vs.size).toArray
    }
    val expect = vecs.groupBy(_._2).flatMap { case (label, vs) =>
      val tr = vs.filter(v => bucket(v._1) < 80).map(_._3)
      val te = vs.filter(v => bucket(v._1) >= 90).map(_._3)
      if (tr.isEmpty || te.isEmpty) None else {
        val (ct, ce) = (cent(tr.toSeq), cent(te.toSeq))
        val dot = ct.zip(ce).map { case (a, b) => a * b }.sum.toDouble
        val nt = math.sqrt(ct.map(x => x * x).sum.toDouble)
        val ne = math.sqrt(ce.map(x => x * x).sum.toDouble)
        if (nt == 0.0 || ne == 0.0) None
        else Some(label.toLong -> (tr.size.toLong, te.size.toLong,
          math.floor(dot / (nt * ne) * 1e6 + 0.5) / 1e6))
      }
    }
    val got = graft.operators.Similarity.embeddingSplitDrift(spark, tiny)
      .collect().map(r => r.getInt(0).toLong ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("dedup_threshold_curve: monotone non-increasing, knee visible, exact counts") {
    val got = graft.operators.Dedup.dedupThresholdCurve(spark, small).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(2L, 10L, 50L, 90L))
    // raising the cutoff can only drop pairs and docs
    val ordered = Seq(2L, 10L, 50L, 90L).map(got)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 >= b._1 && a._2 >= b._2)
    }
    // the low-threshold leg must actually include shared-phrase noise that
    // the production 0.8 cutoff excludes — otherwise the curve is flat and
    // prices nothing
    assert(got(2L)._1 > got(90L)._1)
    // the >= 0.9 leg equals the verified near-dup pair count (same
    // candidates, stricter test than the production 0.8)
    val strict = graft.operators.Dedup.ngramJaccard(spark, small).collect()
      .count(_.getDouble(3) >= 0.9).toLong
    assert(got(90L)._1 == strict)
  }

  test("gap_quantiles: exact rank quantiles vs driver recompute") {
    val evs = graft.sources.Tables.events(spark, tiny)
      .filter(col("user_id").isNotNull)
      .select("event_type", "user_id", "ts_ns", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = evs.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((t, _), rs) =>
        val sorted = rs.sortBy(r => (r._3, r._4)).map(_._3)
        sorted.zip(sorted.drop(1)).map { case (a, b) => (t, (b - a) / 1000000000L) }
      }.groupBy(_._1).map { case (t, gs) =>
        val s = gs.map(_._2).sorted
        val n = s.length
        t -> (n.toLong, s((n - 1) * 5 / 10), s((n - 1) * 9 / 10), s((n - 1) * 99 / 100))
      }
    val got = Analytics.gapQuantiles(spark, tiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect)
  }

  test("phash_radius_curve: monotone, r=max equals the dedup pair set") {
    val got = graft.operators.Multimodal.phashRadiusCurve(spark, small)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(0L, 4L, 8L, 10L))
    Seq(0L, 4L, 8L, 10L).map(got).sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 <= b._1 && a._2 <= b._2)
    }
    val full = graft.operators.Multimodal.phashDedup(spark, small).count()
    assert(got(10L)._1 == full)
    assert(got(10L)._1 > got(0L)._1, "curve is flat — radii price nothing")
  }

  test("lang_id_confusion: cells re-aggregate langId's own output exactly") {
    val li = graft.operators.TextAnalysis.langId(spark, small)
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = li.groupBy(identity).map { case ((t, p), rs) =>
      (t, p) -> rs.length.toLong }
    val byTrue = li.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = graft.operators.TextAnalysis.langIdConfusion(spark, small)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case ((t, p), (n, nt, share)) =>
      assert(n == expect((t, p)) && nt == byTrue(t))
      assert(share == n * 1000000L / nt)
    }
    // the audit must expose real off-diagonal mass on these fixtures
    assert(got.exists { case ((t, p), _) => t != p })
  }

  test("packing_efficiency: per-shard roll-up of the packing output") {
    val sp = graft.operators.Corpus.seqPacking(spark, small)
      .select("shard", "pack_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = sp.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((sh, _), rs) => (sh, rs.length.toLong, rs.map(_._3).sum) }
      .groupBy(_._1).map { case (sh, ps) =>
        sh -> (ps.map(_._2).sum, ps.length.toLong, ps.map(_._3).sum,
          ps.count(_._3 > graft.operators.Corpus.packBudget).toLong)
      }
    val got = graft.operators.Corpus.packingEfficiency(spark, small).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    expect.foreach { case (sh, (nd, np, tt, of)) =>
      val g = got(sh)
      assert((g._1, g._2, g._3, g._4) == ((nd, np, tt, of)), s"shard $sh")
      assert(g._5 == tt * 1000000L / (np * graft.operators.Corpus.packBudget))
    }
    assert(got.size == graft.operators.Corpus.numShards)
  }

  test("absence/pattern detectors: driver recompute of gaps and bursts") {
    val evs = graft.sources.Tables.events(spark, tiny)
      .select("user_id", "event_type", "ts_ns", "ts_sec", "event_id").collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse("__unknown__"),
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val gapNs = 24L * 3600 * 1000000000L
    val horizon = evs.map(_._3).max
    val byKey = evs.groupBy(_._1)
    val expAbs = byKey.toSeq.flatMap { case (k, rs) =>
      val s = rs.sortBy(r => (r._3, r._5)).map(_._3)
      val resumed = s.zip(s.drop(1)).collect {
        case (a, b) if b - a > gapNs =>
          (k, a / 1000000000L, Some(b / 1000000000L), (b - a) / 1000000000L)
      }
      val trail = if (horizon - s.last > gapNs)
        Seq((k, s.last / 1000000000L, None, (horizon - s.last) / 1000000000L))
      else Seq.empty
      resumed ++ trail
    }.toSet
    val gotAbs = graft.operators.Detectors.absenceAlerts(spark, tiny).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSet
    assert(gotAbs == expAbs)

    val winNs = 12L * 3600 * 1000000000L
    val expPat = byKey.toSeq.flatMap { case (k, rs) =>
      val errs = rs.filter(_._2 == "error").sortBy(r => (r._3, r._5))
      errs.drop(2).zip(errs).collect {
        case (cur, two) if cur._3 - two._3 <= winNs =>
          (k, cur._5, cur._4, (cur._3 - two._3) / 1000000000L)
      }
    }.toSet
    val gotPat = graft.operators.Detectors.patternAlerts(spark, tiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    assert(gotPat == expPat)
    assert(expAbs.nonEmpty && expPat.nonEmpty)
  }

  test("freshness_report: staleness against the corpus reference clock") {
    val r = graft.operators.Warehouse.freshnessReport(spark, tiny).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(5))).toMap
    assert(r.keySet == Set("events", "orders", "lineitem"))
    val ref = r.values.map(_._2).max
    r.foreach { case (_, (_, mx, stale)) => assert(stale == ref - mx) }
    // events carry the 2024 clock; the TPC-H-era tables are years behind
    assert(r("events")._3 == 0L)
    assert(r("orders")._3 > 0L && r("lineitem")._3 > 0L)
  }
}
