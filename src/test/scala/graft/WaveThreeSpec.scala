package graft

import graft.operators.{Analytics, Linkage, Similarity, Warehouse}
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-10 third wave: CDC compaction, Z-order
  * layout, k-anonymity, EWMA spikes, the k-NN graph, and record linkage.
  * Each test checks the operator against an INDEPENDENT driver-side
  * recompute on the tiny fixture (or a structural invariant the
  * DuckDB oracle cannot express, e.g. the Z-tile envelope bound). */
class WaveThreeSpec extends SparkSpec {

  private val tiny = "/root/testdata/sf0.001"
  private val small = "/root/testdata/sf0.01"

  test("changelog_compact: latest-wins per key, tombstoned keys absent") {
    val events = graft.sources.Tables.events(spark, tiny)
      .select("user_id", "event_id", "event_type", "ts_ns")
      .collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse("__unknown__"),
        r.getLong(1), r.getString(2), r.getLong(3)))
    // independent recompute: max (ts_ns, event_id) per key, drop 'error'
    val expect = events.groupBy(_._1).map { case (k, rs) =>
      val last = rs.maxBy(r => (r._4, r._2))
      k -> last
    }.filter(_._2._3 != "error").map { case (k, r) => (k, r._2, r._3) }.toSet

    val got = Warehouse.changelogCompact(spark, tiny)
      .select("key", "event_id", "event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expect)
    assert(got.forall(_._3 != "error"))
  }

  test("zorder_layout: every file's envelope fits a 16x16 tile of the grid") {
    val rows = Warehouse.zorderLayout(spark, small).collect()
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == spark.read.parquet(s"$small/events.parquet").count())
    rows.foreach { r =>
      // z >> 8 fixes the top 4 bits of BOTH dimensions: 16-wide spans.
      // A linear layout bounds one dimension and leaves the other at 256.
      assert(r.getAs[Long]("bx_max") - r.getAs[Long]("bx_min") <= 15,
        s"bx span leaked past the tile in file ${r.getAs[Long]("file_id")}")
      assert(r.getAs[Long]("by_max") - r.getAs[Long]("by_min") <= 15,
        s"by span leaked past the tile in file ${r.getAs[Long]("file_id")}")
    }
  }

  test("k_anonymity_audit: lattice monotonicity and the fully-suppressed root") {
    val rows = Warehouse.kAnonymityAudit(spark, small).collect()
      .map(r => r.getAs[Long]("lvl") ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("min_class"),
          r.getAs[Long]("rows_below_k"))).toMap
    assert(rows.keySet == Set(0L, 1L, 3L))
    val n = spark.read.parquet(s"$small/customer.parquet").count()
    // root: one class holding everyone — always k-anonymous at this size
    assert(rows(3L)._1 == 1L && rows(3L)._2 == n && rows(3L)._3 == 0L)
    // generalizing can only merge classes: fewer classes, larger minimum,
    // no more exposed rows
    assert(rows(1L)._1 <= rows(0L)._1 && rows(3L)._1 <= rows(1L)._1)
    assert(rows(1L)._2 >= rows(0L)._2 && rows(1L)._3 <= rows(0L)._3)
  }

  test("ewma_anomaly: exact 20-lag geometric sum vs driver recompute") {
    val got = Analytics.ewmaAnomaly(spark, tiny)
      .select("key", "event_id", "v_cents", "ewma_num", "ewma_w", "is_spike")
      .collect()
      .map(r => r.getLong(1) -> (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap

    val byKey = graft.sources.Tables.events(spark, tiny)
      .filter(col("value").isNotNull)
      .select("user_id", "event_id", "ts_ns", "value").collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse("__unknown__"),
        r.getLong(1), r.getLong(2), math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
      .groupBy(_._1)

    var checked = 0
    byKey.foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2)).map(r => (r._2, r._4))
      ordered.zipWithIndex.foreach { case ((id, v), i) =>
        val lags = ordered.slice(math.max(0, i - 20), i).reverse.map(_._2)
        val num = lags.zipWithIndex.map { case (x, j) => x << (19 - j) }.sum
        val w = lags.indices.map(j => 1L << (19 - j)).sum
        val (_, gv, gnum, gw, spike) = got(id)
        assert(gv == v && gnum == num && gw == w, s"event $id")
        assert(spike == (w > 0 && v * w > 3 * num), s"spike flag for $id")
        checked += 1
      }
    }
    assert(checked == got.size && checked > 0)
  }

  test("knn_graph: at most 3 directed edges per source, no self loops, ranked") {
    val edges = Similarity.knnGraph(spark, small)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Double]("sim_r")))
    assert(edges.nonEmpty)
    assert(edges.forall { case (s, d, _) => s != d })
    edges.groupBy(_._1).foreach { case (src, es) =>
      assert(es.length <= 3, s"src $src has ${es.length} edges")
      // the kept edges must be the best of themselves: descending sim
      val sims = es.sortBy(e => (-e._3, e._2)).map(_._3).toSeq
      assert(sims.sorted(Ordering[Double].reverse) == sims)
    }
    // the graph covers (nearly) every indexed vector: sources with any
    // same-cell companion get edges; an empty cell would be a train bug
    val nVecs = spark.read.parquet(s"$small/embeddings.parquet").count()
    assert(edges.map(_._1).distinct.length >= (nVecs * 0.9).toInt)
  }

  test("entity_matches: known-truth recovery on the deterministic typo corpus") {
    val rows = Linkage.entityMatches(spark, small).collect()
      .map(r => (r.getAs[Long]("dirty_key"), r.getAs[Long]("matched_key"),
        r.getAs[Int]("lev_dist"), r.getAs[Boolean]("self_match")))
    val n = spark.read.parquet(s"$small/customer.parquet").count()
    // one resolved row per linked dirty record
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(_._3 <= 2))
    // a single deletion is lev 1 from its origin, so any self match is 1
    rows.filter(_._4).foreach { case (_, _, d, _) => assert(d == 1) }
    // ground truth: >90% of records link. Recovery is ~81%, not ~100%,
    // because a single digit deletion is often genuinely ambiguous: the
    // typo for key 1234 ("…00001234" minus the '1') restores to BOTH
    // 1234 (reinsert '1') and 234 (insert '0' at the front) at lev 1,
    // and the deterministic min-key tie-break picks the rival. The
    // linkage is optimal under its distance; the corpus is ambiguous.
    assert(rows.length >= (n * 0.9).toInt, s"only ${rows.length} of $n linked")
    val correct = rows.count(_._4)
    assert(correct >= (rows.length * 0.75).toInt,
      s"only $correct of ${rows.length} links correct")
  }
}
