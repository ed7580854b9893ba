package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over behavior derived from the event stream.
  *
  * [[typeMarkovRank]] builds the event-type TRANSITION graph (how users
  * move between event types, the Markov chain funnel analysts reason
  * about) and ranks its nodes by PageRank — the steady-state importance
  * of each state under the random-surfer model (Page et al., 1999;
  * damping 0.85, 10 power iterations).
  *
  * Exactness contract: the entire iteration is INTEGER arithmetic.
  * Ranks live in 1e-12 fixed point (SCALE = 1e12), per-edge transition
  * probabilities in 1e-6 fixed point (`(w * 1e6) div out`), and every
  * division is integer division on non-negative operands — truncation
  * equals floor, so Spark's `div` and DuckDB's `//` agree bit-for-bit
  * with zero float ops anywhere. Dangling states (a type that never
  * precedes anything) leak their mass each round — the standard
  * simplification, identical in both engines. Overflow headroom:
  * r * p <= 1e12 * 1e6 = 1e18 < 2^63.
  *
  * Scale shape: the DATA-scale work is the transition extraction — one
  * hash exchange on user_id feeding an in-partition window `lag`, then
  * a map-combinable hash agg down to (src, dst, w). Everything after
  * runs on the AGGREGATED graph, whose size is the type-domain squared,
  * not the corpus; the 10 power iterations are tiny broadcast joins with
  * a `localCheckpoint` per round to keep the lineage flat (the same
  * iterate-on-the-reduced-set discipline as [[Corpus.dedupClusters]]).
  * The implementation never assumes the node domain is small — with a
  * URL-scale node set the same plan degrades to hash joins on `src`. */
object Graph {

  private val SCALE = 1000000000000L // 1e-12 fixed-point rank
  private val PSCALE = 1000000L      // 1e-6 fixed-point edge probability
  private val iters = 10

  /** (src, dst, w, p): observed transitions with integer edge probability. */
  private def transitionMatrix(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    val edges = ev
      .withColumn("src", lag("event_type", 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    val out = edges.groupBy("src").agg(sum("w").as("out"))
    edges.join(out, "src")
      .withColumn("p", expr(s"(w * $PSCALE) div out"))
  }

  /** PageRank of event types in the user transition graph.
    * Output: (event_type, rank_fp) with rank_fp in 1e-12 fixed point. */
  def typeMarkovRank(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts_sec"), col("event_id"))
    val p = transitionMatrix(ev).localCheckpoint()
    val nodes = ev.select(col("event_type").as("node")).distinct().localCheckpoint()

    // node-domain cardinality: a bounded driver scalar (the node set is
    // the aggregated type domain, not the corpus) feeding the teleport
    // constant — same adjudicated pattern as the IVF centroid collect
    val n = nodes.count()
    // size-gated single-task solve (guide §2.6 stage-latency removal;
    // see PageRankLocal's exactness + memory notes): the 10 rounds below
    // cost ~3 jobs each of pure latency on a broadcast-sized frame
    graft.plans.PageRankLocal.solve(p, nodes, iters, SCALE, PSCALE, n) match {
      case Some(r) =>
        return r.select(col("node").as("event_type"), col("r").as("rank_fp"))
      case None => ()
    }
    val r0 = SCALE / n
    val teleport = (15L * r0) / 100L

    var ranks = nodes.withColumn("r", lit(r0))
    for (_ <- 0 until iters) {
      val contrib = p.join(ranks, p("src") === ranks("node"))
        .select(col("dst"), expr(s"(r * p) div $PSCALE").as("ct"))
        .groupBy("dst").agg(sum("ct").as("contrib"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node").as("event_type"), col("r").as("rank_fp"))
  }

  val typeMarkovRankSql: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS ts_sec, event_id
       |  FROM events WHERE user_id IS NOT NULL
       |), s AS (
       |  SELECT event_type AS dst, lag(event_type) OVER (
       |    PARTITION BY user_id ORDER BY ts_sec, event_id) AS src
       |  FROM e
       |), ed AS (
       |  SELECT src, dst, count(*) AS w FROM s WHERE src IS NOT NULL GROUP BY 1, 2
       |), o AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY 1
       |), p AS (
       |  SELECT ed.src, ed.dst, (ed.w * $PSCALE) // o.outw AS p
       |  FROM ed JOIN o USING (src)
       |), nodes AS (
       |  SELECT DISTINCT event_type AS node FROM e
       |), nn AS (SELECT count(*) AS n FROM nodes),
       |it(i, node, r) AS (
       |  SELECT 0, node, (SELECT $SCALE // n FROM nn) FROM nodes
       |  UNION ALL
       |  SELECT i, node, r FROM (
       |    SELECT coalesce(c.i, max(c.i) OVER ()) + 1 AS i, n2.node,
       |      (SELECT (15 * ($SCALE // n)) // 100 FROM nn)
       |        + (85 * coalesce(c.contrib, 0)) // 100 AS r
       |    FROM nodes n2 LEFT JOIN (
       |      SELECT it.i AS i, p.dst, CAST(sum((it.r * p.p) // $PSCALE) AS BIGINT) AS contrib
       |      FROM it JOIN p ON it.node = p.src
       |      WHERE it.i < $iters
       |      GROUP BY 1, 2
       |    ) c ON c.dst = n2.node
       |  ) WHERE i IS NOT NULL
       |)
       |SELECT node AS event_type, CAST(r AS BIGINT) AS rank_fp
       |FROM it WHERE i = $iters""".stripMargin

  /** Frequent-path mining — the n-step companion to [[typeMarkovRank]]'s
    * 1-step chain: the 20 most common 3-step event-type journeys across
    * all user timelines (sequential pattern mining in its contiguous
    * n-gram form, the shape funnel discovery starts from).
    *
    * Scale shape: the same single user_id exchange + in-partition window
    * as the transition extraction (two `lag`s share one window sort),
    * then a map-combinable hash agg on the trigram — a key space that
    * cannot concentrate past |types|^3 — and a TakeOrdered(20), never a
    * global sort. All-integer output. */
  def frequentPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts_sec"), col("event_id"))
      .withColumn("t1", lag("event_type", 2).over(w))
      .withColumn("t2", lag("event_type", 1).over(w))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  val frequentPathsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS ts_sec, event_id
      |  FROM events WHERE user_id IS NOT NULL
      |), s AS (
      |  SELECT event_type AS t3,
      |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS t1,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS t2
      |  FROM e
      |)
      |SELECT t1, t2, t3, count(*) AS n FROM s
      |WHERE t1 IS NOT NULL AND t2 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin

  /** Triangle census of the part co-purchase graph (parts sharing an
    * order), the market-basket structure metric: triangles vs wedges
    * (the global clustering coefficient) separates genuine product
    * communities from hub-and-spoke noise.
    *
    * Scale shape — the two classic blowups are both bounded:
    *  - Edge generation fans out per order, and order size is bounded by
    *    the schema (<= 13 line items here), so candidate pairs are
    *    O(rows), never quadratic in the catalog.
    *  - Triangle enumeration uses DEGREE ORDERING (Chiba-Nishizeki; the
    *    MapReduce form is Suri-Vassilvitskii 2011): every edge is
    *    oriented from its lower (degree, id) endpoint to the higher, so
    *    a star of degree d contributes wedges only at its CENTER's
    *    out-degree, which degree-ordering caps at O(sqrt(E)) — the
    *    celebrity-product hub that breaks the naive wedge join is
    *    exactly the node whose edges all orient OUTWARD from its
    *    low-degree neighbors. Wedges then probe the oriented edge set
    *    once (b < c in orientation order means a closing edge can only
    *    be (b, c)), three hash joins on packed BIGINT keys.
    * The (degree, id) order is packed as deg * 2^32 + id: one sortable
    * long, exact in both engines (deg <= |parts| < 2^31, id < 2^32). */
  /** The distinct co-purchase edge set — exposed for the plan invariant
    * (the per-order pair fan-out must plan as an equi-join on l_orderkey,
    * never a nested loop). */
  private[graft] def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    items.as("a").join(items.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().localCheckpoint()
  }

  def copurchaseTriangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    // deg is the PART domain, orders of magnitude smaller than the edge
    // set: eager it once — it feeds the two orientation joins AND the
    // node/edge/wedge census below (previously three separate jobs).
    val deg = Dedup.eager(
      edges.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg")))
    val nNodes = deg.count() // cached-block scan; also the broadcast gate
    // broadcast the PART-domain degree table into the two orientation
    // joins (guide §3.1) below spark.graft.triangles.broadcastDegRows
    // (2-long rows; the 4M default builds a ~250 MB relation, conf'd for
    // bigger catalogs; 0 disables): the edge set then never shuffles to
    // get keyed. The EDGE set itself stays on shuffle-hash joins for the
    // wedge fan-out + semi probe — broadcasting it was tried and is
    // SLOWER at sf0.1 (A/B: 5.8 s vs 4.6 s solo min): two single-threaded
    // 2M-row driver builds plus a one-stage probe whose parallelism is
    // the checkpoint's block count lose more than the 60M-wedge exchange
    // costs, exactly guide §1.1's "ideal plan loses to a gotcha" loop.
    val bcastRows = spark.conf
      .get("spark.graft.triangles.broadcastDegRows", "4000000").toLong
    val degJ =
      if (nNodes <= bcastRows && bcastRows > 0) broadcast(deg) else deg
    val keyed = edges
      .join(degJ.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(degJ.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        (shiftleft(col("du"), 32) + col("u")).as("ku"),
        (shiftleft(col("dv"), 32) + col("v")).as("kv"))
    val oriented = keyed
      .select(least(col("ku"), col("kv")).as("src"),
        greatest(col("ku"), col("kv")).as("dst"))
      .localCheckpoint()
    // shuffle-hash hints: the wedge fan-out (~30x the edge count) makes
    // sort-merge's two 10^7-row sorts the dominant cost; hash joins on
    // packed longs skip them (r16 measurement, re-confirmed by the r18
    // A/B above)
    val wedges = oriented.as("e1").hint("shuffle_hash")
      .join(oriented.as("e2"), "src")
      .filter(col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
    val triangles = wedges.join(oriented.as("e3").hint("shuffle_hash"),
      col("b") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")

    // Census in ONE aggregation pass over the eager'd degree table
    // (guide §2.3 — previously nodes/edges/wedges were three independent
    // jobs): n_edges = sum(deg)/2 exactly (every edge contributes its two
    // distinct endpoints), wedges = sum C(deg, 2). The heavy triangle
    // count overlaps it on a driver thread (§2.6) so the census rides the
    // probe stage's tail instead of serializing after it.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val nTriF = Future(triangles.count())
    val census = deg.agg(
      sum(col("deg")).as("sd"),
      sum(expr("deg * (deg - 1) div 2")).as("nw")).head
    val nEdges = census.getLong(0) / 2L
    val nWedges = census.getLong(1)
    val nTri = Await.result(nTriF, Duration.Inf)
    import spark.implicits._
    Seq((nNodes, nEdges, nWedges, nTri))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
      .withColumn("closure_rate", // 3*tri/wedges: exact-operand IEEE division
        lit(3L).cast("double") * col("n_triangles").cast("double") /
          col("n_wedges").cast("double"))
  }

  // MATERIALIZED on every multiply-referenced CTE: DuckDB inlines CTEs by
  // default, so `oriented` (referenced 3x: both wedge legs + the EXISTS
  // probe) was re-derived per reference and the optimizer lost the shared
  // hash build — at sf1 the un-hinted form spilled >60 GB of temp and did
  // not finish in 25 min; hinted it completes in ~137 s. Same failure
  // mode (and same fix) as copurchaseLiftSql's support joins below.
  val copurchaseTrianglesSql: String =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), edges AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), deg AS MATERIALIZED (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
      |  GROUP BY 1
      |), keyed AS (
      |  SELECT (du.deg * 4294967296 + e.u) AS ku,
      |         (dv.deg * 4294967296 + e.v) AS kv
      |  FROM edges e
      |  JOIN deg du ON du.node = e.u
      |  JOIN deg dv ON dv.node = e.v
      |), oriented AS MATERIALIZED (
      |  SELECT least(ku, kv) AS src, greatest(ku, kv) AS dst FROM keyed
      |), tri AS (
      |  SELECT count(*) AS n_triangles FROM (
      |    SELECT e1.dst AS b, e2.dst AS c
      |    FROM oriented e1 JOIN oriented e2
      |      ON e1.src = e2.src AND e1.dst < e2.dst) w
      |  WHERE EXISTS (SELECT 1 FROM oriented e3
      |    WHERE e3.src = w.b AND e3.dst = w.c)
      |), c AS (
      |  SELECT (SELECT count(*) FROM deg) AS n_nodes,
      |    (SELECT count(*) FROM edges) AS n_edges,
      |    (SELECT sum(deg * (deg - 1) // 2) FROM deg) AS n_wedges,
      |    (SELECT n_triangles FROM tri) AS n_triangles
      |)
      |SELECT n_nodes, n_edges, CAST(n_wedges AS BIGINT) AS n_wedges, n_triangles,
      |  3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
      |    AS closure_rate
      |FROM c""".stripMargin

  /** Association mining over the same basket graph as
    * [[copurchaseTriangles]]: the 20 strongest part pairs by co-purchase
    * support, each with its LIFT — support(u,v) / (support(u) *
    * support(v)) — the measure that separates "bought together because
    * both are popular" (lift ≈ 1) from genuine association (lift >> 1).
    *
    * Exactness: lift is the 1e-6 fixed point integer
    * (n_orders * c_uv * 1e6) div (c_u * c_v) — one integer division,
    * both engines truncate identically; headroom c_u * c_v < 2^31 * 2^31
    * and the numerator stays under 2^63 for any corpus where a pair
    * count fits in 32 bits (at larger scale you'd shift to 1e-4). The
    * headroom bound is ENFORCED, not assumed: Spark's long `*` wraps
    * silently, so a `raise_error` guard fails the job loudly once
    * n_orders * c_uv would exceed 2^63/1e6 (~9.2e12 — e.g. 1.5e8 orders
    * with a pair support above ~61k); DuckDB's checked BIGINT multiply
    * already errors on its own.
    *
    * Shape: pair counts come from the same bounded per-order fan-out
    * (never quadratic in the catalog); item supports are one
    * map-combinable agg; the pair-to-support join is two hash joins on
    * part keys; final ranking is TakeOrdered(20), no global sort. */
  def copurchaseLift(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairCnt = items.as("a").join(items.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("c_uv"))
    val itemCnt = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val n = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    pairCnt
      .join(itemCnt.select(col("l_partkey").as("u"), col("c").as("c_u")), "u")
      .join(itemCnt.select(col("l_partkey").as("v"), col("c").as("c_v")), "v")
      .crossJoin(broadcast(n))
      .withColumn("lift_fp",
        expr("""CASE WHEN c_uv > (9223372036854775807 div 1000000) div n_orders
                THEN raise_error(concat('copurchase_lift: lift_fp 1e-6 ',
                  'fixed point would overflow int64 (n_orders * c_uv > ',
                  '2^63/1e6); shift the scale to 1e-4'))
                ELSE (n_orders * c_uv * 1000000) div (c_u * c_v) END"""))
      .select("u", "v", "c_uv", "c_u", "c_v", "lift_fp")
      .orderBy(col("c_uv").desc, col("u"), col("v"))
      .limit(20)
  }

  // the two support joins are forced SEQUENTIAL via materialized CTEs:
  // left free, DuckDB's optimizer cross-products ic x ic (support table
  // squared — 3.6e11 rows at sf1) and hash-joins the pair table on both
  // keys at once; measured: 70+ min vs ~2 s for the chained form
  val copurchaseLiftSql: String =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), pc AS (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS c_uv
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |), ic AS MATERIALIZED (
      |  SELECT l_partkey, count(*) AS c FROM items GROUP BY 1
      |), n AS (
      |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
      |), j1 AS MATERIALIZED (
      |  SELECT pc.u, pc.v, pc.c_uv, ic.c AS c_u
      |  FROM pc JOIN ic ON ic.l_partkey = pc.u
      |), j2 AS MATERIALIZED (
      |  SELECT j1.u, j1.v, j1.c_uv, j1.c_u, ic.c AS c_v
      |  FROM j1 JOIN ic ON ic.l_partkey = j1.v
      |)
      |SELECT j2.u, j2.v, j2.c_uv, j2.c_u, j2.c_v,
      |  (n.n_orders * j2.c_uv * 1000000) // (j2.c_u * j2.c_v) AS lift_fp
      |FROM j2 CROSS JOIN n
      |ORDER BY j2.c_uv DESC, j2.u, j2.v LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "type_markov_rank" -> (typeMarkovRank _),
    "frequent_paths" -> (frequentPaths _),
    "copurchase_triangles" -> (copurchaseTriangles _),
    "copurchase_lift" -> (copurchaseLift _),
  )

  val oracles: Map[String, String] = Map(
    "type_markov_rank" -> typeMarkovRankSql,
    "frequent_paths" -> frequentPathsSql,
    "copurchase_triangles" -> copurchaseTrianglesSql,
    "copurchase_lift" -> copurchaseLiftSql,
  )
}
