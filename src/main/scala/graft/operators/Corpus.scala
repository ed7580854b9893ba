package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the steps between "per-document analysis"
  * and "training shards" in an LLM data pipeline: duplicate CLUSTER
  * assignment (near-dup pairs are only half the job; picking one keeper
  * per connected component is what actually shrinks the corpus),
  * deterministic train/val/test splitting, and token-budget sequence
  * packing.
  *
  * Scale design (100 TB posture):
  *  - Cluster assignment is iterative min-label propagation over the
  *    duplicate edge graph: every step is an equi-join + groupBy on ids
  *    (hash-partitionable, no driver state), and each iteration ends in
  *    `localCheckpoint()` so lineage — and with it task-binary size —
  *    stays O(1) in the iteration count instead of O(iters). Each round
  *    combines a neighbor-min step with a pointer-jumping step (adopt
  *    the label of your label), so convergence needs O(log diameter)
  *    rounds — the cap of 20 covers chain components ~2^20 long, far
  *    beyond any duplicate graph (dup components are near-cliques).
  *  - Only docs that appear in some edge enter the loop; the (vastly
  *    larger) singleton population joins back in one final left join.
  *  - The split is a pure stateless hash of doc_id: no shuffle, no
  *    sampling pass, reproducible across runs/engines, and stable under
  *    corpus growth (a doc's split never depends on other docs).
  *  - Packing uses a shard-local cumulative sum: partitioned windows run
  *    one task per shard (here 32 shards stand in for O(cluster-cores)),
  *    unlike a single global running sum which would serialize on one
  *    task at 100 TB.
  *
  * Determinism: cluster ids are component-min doc_ids (fixpoint is
  * iteration-order independent); split buckets are md5-derived; packing
  * sums integers.
  */
object Corpus {

  // ---------------------------------------------------- dedup clusters

  /** Label-propagation round cap. Each round combines neighbor-min with a
    * pointer-jump whose lookup table is HALF A ROUND STALE (see the loop
    * comment), so chains shrink multiplicatively but slower than true
    * doubling — r13 measured a dense-URL sf1 crossmodal stress graph
    * (every doc in a URL star-triple, triples chained through text-dup
    * families — a path-of-stars shape real crawl graphs produce too)
    * needing >20 rounds where the near-clique text graphs converged in
    * <6. 40 rounds covers that shape with the same
    * O(log diameter) cost per the loop's own argument; the cap only
    * binds when the loop has NOT converged, so raising it never slows a
    * converged query. */
  private val maxIters = 40

  /** Duplicate edges: exact-dup (keeper, dup) pairs plus verified n-gram
    * Jaccard near-dup pairs over canonical docs. */
  private def dupEdges(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(md5(col("text")))
    val exactEdges = docs
      .withColumn("keeper", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("keeper").as("d1"), col("doc_id").as("d2"))
    val nearEdges = Dedup.ngramJaccard(spark, dir).select("d1", "d2")
    exactEdges.union(nearEdges)
  }

  /** Eager lineage-truncating materialization that, unlike
    * `Dataset.localCheckpoint()`, hands back the RDD whose blocks store
    * the data — `Dataset.unpersist()` is a no-op on a checkpointed frame
    * (the blocks are RDD-level, not cache-manager entries), so without the
    * handle every propagation round's label table would stay pinned in the
    * block manager for the life of the session.
    *
    * `countIf` piggybacks a predicate count on the materialization job
    * (via accumulator), so the propagation loop's convergence check costs
    * ZERO extra jobs — previously each round ran the materializing count
    * AND a changed-rows job over the checkpointed result. Accumulator
    * semantics are safe here: the value is only ever compared to 0, and a
    * task retry can only over-count a NONZERO round (a truly converged
    * round has nothing to add twice). */
  private def ckpt(df: DataFrame, countIf: org.apache.spark.sql.Row => Boolean = null)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], Long) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    val matched =
      if (countIf == null) { rdd.count(); 0L }
      else {
        val acc = df.sparkSession.sparkContext.longAccumulator("graft.ckpt.countIf")
        val pred = countIf
        rdd.foreach(r => if (pred(r)) acc.add(1L))
        acc.value.longValue()
      }
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd, matched)
  }

  /** Path-compressed union-find over one partition's (d1, d2) edge
    * rows: closes the components of exactly the edges it sees and emits
    * one (node, local root) star row per node, root = the component's
    * MINIMUM member id (union always hangs the larger root under the
    * smaller). Used twice by [[componentsWithRdd]]: per-partition as the
    * pre-loop contraction, and — when the contracted forest passes the
    * size gate — on the coalesced whole as the exact single-task solve. */
  /** Primitive open-addressing long->long parent table (linear probing,
    * power-of-two capacity, max load 0.5, doubling growth): 16 bytes per
    * SLOT, 32 bytes per live entry at worst-case load — so the single
    * local-solve task at the 4M-row gate holds <= 4M nodes in a 2^23-slot
    * table = 128 MB, measured with jcmd GC.class_histogram (two 8M-long
    * arrays; see the gate comment below). The boxed java.util.HashMap
    * form this replaces cost ~100 bytes/entry in Long boxes + Node
    * objects (r17 VERDICT #2: the gate's "64 MB" claim was ~8x under). */
  private final class ParentTable(initSlots: Int) {
    private val EMPTY = Long.MinValue // never a doc_id: ids come from
    // non-negative fixture keys or packed (deg<<32|id) longs; a MinValue
    // key would need deg = -2^31, impossible for a count
    private var cap = Integer.highestOneBit(math.max(initSlots, 64) - 1) << 1
    private var keys = Array.fill[Long](cap)(EMPTY)
    private var vals = new Array[Long](cap)
    private var n = 0
    def size: Int = n
    private def slot(k: Long): Int = {
      // finalizer from splitmix64: full-long avalanche so packed
      // (deg<<32|id) keys don't cluster in the low bits
      var h = k * -7046029254386353131L
      h ^= (h >>> 32)
      var i = (h & (cap - 1)).toInt
      while (keys(i) != EMPTY && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    /** parent of k, or k's absence signalled as Long.MinValue. */
    def get(k: Long): Long = {
      val i = slot(k)
      if (keys(i) == EMPTY) EMPTY else vals(i)
    }
    def put(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (keys(i) == EMPTY) {
        keys(i) = k; vals(i) = v; n += 1
        if (n * 2 > cap) grow()
      } else vals(i) = v
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap <<= 1
      keys = Array.fill[Long](cap)(EMPTY)
      vals = new Array[Long](cap)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != EMPTY) put(ok(i), ov(i))
        i += 1
      }
    }
    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < keys.length) { if (keys(i) != EMPTY) f(keys(i)); i += 1 }
    }
  }

  private def unionFindStars(it: Iterator[(Long, Long)])
      : Iterator[(Long, Long)] = {
    val parent = new ParentTable(1024)
    val EMPTY = Long.MinValue
    def find(x: Long): Long = {
      var r = x
      var p = parent.get(r)
      while (p != EMPTY && p != r) { r = p; p = parent.get(r) }
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    it.foreach { case (a, b) =>
      if (parent.get(a) == EMPTY) parent.put(a, a)
      if (parent.get(b) == EMPTY) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      parent.size)
    parent.foreachKey(k => out += ((k, find(k))))
    out.iterator
  }

  /** Connected components of an undirected graph given as (d1, d2) edge
    * rows: returns (doc_id, cluster_id) for every node that appears in
    * an edge, where cluster_id is the component's minimum node id.
    * Min-label propagation; see the scaladoc above for the scale
    * rationale.
    *
    * Lifetime note: the returned frame is backed by the FINAL round's
    * locally-checkpointed RDD, so its blocks stay pinned in the block
    * manager until the caller's last action over the result — by design
    * (the lineage was truncated; dropping the blocks would make the
    * result unrecomputable, not merely slow). */
  def components(e0: DataFrame): DataFrame = componentsWithRdd(e0)._1

  /** [[components]] plus the final round's checkpointed RDD handle — the
    * cache layer validates block availability against it on every serve. */
  private[operators] def componentsWithRdd(e0: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val spark = e0.sparkSession
    import spark.implicits._
    // Per-partition union-find CONTRACTION before the global loop: each
    // task closes the components of ITS OWN edge slice (path-compressed
    // union-find, min member as root) and emits one (node, local root)
    // star edge per node it saw. Replacing a partition's edges with its
    // local spanning star preserves global connectivity exactly — any
    // original edge (u, v) got both endpoints attached to one local root
    // — while collapsing every intra-partition chain to diameter <= 2,
    // so the propagation rounds below only pay for CROSS-partition
    // structure, and the star rows are never more numerous than the
    // edge rows (at scale: shuffle the contracted forest, not the raw
    // edge list — the map-side-combine shape of guide §2.3 applied to
    // connectivity). At fixture scale the measured round win is on the
    // chain-heavy pHash graph (17 -> 14 with the seeded init + second
    // jump below); the fixture's cross-partition chains bound the rest.
    // The roots are component MINIMA, so the node set and the
    // component-min labels are bit-identical to the uncontracted loop.
    // coalesce before contracting: the channel edge builds arrive as a
    // UNION of per-channel subplans (129 cached partitions at sf0.1 for
    // the crossmodal set), and tiny-task overhead, not data, dominated
    // the scan; coalesce to the session's parallelism is narrow (no
    // shuffle) and a no-op when the input already has fewer partitions
    val par = spark.sparkContext.defaultParallelism
    val star = e0.select(col("d1").cast("long"), col("d2").cast("long"))
      .as[(Long, Long)]
      .coalesce(par)
      .mapPartitions(unionFindStars)
      .toDF("d1", "d2")
    // symmetrize in ONE pass over the star rows (explode, not a
    // self-union — the union form evaluated the upstream edge plan twice)
    val edges = Dedup.eager(
      star.select(explode(array(
          struct(col("d1").as("src"), col("d2").as("dst")),
          struct(col("d2").as("src"), col("d1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct())
    // Size-gated single-task solve — the broadcast-hash-join decision
    // applied to connectivity: the contracted, symmetrized forest is
    // already materialized and counted, and when it fits the same order
    // of memory a broadcast relation would, ONE task closes it exactly
    // with the same union-find. Memory at the gate (r17 VERDICT #2 made
    // the old boxed-HashMap claim honest): the solve runs on the
    // primitive open-addressing ParentTable — 16 B/slot, power-of-two
    // sizing at load <= 0.5 — so the default 4M rows (<= 4M distinct
    // nodes) cost 128 MB steady / 256 MB at the worst-case doubling
    // boundary in the one task, broadcast-relation order for real
    // (`spark.graft.cc.localSolveRows`, 0 disables) — 3 stages total
    // instead of ~6 per propagation round for 10-17 rounds (the
    // measured stage-latency cost that dominated every closure query's
    // wall time at the gate SFs). Past the gate the propagation loop
    // below is the general, spill-free path, exactly like a sort-merge
    // join past the broadcast threshold. Labels are identical by
    // construction: both paths emit (node, component-min) over the
    // same node set.
    val localSolveRows = spark.conf
      .get("spark.graft.cc.localSolveRows", "4000000").toLong
    if (edges.count() <= localSolveRows) {
      val (lab, labRdd, _) = ckpt(
        edges.select(col("src"), col("dst")).as[(Long, Long)]
          .coalesce(1)
          .mapPartitions(unionFindStars)
          .toDF("doc_id", "cluster_id"))
      edges.unpersist()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println("[components] closed by single-task solve")
      return (lab, labRdd)
    }
    // initial labels = the contraction's local roots (min surviving root
    // per node across partitions), not self-labels: nodes whose component
    // lives in one partition start CONVERGED, and chain nodes start
    // several hops ahead. Node set is identical to distinct(src) — every
    // endpoint emitted exactly its star row(s).
    var (lab, labRdd, _) = ckpt(
      star.groupBy(col("d1").as("doc_id"))
        .agg(min(col("d2")).as("cluster_id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges.join(lab, edges("dst") === lab("doc_id"))
        .groupBy("src").agg(min("cluster_id").as("nbr"))
      // carry the previous label through the join so convergence is a
      // filter over the checkpointed result, not another join+shuffle
      val prop = lab.join(nbrMin, lab("doc_id") === nbrMin("src"), "left")
        .select(lab("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr"), col("cluster_id")))
            .as("cluster_id"),
          col("cluster_id").as("prev"))
      // pointer jumping: also adopt the label OF the current label
      // (labels are always component-member ids, so the lookup always
      // resolves) — chains shrink multiplicatively, so convergence needs
      // O(log diameter) rounds. The lookup table is LAB (last round's
      // checkpointed labels), not prop: prop is referenced once so the
      // neighbor-min join isn't recomputed, and a half-round-stale jump
      // target is still monotone-decreasing toward the same fixpoint —
      // but HALF A ROUND STALE, so the shrink factor is below true
      // doubling and the cap must NOT be sized as log2(diameter); see
      // the maxIters scaladoc for the measured path-of-stars case that
      // needed >20 rounds.
      // the changed-row count rides the materialization job (columns:
      // doc_id, cluster_id, prev)
      val j1 = prop.as("x")
        .join(lab.select(col("doc_id").as("cid"), col("cluster_id").as("cl2")),
          col("x.cluster_id") === col("cid"), "left")
        .select(col("x.doc_id"),
          least(col("x.cluster_id"), coalesce(col("cl2"), col("x.cluster_id")))
            .as("cluster_id"),
          col("x.prev").as("prev"))
      // second stale jump: one more cheap label-keyed join per round buys
      // another chain step per round (measured: the chain-heavy pHash
      // edge set converges in 14 rounds instead of 17; the crossmodal
      // set stays at 10 — its rounds are star-alternation-bound, not
      // chain-bound). Each round is a whole join+ckpt cycle, so a
      // removed round beats the one extra broadcast-sized join.
      val (next, nextRdd, changed) = ckpt(j1.as("y")
        .join(lab.select(col("doc_id").as("cid2"), col("cluster_id").as("cl3")),
          col("y.cluster_id") === col("cid2"), "left")
        .select(col("y.doc_id"),
          least(col("y.cluster_id"), coalesce(col("cl3"), col("y.cluster_id")))
            .as("cluster_id"),
          col("y.prev").as("prev")),
        countIf = r => r.getLong(1) != r.getLong(2))
      // ckpt materialized `next`, so last round's blocks are now dead.
      // INVARIANT (do not reorder): unpersisting a locally-checkpointed
      // RDD destroys its ONLY copy — lineage is truncated, recompute is
      // impossible — so this unpersist is safe strictly BECAUSE ckpt's
      // materializing action fully evaluated `next` first, and nothing may
      // touch the old `lab`/`labRdd` after this line.
      labRdd.unpersist(blocking = false)
      converged = changed == 0L
      lab = next.select("doc_id", "cluster_id")
      labRdd = nextRdd
      iter += 1
    }
    require(converged, s"label propagation did not converge in $maxIters rounds")
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[components] converged in $iter rounds")
    edges.unpersist()
    (lab, labRdd)
  }

  /** Memoized cluster labels per (session, dir): `dedup_clusters` and
    * `dedup_canonical` are registered as separate queries but share the
    * same expensive substrate (edge build + propagation loop — the
    * single largest fixed cost in the bench). The labels frame is backed
    * by the final round's locally-checkpointed RDD, so re-serving it is
    * a block-manager read, not a recompute; at 100 TB this is exactly
    * "persist the labels table once, join against it everywhere".
    *
    * Lifecycle (ADVICE r6): [[graft.util.SessionCache]] keys by session
    * UUID (never the session object — a stopped session is not retained),
    * drops the session's entries on application end, and revalidates on
    * every serve that the checkpointed RDD's blocks are still all present
    * (`getRDDStorageInfo`) — lineage is truncated, so after executor loss
    * the cached frame is unrecomputable and must be REBUILT, not served. */
  private val labelCache = new graft.util.SessionCache[
      (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])](
    valid = (spark, v) => graft.util.Ckpt.blocksPresent(spark, v._2),
    dispose = v => v._2.unpersist(blocking = false))

  private def clusterLabels(spark: SparkSession, dir: String): DataFrame =
    labelCache.get(spark, dir)(componentsWithRdd(dupEdges(spark, dir)))._1

  /** One cluster id (the smallest doc_id in the connected component of
    * the duplicate graph) per document; singletons cluster to themselves.
    * `is_keeper` marks the one row per cluster a dedup pass would keep. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val lab = clusterLabels(spark, dir)
    Tables.documents(spark, dir).select("doc_id")
      .join(lab, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "is_keeper")
  }

  /** Oracle: transitive closure by recursive CTE — min reachable id is
    * the component min, same fixpoint the Spark loop converges to. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${Dedup.jaccardPairsCtes},
       |ex AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS d1,
       |      doc_id AS d2
       |    FROM documents
       |  ) WHERE d1 <> d2
       |),
       |e0 AS (SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM ex),
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM e0
       |  UNION SELECT d2, d1 FROM e0
       |),
       |reach(doc_id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
       |),
       |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
       |  d.doc_id = coalesce(cl.cluster_id, d.doc_id) AS is_keeper
       |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id""".stripMargin

  /** B-Cubed clustering audit (Amigó et al. 2009 — the standard
    * extrinsic clustering metric) of the LSH-derived dedup clustering
    * against the exhaustive-Jaccard reference clustering: both use the
    * SAME exact-text edges and the same verification threshold, so the
    * score isolates exactly what the sketch changes — candidate pairs the
    * banding never surfaces. Per-item precision = |C(i)∩L(i)|/|C(i)|,
    * recall = |C(i)∩L(i)|/|L(i)|, averaged over items; because LSH
    * candidates are exact-verified before pairing, C refines L and
    * B-Cubed PRECISION must read 1.0 — the audit's built-in invariant —
    * while RECALL prices the banding's missed pairs at cluster level
    * (pair-level misses are [[Dedup.minhashAccuracy]]'s job; an item in
    * a split cluster hurts every co-member, which only the cluster-level
    * view shows).
    *
    * Exactness: per-cell contributions n_cl²·1e9/n_c are exact integer
    * floor-divisions summed as BIGINTs, then one floor per aggregate —
    * identical both engines. BIGINT headroom: the per-cell term
    * n_cl²·1e9 overflows signed 64-bit once a single (c_id, l_id) cell
    * exceeds ~3.03M documents (sqrt(2^63/1e9)); Spark 4 ANSI and DuckDB
    * both fail LOUDLY there (hard stop, never silent corruption). A
    * dedup cell that large means >3M byte-identical or near-identical
    * docs share one cluster — past that, re-quantize the score at 1e-3
    * (headroom ~3.0B docs/cell) or switch the two fp columns to doubles
    * and accept last-ulp divergence, the same trade documented on
    * [[graft.operators.TextAnalysis.knPerplexity]] and
    * [[lengthMatchSample]]. Shape: two component closures over
    * pair-edge sets (the reference labels are the memoized
    * [[dedupClusters]] substrate; the LSH closure reuses
    * [[components]]), then three bucket-sized hash aggregates — the
    * corpus-scale work is the pair generation both clusterings already
    * share. */
  def dedupBcubed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(md5(col("text")))
    val exactEdges = docs
      .withColumn("keeper", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("keeper").as("d1"), col("doc_id").as("d2"))
    val refLab = clusterLabels(spark, dir)
      .withColumnRenamed("cluster_id", "l_id")
    val lshLab = components(
        exactEdges.union(Dedup.minhashLsh(spark, dir).select("d1", "d2")))
      .withColumnRenamed("cluster_id", "c_id")
    val a = docs.select("doc_id")
      .join(refLab, Seq("doc_id"), "left")
      .join(lshLab, Seq("doc_id"), "left")
      .withColumn("l_id", coalesce(col("l_id"), col("doc_id")))
      .withColumn("c_id", coalesce(col("c_id"), col("doc_id")))
    val cells = a.groupBy("c_id", "l_id").agg(count(lit(1)).as("n_cl"))
    val nc = cells.groupBy("c_id").agg(sum("n_cl").cast("long").as("n_c"))
    val nl = cells.groupBy("l_id").agg(sum("n_cl").cast("long").as("n_l"))
    cells.join(nc, "c_id").join(nl, "l_id")
      .withColumn("p_part", expr("n_cl * n_cl * 1000000000L div n_c"))
      .withColumn("r_part", expr("n_cl * n_cl * 1000000000L div n_l"))
      .agg(sum("n_cl").cast("long").as("n_docs"),
        countDistinct("c_id").as("n_clusters_lsh"),
        countDistinct("l_id").as("n_clusters_exact"),
        sum("p_part").cast("long").as("sp"),
        sum("r_part").cast("long").as("sr"))
      .withColumn("bcubed_precision_fp", expr("sp div n_docs"))
      .withColumn("bcubed_recall_fp", expr("sr div n_docs"))
      .withColumn("bcubed_f1_fp", expr(
        """CASE WHEN sp div n_docs + sr div n_docs > 0
          |  THEN 2L * (sp div n_docs) * (sr div n_docs)
          |    div (sp div n_docs + sr div n_docs)
          |  ELSE 0L END""".stripMargin))
      .select("n_docs", "n_clusters_lsh", "n_clusters_exact",
        "bcubed_precision_fp", "bcubed_recall_fp", "bcubed_f1_fp")
  }

  lazy val dedupBcubedSql: String =
    s"""WITH RECURSIVE ${Dedup.jaccardPairsCtes},
       |${Dedup.lshPairsCtes},
       |ex AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS d1,
       |      doc_id AS d2
       |    FROM documents
       |  ) WHERE d1 <> d2
       |),
       |eL AS (SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM ex),
       |edL AS MATERIALIZED (
       |  SELECT d1 AS src, d2 AS dst FROM eL UNION SELECT d2, d1 FROM eL
       |),
       |reachL(doc_id, r) AS (
       |  SELECT src, src FROM edL
       |  UNION
       |  SELECT e.src, reachL.r FROM edL e JOIN reachL ON e.dst = reachL.doc_id
       |),
       |labL AS (SELECT doc_id, min(r) AS l_id FROM reachL GROUP BY 1),
       |eC AS (SELECT d1, d2 FROM lshp UNION SELECT d1, d2 FROM ex),
       |edC AS MATERIALIZED (
       |  SELECT d1 AS src, d2 AS dst FROM eC UNION SELECT d2, d1 FROM eC
       |),
       |reachC(doc_id, r) AS (
       |  SELECT src, src FROM edC
       |  UNION
       |  SELECT e.src, reachC.r FROM edC e JOIN reachC ON e.dst = reachC.doc_id
       |),
       |labC AS (SELECT doc_id, min(r) AS c_id FROM reachC GROUP BY 1),
       |a AS (
       |  SELECT d.doc_id,
       |    coalesce(labC.c_id, d.doc_id) AS c_id,
       |    coalesce(labL.l_id, d.doc_id) AS l_id
       |  FROM documents d
       |  LEFT JOIN labC ON d.doc_id = labC.doc_id
       |  LEFT JOIN labL ON d.doc_id = labL.doc_id
       |),
       |cells AS MATERIALIZED (SELECT c_id, l_id, count(*) AS n_cl FROM a GROUP BY 1, 2),
       |nc AS (SELECT c_id, CAST(sum(n_cl) AS BIGINT) AS n_c FROM cells GROUP BY 1),
       |nl AS (SELECT l_id, CAST(sum(n_cl) AS BIGINT) AS n_l FROM cells GROUP BY 1),
       |parts AS (
       |  SELECT n_cl, c_id, l_id,
       |    n_cl * n_cl * 1000000000 // n_c AS p_part,
       |    n_cl * n_cl * 1000000000 // n_l AS r_part
       |  FROM cells JOIN nc USING (c_id) JOIN nl USING (l_id)
       |), s AS (
       |  SELECT CAST(sum(n_cl) AS BIGINT) AS n_docs,
       |    count(DISTINCT c_id) AS n_clusters_lsh,
       |    count(DISTINCT l_id) AS n_clusters_exact,
       |    CAST(sum(p_part) AS BIGINT) AS sp,
       |    CAST(sum(r_part) AS BIGINT) AS sr
       |  FROM parts
       |)
       |SELECT n_docs, n_clusters_lsh, n_clusters_exact,
       |  CAST(sp // n_docs AS BIGINT) AS bcubed_precision_fp,
       |  CAST(sr // n_docs AS BIGINT) AS bcubed_recall_fp,
       |  CAST(CASE WHEN sp // n_docs + sr // n_docs > 0
       |    THEN 2 * (sp // n_docs) * (sr // n_docs)
       |      // (sp // n_docs + sr // n_docs)
       |    ELSE 0 END AS BIGINT) AS bcubed_f1_fp
       |FROM s""".stripMargin

  /** Duplication-factor profile — the corpus-report statistic a dedup
    * pass is judged by: for each duplicate-cluster SIZE, how many
    * clusters have it and how many documents they hold (so "what
    * fraction of the corpus is duplicate mass" reads off directly:
    * docs in size>=2 rows vs total). Reuses the memoized cluster labels
    * ([[dedupClusters]]'s substrate), then two tiny hash aggregates:
    * one row per cluster crosses the first shuffle, one row per distinct
    * size (a few dozen at any scale) crosses the second. */
  def dedupProfile(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(spark, dir)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("cluster_size")).as("n_docs"))

  /** Oracle: same cluster CTEs, then the same two stacked aggregates. */
  val dedupProfileSql: String =
    s"""WITH RECURSIVE ${Dedup.jaccardPairsCtes},
       |ex AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS d1,
       |      doc_id AS d2
       |    FROM documents
       |  ) WHERE d1 <> d2
       |),
       |e0 AS (SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM ex),
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM e0
       |  UNION SELECT d2, d1 FROM e0
       |),
       |reach(doc_id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
       |),
       |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |lab AS (
       |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       |),
       |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT cluster_size, count(*) AS n_clusters,
       |  count(*) * cluster_size AS n_docs
       |FROM cs GROUP BY 1""".stripMargin

  // ------------------------------------------------ URL canonical dedup

  /** Deterministic per-document crawl URL — the fixture's documents table
    * carries no URL column, so this derives one from doc_id. Docs with
    * `doc_id % 20 < 3` form a "page triple" (pid = doc_id div 20), each
    * member carrying a DIFFERENT raw decoration of the same logical URL
    * (uppercase scheme+host, `www.`, explicit `:80`, trailing slash, a
    * `#fragment`, shuffled query-param order, per-doc `utm_*`/`gclid`
    * tracking params); the other 85% get a per-doc UNIQUE url that is
    * still decorated (`https` + `:443`, non-www subdomain, `utm_medium`,
    * fragment), so canonicalization runs corpus-wide but only triple
    * members collide. Every normalization branch in [[canonicalUrl]] is
    * load-bearing: drop any one and some variant pair stops deduping
    * (UrlDedupSpec pins this). The 15% duplicate share mirrors a real
    * crawl, where decorated re-crawls are a minority of pages — and the
    * density is load-bearing for the ORACLE, not for Spark: a dense
    * variant (every doc in a triple) chains text-dup families into
    * path-of-stars components that [[components]]' pointer-jumping
    * closes in <40 rounds but whose all-pairs recursive closure DuckDB
    * cannot finish at sf1 (SCALE_NOTES round-13). A deployment replaces
    * this generator with its real URL column. */
  private[graft] def rawUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("doc_id div 20").as("pid"), (col("doc_id") % 20L).as("v"))
      .withColumn("url",
        when(col("v") === 0L,
          concat(lit("HTTP://WWW.example.com:80/page/"), col("pid"),
            lit("/?id="), col("pid"), lit("&b=2&utm_source=crawler#sec")))
        .when(col("v") === 1L,
          concat(lit("http://example.com/page/"), col("pid"),
            lit("?b=2&utm_campaign=x&id="), col("pid")))
        .when(col("v") === 2L,
          concat(lit("http://EXAMPLE.com/page/"), col("pid"),
            lit("?gclid=z"), col("doc_id"), lit("&id="), col("pid"),
            lit("&b=2")))
        .otherwise(
          concat(lit("HTTPS://news.example.com:443/item/"), col("doc_id"),
            lit("/?utm_medium=feed&ref="), col("pid"), lit("#top"))))
      .select("doc_id", "url")

  // NOTE: this fragment is interpolated into stripMargin'd oracles, so
  // no line may begin with (whitespace +) '|' — a second stripMargin
  // would eat one pipe of a leading '||'
  private[operators] val rawUrlsSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 20
      |    WHEN 0 THEN 'HTTP://WWW.example.com:80/page/' || (doc_id // 20) ||
      |      '/?id=' || (doc_id // 20) || '&b=2&utm_source=crawler#sec'
      |    WHEN 1 THEN 'http://example.com/page/' || (doc_id // 20) ||
      |      '?b=2&utm_campaign=x&id=' || (doc_id // 20)
      |    WHEN 2 THEN 'http://EXAMPLE.com/page/' || (doc_id // 20) ||
      |      '?gclid=z' || doc_id || '&id=' || (doc_id // 20) || '&b=2'
      |    ELSE 'HTTPS://news.example.com:443/item/' || doc_id ||
      |      '/?utm_medium=feed&ref=' || (doc_id // 20) || '#top'
      |  END AS url
      |FROM documents""".stripMargin

  /** Crawl-URL canonicalization — the cheapest dedup channel a crawl
    * pipeline runs, BEFORE any text pass: pure string normalization, no
    * fetch, no tokenization.
    *  - scheme and host lowercase (case-insensitive per RFC 3986);
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - leading `www.` stripped;
    *  - fragment stripped (never sent to the server);
    *  - tracking params removed (`utm_*`, `fbclid`, `gclid` — with OR
    *    without an `=value`, so a bare `?gclid` decorations strips too)
    *    and the surviving params SORTED (param order is not semantic),
    *    empty query dropped;
    *  - trailing path slashes stripped.
    * PRECONDITION RELAXED (r14, ADVICE r13): a row that does not start
    * with `scheme://` (relative URL, garbage, empty) passes through
    * UNCHANGED — it can only collide with a byte-identical row, never
    * with a normalized one (the pre-r14 form parsed its first path
    * segment as a host and could silently merge distinct relative
    * URLs). Real crawl columns carry such rows; the fixture does not,
    * so fixture oracles are unchanged. UrlCanonPropertySpec pins the
    * contract on adversarial shapes.
    * ARTIFACT COMPATIBILITY: the r14 changes (pass-through + bare
    * tracking params like `?gclid` now stripping) alter the canonical
    * form of exactly those row classes, so a PERSISTED keeper table
    * ([[urlBaseCanon]] output, `StreamingUrlDedup`'s `canon/` base)
    * built pre-r14 no longer joins against post-r14 canonicalization
    * for them — a silent missed-dedup, not an error. Rebuild persisted
    * canon bases from the raw URLs when upgrading across this change.
    * Everything is regexp/split/sort on short strings — scan-side
    * whole-stage codegen, oracle-expressible, zero shuffle. */
  private[graft] def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val noFrag = regexp_replace(
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "#.*$", "")
    val hostPort = lower(regexp_extract(noFrag, "^([^/?]*)", 1))
    val host = regexp_replace(
      when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .otherwise(hostPort),
      "^www\\.", "")
    val rest = noFrag.substr(length(hostPort) + 1, lit(Int.MaxValue))
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_replace(rest, "^[^?]*\\??", "")
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)")))
    val q2 = array_join(kept, "&")
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(scheme, lit("://"), host, path,
        when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
      .otherwise(url)
  }

  /** DuckDB twin of [[canonicalUrl]] over a relation exposing `url` —
    * including the scheme-less pass-through and the bare-tracking-param
    * strip (r14). */
  private[operators] def canonicalUrlSql(rel: String): String =
    s"""SELECT doc_id, canon_url FROM (
       |  SELECT doc_id,
       |    CASE WHEN NOT regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://')
       |    THEN url
       |    ELSE scheme || '://' ||
       |    regexp_replace(
       |      CASE WHEN scheme = 'http'
       |             THEN regexp_replace(hostport, ':80$$', '')
       |           WHEN scheme = 'https'
       |             THEN regexp_replace(hostport, ':443$$', '')
       |           ELSE hostport END,
       |      '^www\\.', '') ||
       |    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$$', '') ||
       |    CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END END AS canon_url
       |  FROM (
       |    SELECT doc_id, url, scheme, hostport, rest,
       |      coalesce(list_aggregate(list_sort(list_filter(
       |        string_split(regexp_replace(rest, '^[^?]*\\??', ''), '&'),
       |        p -> p <> '' AND NOT regexp_matches(p,
       |          '^(utm_[^=]*|fbclid|gclid)(=|$$)'))), 'string_agg', '&'), '')
       |        AS q2
       |    FROM (
       |      SELECT doc_id, url,
       |        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |          AS scheme,
       |        lower(regexp_extract(nofrag, '^([^/?]*)', 1)) AS hostport,
       |        substr(nofrag,
       |          length(regexp_extract(nofrag, '^([^/?]*)', 1)) + 1) AS rest
       |      FROM (
       |        SELECT doc_id, regexp_replace(
       |          regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
       |          '#.*$$', '') AS nofrag, url
       |        FROM ($rel)
       |      )
       |    )
       |  )
       |)""".stripMargin

  /** URL-canonical duplicate groups — one row per document whose
    * canonical URL is shared (keeper = smallest doc_id of the group).
    * One hash agg on the canonical string; the scan-side normalization
    * never shuffles raw URLs, only canonical ones. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val canon = rawUrls(Tables.documents(spark, dir))
      .withColumn("canon_url", canonicalUrl(col("url")))
    val w = Window.partitionBy("canon_url")
    canon
      .withColumn("keeper", min("doc_id").over(w))
      .withColumn("n_docs", count(lit(1)).over(w))
      .filter(col("n_docs") > 1L)
      .select("doc_id", "canon_url", "keeper", "n_docs")
  }

  val urlDedupSql: String =
    s"""WITH ru AS ($rawUrlsSql),
       |cu AS (${canonicalUrlSql("SELECT * FROM ru")})
       |SELECT doc_id, canon_url,
       |  min(doc_id) OVER (PARTITION BY canon_url) AS keeper,
       |  count(*) OVER (PARTITION BY canon_url) AS n_docs
       |FROM cu
       |QUALIFY count(*) OVER (PARTITION BY canon_url) > 1""".stripMargin

  /** Star edges (keeper, doc) of the URL channel for
    * [[crossmodalClusters]]. */
  private def urlEdges(spark: SparkSession, dir: String): DataFrame =
    urlDedup(spark, dir)
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("keeper").as("d1"), col("doc_id").as("d2"))

  /** The canonical-URL keeper table — the persistent artifact an
    * incremental crawl keeps between increments: one
    * (canon_url, base_doc_id) row per distinct canonical URL in the
    * base, keeper = smallest doc_id. The URL analog of
    * [[Dedup.baseDigests]]. */
  def urlBaseCanon(baseUrls: DataFrame): DataFrame =
    baseUrls.groupBy(canonicalUrl(col("url")).as("canon_url"))
      .agg(min("doc_id").as("base_doc_id"))

  /** Core of the incremental URL shape, shared verbatim by
    * [[urlDedupIncremental]] and the streaming twin
    * ([[graft.streaming.StreamingUrlDedup]]) so the two paths agree by
    * construction: canonicalize the batch's raw URLs and equi-join the
    * base keeper table. Each doc's verdict depends only on (doc, base) —
    * never on other batch docs — which makes the operator splittable
    * into arbitrary micro-batches against a static base. Scale shape:
    * one hash equi-join keyed by the canonical string, batch side small
    * (AQE broadcasts it), base never re-joined against itself. */
  private[graft] def urlHitsAgainstBase(newUrls: DataFrame,
      baseCanon: DataFrame): DataFrame =
    newUrls.select(col("doc_id"), canonicalUrl(col("url")).as("canon_url"))
      .join(baseCanon, "canon_url")
      .select(col("doc_id"), col("base_doc_id"), col("canon_url"))

  /** INCREMENTAL canonical-URL dedup — today's crawl against the
    * existing corpus's URL keeper table, the same daily shape as
    * [[Dedup.incrementalDedup]] but on the cheapest channel (no text is
    * read at all). The `doc_id % 10 == 1` slice stands in for the new
    * batch — NOT the text family's `% 10 == 7`, because the fixture's
    * URL-duplicated population is the `doc_id % 20 < 3` triples and a
    * `% 10 == 7` batch would miss it entirely (every hit row would
    * vanish, failing the non-trivial-result gate); `% 10 == 1` puts the
    * v=1 decoration of every page triple in the batch, so each page
    * yields one exact URL hit against its base keeper. */
  def urlDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val urls = rawUrls(Tables.documents(spark, dir))
    urlHitsAgainstBase(
      urls.filter(col("doc_id") % 10L === 1L),
      urlBaseCanon(urls.filter(col("doc_id") % 10L =!= 1L)))
  }

  val urlDedupIncrementalSql: String =
    s"""WITH ru AS ($rawUrlsSql),
       |cu AS (${canonicalUrlSql("SELECT * FROM ru")}),
       |b AS (
       |  SELECT canon_url, min(doc_id) AS base_doc_id
       |  FROM cu WHERE doc_id % 10 <> 1 GROUP BY 1
       |)
       |SELECT n.doc_id, b.base_doc_id, n.canon_url
       |FROM (SELECT * FROM cu WHERE doc_id % 10 = 1) n
       |JOIN b USING (canon_url)""".stripMargin

  /** Per-(host, language) crawl-governance profile — the URL-side
    * companion of [[corpusDomainCap]] (which caps on the `source`
    * column): doc volume, distinct canonical pages, URL-duplicated doc
    * count and its exact ppm share, per canonical host and document
    * language. This is the report a crawl budgeter reads before
    * re-pointing fetch capacity — a host whose dup share is high is
    * being re-crawled through decorated URLs, not yielding new pages.
    *
    * Scale shape: one per-page count keyed by canon_url (the SAME
    * shuffle key the dedup channel uses), one broadcast-sized join back
    * through doc_id to pick up `lang` (doc-keyed equi-join), then a
    * (host, lang) hash agg whose domain is tiny. Exactness: dup share
    * as integer ppm floor-division — n_dup_docs x 1e6 overflows BIGINT
    * only past ~9.2e12 docs per (host, lang) cell, far beyond any
    * per-host corpus. */
  def urlHostProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val canon = rawUrls(docs)
      .withColumn("canon_url", canonicalUrl(col("url")))
      .withColumn("host",
        regexp_extract(col("canon_url"), "^[a-z0-9+.-]+://([^/?]*)", 1))
    val perPage = canon.groupBy("canon_url")
      .agg(count(lit(1)).as("n_on_page"))
    canon.join(perPage, "canon_url")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("host", "lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("canon_url").as("n_pages"),
        count(when(col("n_on_page") > 1L, 1)).as("n_dup_docs"))
      .withColumn("dup_share_ppm",
        expr("n_dup_docs * 1000000L div n_docs"))
  }

  val urlHostProfileSql: String =
    s"""WITH ru AS ($rawUrlsSql),
       |cu AS (${canonicalUrlSql("SELECT * FROM ru")}),
       |h AS (
       |  SELECT doc_id, canon_url,
       |    regexp_extract(canon_url, '^[a-z0-9+.-]+://([^/?]*)', 1) AS host
       |  FROM cu
       |),
       |pc AS (SELECT canon_url, count(*) AS n_on_page FROM h GROUP BY 1)
       |SELECT host, lang,
       |  count(*) AS n_docs,
       |  count(DISTINCT canon_url) AS n_pages,
       |  count(CASE WHEN n_on_page > 1 THEN 1 END) AS n_dup_docs,
       |  count(CASE WHEN n_on_page > 1 THEN 1 END) * 1000000
       |    // count(*) AS dup_share_ppm
       |FROM h JOIN pc USING (canon_url) JOIN documents USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** Channel-overlap audit of the three duplicate channels
    * [[crossmodalClusters]] unions — text (exact + verified Jaccard),
    * perceptual hash, canonical URL: one row per channel COMBINATION
    * with its doc count (the all-zeros row = docs no channel flags, so
    * the counts conserve to the corpus). This is the redundancy audit a
    * pipeline owner reads before paying for a channel at 100 TB: a
    * channel whose docs are all caught by the others adds merge edges
    * but no new duplicate mass, while a large exclusive count is
    * exactly the population only that channel can catch.
    *
    * Scale shape: each channel's doc set is the channel's own bucketed
    * candidate generator (text clusters and the pHash pairs are the
    * session-memoized substrates other queries already share), reduced
    * to distinct doc_ids before three doc-keyed left joins and a
    * constant-domain (2^3-cell) hash agg. */
  def dedupChannelOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    // Each channel's flagged-doc set is exactly the endpoint set of its
    // edges in the fused tagged artifact ([[crossmodalEdgesTagged]]):
    //  - text: dupEdges endpoints — the edges ARE the ch=1 rows;
    //  - pHash: phashDedup pair endpoints — the ch=2 rows verbatim;
    //  - URL: urlDedup keeps docs of canon groups with n>1, and urlEdges
    //    stars every such group keeper->others, so endpoints(ch=3) =
    //    keepers ∪ others = the same set.
    // So the audit is one explode + two doc-keyed aggs over the shared
    // materialized table instead of re-running all three channel
    // generators (r17 VERDICT item 5; same consumers-of-one-artifact
    // shape the crossmodal closures already use).
    val flags = crossmodalEdgesTagged(spark, dir)
      .select(col("ch"), explode(array(col("d1"), col("d2"))).as("doc_id"))
      .groupBy("doc_id")
      .agg(max(when(col("ch") === 1, 1)).as("t"),
        max(when(col("ch") === 2, 1)).as("p"),
        max(when(col("ch") === 3, 1)).as("u"))
    docs.join(flags, Seq("doc_id"), "left")
      .select(coalesce(col("t"), lit(0)).as("in_text"),
        coalesce(col("p"), lit(0)).as("in_phash"),
        coalesce(col("u"), lit(0)).as("in_url"))
      .groupBy("in_text", "in_phash", "in_url")
      .agg(count(lit(1)).as("n_docs"))
  }

  val dedupChannelOverlapSql: String =
    s"""WITH ${Dedup.jaccardPairsCtes},
       |ex AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS d1,
       |      doc_id AS d2
       |    FROM documents
       |  ) WHERE d1 <> d2
       |),
       |e0 AS (SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM ex),
       |td AS (SELECT d1 AS doc_id FROM e0 UNION SELECT d2 FROM e0),
       |pp AS MATERIALIZED (
       |  SELECT d1, d2 FROM (${Multimodal.phashDedupSql})
       |),
       |pd AS (SELECT d1 AS doc_id FROM pp UNION SELECT d2 FROM pp),
       |ru AS ($rawUrlsSql),
       |cuo AS (${canonicalUrlSql("SELECT * FROM ru")}),
       |ud AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, count(*) OVER (PARTITION BY canon_url) AS n
       |    FROM cuo
       |  ) WHERE n > 1
       |)
       |SELECT
       |  CASE WHEN td.doc_id IS NULL THEN 0 ELSE 1 END AS in_text,
       |  CASE WHEN pd.doc_id IS NULL THEN 0 ELSE 1 END AS in_phash,
       |  CASE WHEN ud.doc_id IS NULL THEN 0 ELSE 1 END AS in_url,
       |  count(*) AS n_docs
       |FROM documents d
       |LEFT JOIN td ON d.doc_id = td.doc_id
       |LEFT JOIN pd ON d.doc_id = pd.doc_id
       |LEFT JOIN ud ON d.doc_id = ud.doc_id
       |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------- cross-modal clusters

  /** Cross-modal duplicate clusters — the real curation gate for a
    * corpus whose documents carry media payloads: text dedup
    * ([[dedupClusters]]) and perceptual-hash dedup
    * ([[Multimodal.phashClusters]]) each close their OWN edge set, but a
    * scraped page re-hosted with the same image and paraphrased text (or
    * identical text and a re-encoded image) is one duplicate either way —
    * and a page re-crawled under a tracking-decorated URL is a duplicate
    * before any content pass at all. This unions the THREE candidate
    * edge sets — exact + verified-Jaccard text pairs, banded pHash
    * pairs, and [[urlDedup]]'s canonical-URL star edges (r13) — and
    * closes components ONCE, so a doc that text-matches A and
    * image-matches B (or URL-matches C) merges their clusters (precisely
    * what running the channels independently can never do). Keeper =
    * component-min doc_id, the same survivorship rule each channel uses
    * alone.
    *
    * Scale shape: both edge generators are the already-bucketed
    * candidate joins (never all-pairs); the union adds no shuffle beyond
    * theirs, and ONE [[components]] propagation loop replaces the two
    * per-channel loops — its cost is O(log diameter) rounds over edge
    * endpoints only (singleton docs never enter). Output is one row per
    * document with its fused cluster and the cluster size. */
  /** The three channels' candidate edges, unioned — the edge set both
    * the full closure and the incremental merge consume. */
  private[graft] def crossmodalEdges(spark: SparkSession, dir: String): DataFrame =
    dupEdges(spark, dir).select(col("d1"), col("d2"), lit(1).as("ch"))
      .union(Multimodal.phashDedup(spark, dir)
        .select(col("d1"), col("d2"), lit(2).as("ch")))
      .union(urlEdges(spark, dir)
        .select(col("d1"), col("d2"), lit(3).as("ch")))

  /** [[crossmodalEdges]] MATERIALIZED once per (session, dir) — the same
    * [[graft.util.SessionCache]] recipe as [[labelCache]], for the same
    * reason: four registered queries (both crossmodal closures, the RTBF
    * state audit, and their streaming stand-ins) consume this union, and
    * the three channel generators behind it are the single largest
    * repeated CPU cost left in the bench (~11 s task time per rebuild at
    * sf0.1). At 100 TB the fused candidate-pair table IS a persisted
    * artifact — the per-channel incremental generators append to it —
    * so computing it once per session is the query-side image of the
    * production layout, not a result cache (a fresh run recomputes it). */
  private val edgeCache = new graft.util.SessionCache[
      (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])](
    valid = (spark, v) => graft.util.Ckpt.blocksPresent(spark, v._2),
    dispose = v => v._2.unpersist(blocking = false))

  /** The materialized artifact carries a per-row channel tag (1 = text,
    * 2 = pHash, 3 = canonical URL — 4 bytes/row) so the channel-overlap
    * audit reads the SAME table instead of re-running the three channel
    * generators; closure consumers project it away below. */
  private[graft] def crossmodalEdgesTagged(spark: SparkSession,
      dir: String): DataFrame =
    edgeCache.get(spark, dir)(
      graft.util.Ckpt.materialize(crossmodalEdges(spark, dir)))._1

  private[graft] def crossmodalEdgesCached(spark: SparkSession,
      dir: String): DataFrame =
    crossmodalEdgesTagged(spark, dir).select("d1", "d2")

  /** Shared output assembly: labels (doc_id, cluster_id) -> the
    * (doc_id, cluster_id, is_keeper, cluster_size) report. */
  private def clusterReport(lab: DataFrame): DataFrame = {
    val cs = lab.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    lab.join(cs, "cluster_id")
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_keeper"),
        col("cluster_size"))
  }

  def crossmodalClusters(spark: SparkSession, dir: String): DataFrame = {
    val edges = crossmodalEdgesCached(spark, dir)
    // eager: clusterReport references the label frame twice (size agg +
    // join back), and each uncached reference re-runs the doc scan and
    // the label join
    val lab = Dedup.eager(Tables.documents(spark, dir).select("doc_id")
      .join(components(edges), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id"))))
    clusterReport(lab)
  }

  /** UNION-FIND MERGE of new edges into PERSISTED components — the
    * closure half of an incremental cross-modal pass, without
    * re-closing the historical graph (VERDICT r13 #4).
    *
    * Inputs: `baseLabels` (doc_id, cluster_id) — the persisted label
    * table of the existing corpus, cluster_id = component-min doc_id
    * (docs absent from it default to singleton-self via the left
    * joins); `newEdges` (d1, d2) — every edge INCIDENT TO a batch doc
    * (batch-batch and batch-base; base-base edges are unchanged by a
    * new crawl, so none arrive).
    *
    * Mechanics: each endpoint contracts to its representative — a base
    * doc to its persisted cluster_id, a batch doc to itself — and ONE
    * [[components]] closure runs over the CONTRACTED edge set, whose
    * size is O(batch-incident edges), not O(corpus). Base labels are
    * then re-keyed through the merged representatives (one broadcast-
    * sized hash join: only representatives whose components merged
    * appear), batch docs take their merged label or themselves.
    *
    * Correctness: contraction by any vertex partition that refines the
    * final components and whose classes are connected in the full graph
    * preserves connectivity — components(baseEdges) is exactly such a
    * partition, so merge(clusters(base), newEdges) == clusters(base
    * UNION batch) EXACTLY (CrossmodalIncrementalSpec proves it on
    * random graphs; the registered query hash-matches the full-closure
    * oracle). Labels stay component-min ids because the contracted
    * node set is {base component mins} UNION {batch doc ids} and min
    * distributes over the union.
    *
    * Scale shape: the persisted-label join is doc-keyed (the label
    * table is the artifact a daily pipeline keeps anyway, exactly like
    * [[Dedup.baseDigests]]); the closure loop — the only iterative,
    * O(log diameter)-round cost — touches ONLY contracted batch-
    * incident edges. A quiet crawl day closes a near-empty graph no
    * matter how large the history. */
  def crossmodalMerge(baseLabels: DataFrame, newEdges: DataFrame): DataFrame = {
    val bl = baseLabels.select(col("doc_id"), col("cluster_id"))
    val ne = newEdges.select(col("d1"), col("d2"))
    val contracted = ne
      .join(bl.select(col("doc_id").as("d1"), col("cluster_id").as("c1")),
        Seq("d1"), "left")
      .join(bl.select(col("doc_id").as("d2"), col("cluster_id").as("c2")),
        Seq("d2"), "left")
      .select(coalesce(col("c1"), col("d1")).as("d1"),
        coalesce(col("c2"), col("d2")).as("d2"))
      .filter(col("d1") =!= col("d2"))
    // ONE closure over the contracted graph — O(batch-incident edges)
    val mrep = components(contracted)
      .select(col("doc_id").as("rep"), col("cluster_id").as("mc"))
    val baseOut = bl.join(mrep, bl("cluster_id") === mrep("rep"), "left")
      .select(bl("doc_id"),
        coalesce(col("mc"), bl("cluster_id")).as("cluster_id"))
    // new (non-base) endpoints contract to themselves, so every one of
    // them has a merged-label row; new docs with NO incident edge are
    // the caller's singletons
    val touched = ne.select(col("d1").as("doc_id"))
      .unionAll(ne.select(col("d2").as("doc_id"))).distinct()
      .join(bl.select("doc_id"), Seq("doc_id"), "left_anti")
    val newOut = touched.join(mrep, touched("doc_id") === mrep("rep"))
      .select(touched("doc_id"), col("mc").as("cluster_id"))
    baseOut.unionAll(newOut)
  }

  /** INCREMENTAL cross-modal clustering as a registered query: the
    * corpus splits into base (`doc_id % 10 != 1`) and today's batch
    * (`% 10 == 1` — the slice that intersects every channel: each page
    * triple's v=1 URL decoration, plus its share of text and pHash
    * families), the base closes alone (standing in for READING the
    * persisted label table), and the batch's incident edges merge via
    * [[crossmodalMerge]] — the historical graph is never re-closed.
    * The fixture's edge substrates are the full generators filtered by
    * endpoint membership (a test-harness stand-in: a production day
    * feeds the per-channel batch-vs-base incremental generators —
    * [[Dedup.hitsAgainstBase]], [[urlHitsAgainstBase]], the pHash
    * banded join against the persisted band table — which produce
    * exactly the batch-incident set). Oracle: the FULL closure
    * ([[crossmodalClustersSql]]) — the merge must be hash-exact against
    * recomputing everything. */
  def crossmodalIncremental(spark: SparkSession, dir: String): DataFrame = {
    val isBatch1 = col("d1") % 10L === 1L
    val isBatch2 = col("d2") % 10L === 1L
    val edges = crossmodalEdgesCached(spark, dir)
    val docs = Tables.documents(spark, dir).select("doc_id")
    val baseDocs = docs.filter(col("doc_id") % 10L =!= 1L)
    val batchDocs = docs.filter(col("doc_id") % 10L === 1L)
    // the persisted artifact a daily pipeline reads from disk — eagerly
    // cached because crossmodalMerge references it five times (both
    // contraction legs, the re-key join, and the touched anti-join), and
    // clusterReport doubles every reference again: uncached, the final
    // plan re-derived this doc-scan-plus-label-join 15x (151 parquet
    // scans in the before-plan). At 100 TB this frame IS a stored table.
    val baseLabels = Dedup.eager(baseDocs
      .join(components(edges.filter(!isBatch1 && !isBatch2)),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id"))))
    // same doubling through clusterReport + the untouched anti-join
    val merged = Dedup.eager(
      crossmodalMerge(baseLabels, edges.filter(isBatch1 || isBatch2)))
    // batch docs no new edge touched stay singletons
    val untouched = batchDocs
      .join(merged.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    // `edges` stays cached for the result's own evaluation, exactly like
    // crossmodalClusters's edge frame (evicted under memory pressure;
    // the components outputs are checkpoint-backed and independent)
    clusterReport(merged.unionAll(untouched))
  }

  /** The three channels' edge CTEs ending in `e0(d1, d2)` (prefixed by
    * [[Dedup.jaccardPairsCtes]]) — shared by [[crossmodalClustersSql]]
    * and [[Forget.stateForgetSql]]'s label-table leg, so the two oracles
    * agree on the edge substrate by construction. */
  private[operators] val crossmodalEdgeCtes: String =
    s"""${Dedup.jaccardPairsCtes},
       |ex AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS d1,
       |      doc_id AS d2
       |    FROM documents
       |  ) WHERE d1 <> d2
       |),
       |pp AS MATERIALIZED (
       |  SELECT d1, d2 FROM (${Multimodal.phashDedupSql})
       |),
       |ru AS ($rawUrlsSql),
       |cuu AS (${canonicalUrlSql("SELECT * FROM ru")}),
       |uu AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY canon_url) AS d1,
       |      doc_id AS d2
       |    FROM cuu
       |  ) WHERE d1 <> d2
       |),
       |e0 AS (SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM ex
       |  UNION SELECT d1, d2 FROM pp UNION SELECT d1, d2 FROM uu)""".stripMargin

  /** Oracle: the text channels' CTEs plus the pHash pair subquery plus
    * the URL-canonical star edges, unioned before ONE recursive
    * transitive closure. */
  val crossmodalClustersSql: String =
    s"""WITH RECURSIVE $crossmodalEdgeCtes,
       |edges AS MATERIALIZED (
       |  SELECT d1 AS src, d2 AS dst FROM e0
       |  UNION SELECT d2, d1 FROM e0
       |),
       |reach(doc_id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
       |),
       |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |lab AS (
       |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       |),
       |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT lab.doc_id, lab.cluster_id,
       |  lab.doc_id = lab.cluster_id AS is_keeper, cs.cluster_size
       |FROM lab JOIN cs USING (cluster_id)""".stripMargin

  // -------------------------------------------------- canonical per cluster

  /** Canonical-document selection — the "keep ONE per duplicate cluster"
    * step that turns cluster assignment into an actual deduplicated
    * corpus. Representative = the longest document (ties to the smallest
    * doc_id), which is the usual choice in crawl pipelines (the longest
    * member is most often the un-truncated original).
    *
    * Scale shape: one hash aggregate over (cluster_id) — `max_by` under
    * partial aggregation collapses each cluster map-side, so the shuffle
    * carries one row per cluster, not per document. No window, no sort. */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "n_chars"), "doc_id")
      .groupBy("cluster_id")
      .agg(
        max_by(col("doc_id"), struct(col("n_chars"), (-col("doc_id")).as("nd")))
          .as("canon_doc_id"),
        count(lit(1)).as("n_docs"),
        max("n_chars").as("max_chars"))

  /** Oracle: same cluster CTEs as [[dedupClustersSql]], then a rank-1
    * window pick (equivalent to the Spark max_by ordering struct). */
  val dedupCanonicalSql: String =
    s"""WITH RECURSIVE ${Dedup.jaccardPairsCtes},
       |ex AS (
       |  SELECT d1, d2 FROM (
       |    SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS d1,
       |      doc_id AS d2
       |    FROM documents
       |  ) WHERE d1 <> d2
       |),
       |e0 AS (SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM ex),
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM e0
       |  UNION SELECT d2, d1 FROM e0
       |),
       |reach(doc_id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
       |),
       |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |cc AS (
       |  SELECT coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
       |    d.doc_id, d.n_chars
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       |), r AS (
       |  SELECT cluster_id, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY n_chars DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_docs,
       |    max(n_chars) OVER (PARTITION BY cluster_id) AS max_chars
       |  FROM cc
       |)
       |SELECT cluster_id, doc_id AS canon_doc_id, n_docs, max_chars
       |FROM r WHERE rn = 1""".stripMargin

  // ------------------------------------------------------ corpus split

  private[graft] val trainPct = 80
  private[graft] val valPct = 10 // remainder is test

  /** Hash bucket in [0,100): first 8 md5 hex chars of the salted
    * doc_id, mod 100. Distinct salts make split/sample/mixture decisions
    * independent of each other (a doc's split must not correlate with
    * whether sampling kept it). SQL twin in [[hashBucketSql]]. */
  private[graft] def hashBucket(salt: String, id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))),
      1, 8), 16, 10).cast("long") % 100

  private[graft] def hashBucketSql(salt: String, id: String): String =
    s"CAST(('0x' || substr(md5('$salt' || CAST($id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  private def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hashBucket("split:", id)

  private def splitBucketSql(id: String): String =
    hashBucketSql("split:", id)

  /** Deterministic hash split: bucket = first 8 md5 hex chars of the
    * salted doc_id, mod 100; [0,80) train, [80,90) validation, rest
    * test. */
  def corpusSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", splitBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "validation")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")

  val corpusSplitSql: String =
    s"""SELECT doc_id,
       |  ${splitBucketSql("doc_id")} AS bucket,
       |  CASE
       |    WHEN ${splitBucketSql("doc_id")} < $trainPct THEN 'train'
       |    WHEN ${splitBucketSql("doc_id")} < ${trainPct + valPct} THEN 'validation'
       |    ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Group-aware train/test splitting next to [[corpusSplit]]'s doc-level
    * hash split, with the LEAKAGE of each measured — the eval-integrity
    * rule every training pipeline learns the hard way: documents from
    * one source (mirrors, templated pages, crawl near-dups) must not
    * straddle train and test, or the eval set is memorized, not held
    * out. Group splitting assigns the bucket by hashing the GROUP key
    * (`source`), so a group lands in exactly one split by construction.
    *
    * The audit counts leaky pairs — same-source doc pairs separated by
    * the split — for BOTH modes, purely from per-(source, split) COUNTS:
    * leak(source) = C(total, 2) - sum_split C(n_split, 2), so no pair is
    * ever materialized (the count algebra holds at any group size; a
    * 10^8-doc domain contributes one row per split). Doc-level shows the
    * real nonzero leak; group-level must audit to exactly zero. The
    * tradeoff the report also exposes: group splits quantize the ratio
    * (whole groups move between splits), so split sizes drift from
    * 80/10/10 when groups are few or skewed. */
  def groupedSplitAudit(spark: SparkSession, dir: String): DataFrame = {
    def leak(tagged: DataFrame, mode: String): DataFrame = {
      val bySrcSplit = tagged.groupBy("source", "split").agg(count(lit(1)).as("n"))
      bySrcSplit.groupBy("source")
        .agg(sum("n").as("tot"),
          sum(expr("n * (n - 1) div 2")).as("within"))
        .agg(
          sum("tot").as("n_docs"),
          count(lit(1)).as("n_groups"),
          sum(expr("tot * (tot - 1) div 2 - within")).as("n_leaky_pairs"))
        .select(lit(mode).as("mode"), col("n_docs"), col("n_groups"),
          col("n_leaky_pairs"))
    }
    def tag(bucket: org.apache.spark.sql.Column): DataFrame =
      Tables.documents(spark, dir).select(col("doc_id"), col("source"))
        .withColumn("split",
          when(bucket < trainPct, "train")
            .when(bucket < trainPct + valPct, "validation")
            .otherwise("test"))
    leak(tag(splitBucket(col("doc_id"))), "doc")
      .unionByName(leak(tag(hashBucket("gsplit:", col("source"))), "group"))
  }

  val groupedSplitAuditSql: String = {
    def one(mode: String, bucket: String): String =
      s"""SELECT '$mode' AS mode, CAST(sum(tot) AS BIGINT) AS n_docs,
         |  count(*) AS n_groups,
         |  CAST(sum(tot * (tot - 1) // 2 - within) AS BIGINT) AS n_leaky_pairs
         |FROM (
         |  SELECT source, sum(n) AS tot, sum(n * (n - 1) // 2) AS within
         |  FROM (
         |    SELECT source, split, count(*) AS n FROM (
         |      SELECT source, CASE
         |        WHEN $bucket < $trainPct THEN 'train'
         |        WHEN $bucket < ${trainPct + valPct} THEN 'validation'
         |        ELSE 'test' END AS split
         |      FROM documents)
         |    GROUP BY 1, 2)
         |  GROUP BY 1)""".stripMargin
    s"""${one("doc", splitBucketSql("doc_id"))}
       |UNION ALL
       |${one("group", hashBucketSql("gsplit:", "source"))}""".stripMargin
  }

  // --------------------------------------------------- per-domain cap

  private val domainCapK = 10

  /** Per-DOMAIN document cap — the anti-domination gate every crawl
    * pipeline runs before training (a single boilerplate-heavy domain
    * must not become 30% of the corpus): keep at most `domainCapK` docs
    * per `source`, chosen by a salted md5 rank of doc_id so the kept
    * subset is an unbiased deterministic sample, not "first K by id"
    * (ids correlate with crawl time).
    *
    * Runs on the custom bounded-heap operator
    * ([[graft.plans.TopKPerKey]]) rather than a rank window: no
    * per-domain sort, no WindowExec buffering of the whole domain — a
    * hot domain with 10^8 docs costs a K-row heap per task and K rows
    * into the shuffle, which is exactly the 100 TB shape (the window
    * form buffers the hot domain's full partition). */
  def domainCap(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey.topK(
      Tables.documents(spark, dir)
        .withColumn("h",
          conv(substring(md5(concat(lit("cap:"), col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long"))
        .select("source", "doc_id", "n_chars", "h"),
      keys = Seq(col("source")),
      order = Seq(col("h"), col("doc_id")),
      k = domainCapK)
      .drop("h")

  val domainCapSql: String =
    s"""SELECT source, doc_id, n_chars FROM (
       |  SELECT source, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY
       |      CAST(('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
       |      doc_id) AS rn
       |  FROM documents
       |) WHERE rn <= $domainCapK""".stripMargin

  // ------------------------------------------------------- corpus clean

  private val qualityMin = 0.2

  /** The composed training-corpus pipeline, one query: exact-dedup
    * canonicalization -> train-split gate -> per-doc quality stats ->
    * quality gate. Deliberately ONE scan: the split predicate is a
    * stateless hash filter applied before stats, and the only shuffle is
    * canonicalization's window — at 100 TB this runs as
    * scan -> window -> fused project/filter, not a chain of self-joins
    * (which a naive "join the outputs of each operator" composition would
    * produce). */
  def corpusClean(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.textStatsOf(
      Dedup.canonicalDocs(Tables.documents(spark, dir))
        .filter(splitBucket(col("doc_id")) < trainPct))
      .filter(col("quality_score") >= qualityMin)
      .select("doc_id", "n_tokens", "quality_score")

  val corpusCleanSql: String =
    s"""WITH ${Dedup.canonicalDocsSql},
       |tr AS (
       |  SELECT doc_id, text FROM canon
       |  WHERE ${splitBucketSql("doc_id")} < $trainPct
       |),
       |${TextAnalysis.textStatsCtes("tr")},
       |q AS (
       |  ${TextAnalysis.textStatsSelect.replace("\n", "\n  ")}
       |)
       |SELECT doc_id, n_tokens, quality_score FROM q
       |WHERE quality_score >= $qualityMin""".stripMargin

  // --------------------------------------------- stratified sampling / mixing

  /** Per-language keep rates (percent) for the stratified sample:
    * downsample the high-resource stratum, keep the rest. */
  private val sampleRates: Seq[(String, Int)] = Seq("en" -> 25, "fr" -> 50)
  private val sampleDefaultRate = 100

  /** Deterministic stratified sampling: keep a document iff its salted
    * md5 bucket falls below the language's keep rate. Stateless per-row
    * decision — no sampling pass, no shuffle, reproducible across
    * runs/engines, and stable under corpus growth (exactly like
    * [[corpusSplit]], with an independent salt). At 100 TB this is a
    * fused scan-filter; rates live in the plan, not in a join. */
  def corpusSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = sampleRates.foldRight(lit(sampleDefaultRate)) {
      case ((l, r), acc) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket("sample:", col("doc_id")))
      .filter(col("bucket") < rate)
      .select("doc_id", "lang", "bucket")
  }

  val corpusSampleSql: String = {
    val rateSql = sampleRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $sampleDefaultRate END")
    s"""SELECT doc_id, lang, ${hashBucketSql("sample:", "doc_id")} AS bucket
       |FROM documents
       |WHERE ${hashBucketSql("sample:", "doc_id")} < $rateSql""".stripMargin
  }

  /** Quality-weighted importance sampling — the SOFT quality gate the
    * hard filter families approximate: each document is kept with
    * probability equal to its [[TextAnalysis.textStatsOf quality_score]]
    * (∈ (0, 1] by construction), decided by an independent salted hash,
    * and kept rows carry the Horvitz-Thompson weight 1/p̂ so any
    * downstream weighted statistic stays unbiased for the full corpus.
    * Low-quality text thins out smoothly instead of dying at a cliff.
    *
    * Exactness: the score's IEEE product is already hash-proven
    * cross-engine by `text_stats`; the keep decision quantizes it to an
    * integer threshold (HALF_UP at 1e-6, the repo's Fmt idiom) and
    * compares against an integer hash draw — no float comparison crosses
    * engines. Stateless per-row decision like [[corpusSample]]: at
    * 100 TB this is one fused scan-projection-filter, no shuffle. */
  def corpusImportanceSample(spark: SparkSession, dir: String): DataFrame = {
    val stats = TextAnalysis.textStatsOf(Tables.documents(spark, dir))
    val thresh = floor(col("quality_score") * 1000000.0 + 0.5).cast("long")
    val draw = conv(substring(
        md5(concat(lit("isample:"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long") % 1000000L
    stats
      .withColumn("keep_thresh", thresh)
      .filter(draw < col("keep_thresh"))
      .withColumn("weight", lit(1000000.0) / col("keep_thresh"))
      .select("doc_id", "quality_score", "weight")
  }

  val corpusImportanceSampleSql: String = {
    val draw = "(CAST(('0x' || substr(md5('isample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000)"
    val thresh = "CAST(floor(quality_score * 1000000.0 + 0.5) AS BIGINT)"
    s"""WITH ${TextAnalysis.textStatsCtes("documents")},
       |q AS (${TextAnalysis.textStatsSelect})
       |SELECT doc_id, quality_score, 1000000.0 / $thresh AS weight
       |FROM q WHERE $draw < $thresh""".stripMargin
  }

  /** Per-language epoch weights for training-data mixing: copies of each
    * document = floor(weight), plus one more with probability
    * frac(weight) — decided by an independent salted hash so fractional
    * epochs are exact in expectation and deterministic per doc. */
  private val mixWeights: Seq[(String, Double)] =
    Seq("zh" -> 3.0, "fr" -> 2.5, "de" -> 2.0, "es" -> 1.5)
  private val mixDefaultWeight = 1.0

  /** Source-mixture materialization with repetition (the "3 epochs of
    * wiki, 1 of crawl" step of a training-data pipeline): each document
    * explodes into `n_copies` rows tagged 1..n_copies.
    *
    * Scale shape: per-row arithmetic + a generator explode — no shuffle,
    * no join; output size is input x mean(weight), produced streaming
    * (the generator never buffers a document's copies). */
  def corpusMixture(spark: SparkSession, dir: String): DataFrame = {
    val whole = mixWeights.foldRight(lit(mixDefaultWeight.toInt)) {
      case ((l, w), acc) => when(col("lang") === l, lit(w.toInt)).otherwise(acc)
    }
    val fracPct = mixWeights.foldRight(lit((mixDefaultWeight * 100).toInt % 100)) {
      case ((l, w), acc) =>
        when(col("lang") === l, lit((w * 100).toInt % 100)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("n_copies",
        (whole + when(hashBucket("mix:", col("doc_id")) < fracPct, 1)
          .otherwise(0)).cast("long"))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  val corpusMixtureSql: String = {
    val wholeSql = mixWeights
      .map { case (l, w) => s"WHEN lang = '$l' THEN ${w.toInt}" }
      .mkString("CASE ", " ", s" ELSE ${mixDefaultWeight.toInt} END")
    val fracSql = mixWeights
      .map { case (l, w) => s"WHEN lang = '$l' THEN ${(w * 100).toInt % 100}" }
      .mkString("CASE ", " ", s" ELSE ${(mixDefaultWeight * 100).toInt % 100} END")
    s"""SELECT doc_id, lang, unnest(generate_series(1,
       |  ($wholeSql) + (CASE WHEN ${hashBucketSql("mix:", "doc_id")}
       |    < ($fracSql) THEN 1 ELSE 0 END))) AS copy
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------- sequence packing

  private[graft] val packBudget = 1024L
  private[graft] val numShards = 32

  /** Token-budget sequence packing, shard-parallel: docs are hashed into
    * 32 shards, ordered by doc_id within shard, and assigned pack_id =
    * floor(running-token-count-before / budget) — contiguous docs fill a
    * pack until the budget spills into the next. */
  def seqPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(Dedup.tokens(col("text"))).cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(numShards)).cast("long"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / packBudget).cast("long"))
      .select("doc_id", "shard", "n_tokens", "cum_before", "pack_id")
  }

  // DuckDB's windowed sum(BIGINT) widens to HUGEINT; the outer CAST pins
  // the column (and the // quotient) back to BIGINT to match Spark's longs.
  val seqPackingSql: String =
    s"""SELECT doc_id,
       |  doc_id % $numShards AS shard,
       |  CAST(len(${Dedup.tokensSql("text")}) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(sum(CAST(len(${Dedup.tokensSql("text")}) AS BIGINT)) OVER (
       |    PARTITION BY doc_id % $numShards ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
       |  CAST(coalesce(sum(CAST(len(${Dedup.tokensSql("text")}) AS BIGINT)) OVER (
       |    PARTITION BY doc_id % $numShards ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // $packBudget AS pack_id
       |FROM documents""".stripMargin

  /** Packing-efficiency audit of [[seqPacking]] — per shard: docs, packs,
    * token mass, fill ratio (1e-6 fixed point of pack-budget capacity),
    * and how many packs OVERFLOW the budget (a doc longer than the
    * remaining space stays in the pack where it started — the spill rule
    * — so fill can exceed 1.0; a rising overfull count means documents
    * outgrew the budget and the loader will truncate). The training-side
    * waste metric for the packing stage: fill well below 1.0 across
    * shards = GPUs padding, overfull = sequences clipped.
    * Shape: re-aggregations of the packing output — (shard, pack) then
    * shard — nothing touches the corpus a second time. */
  def packingEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val packs = seqPacking(spark, dir)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("used"))
    packs.groupBy("shard").agg(
      sum("n_docs").as("n_docs"),
      count(lit(1)).as("n_packs"),
      sum("used").as("total_tokens"),
      sum(when(col("used") > packBudget, 1L).otherwise(0L)).as("n_overfull"))
      .withColumn("fill_fp",
        expr(s"(total_tokens * 1000000) div (n_packs * $packBudget)"))
  }

  val packingEfficiencySql: String =
    s"""WITH sp AS (
       |  SELECT * FROM ($seqPackingSql)
       |), packs AS (
       |  SELECT shard, pack_id, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS used
       |  FROM sp GROUP BY 1, 2
       |)
       |SELECT shard, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  count(*) AS n_packs,
       |  CAST(sum(used) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN used > $packBudget THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_overfull,
       |  (CAST(sum(used) AS BIGINT) * 1000000)
       |    // (count(*) * $packBudget) AS fill_fp
       |FROM packs GROUP BY 1""".stripMargin

  // --------------------------------------------------- balanced shard plan

  private[graft] val planShards = 8

  /** Token-BALANCED shard assignment — the write-planning step before a
    * training export: [[seqPacking]] fills packs in arrival order inside
    * hash shards, which balances DOC COUNTS but lets token mass skew when
    * long docs clump; this operator instead plans shards so every shard
    * carries near-equal token mass, the property that equalizes epoch
    * wall-clock across data-parallel readers.
    *
    * Algorithm: serpentine (snake / boustrophedon) assignment over the
    * size-sorted corpus — rank docs by (n_tokens desc, doc_id), then deal
    * rank r to shard `r mod S` on even blocks and `S-1 - r mod S` on odd
    * blocks. The zigzag cancels the within-block monotonicity of the deal,
    * so shard totals differ by at most one block's spread — the standard
    * O(1)-state alternative to greedy LPT (which needs a sequential heap
    * and is NOT expressible as a distributed plan).
    *
    * Scale shape — the one global ORDER is computed WITHOUT a single-task
    * sort: `Window.orderBy` with no partition key would pull the corpus
    * through one task, so the rank comes from a range-repartitioned
    * within-partition sort plus `zipWithIndex` (partition-count prefix
    * offsets + local position — one extra count job, no driver data).
    * This is the (d)-tier RDD escape hatch, justified: Spark SQL has no
    * distributed global row_number. Rank determinism does not depend on
    * the sampled range boundaries — partitions are range-disjoint and
    * internally sorted, so offset+position reproduces the unique total
    * order (n_tokens desc, doc_id asc) whatever the boundary sample drew.
    * Everything after the rank is per-row arithmetic + one S-row agg.
    *
    * Output per shard: doc count, token mass, largest single doc, and the
    * shard's share of corpus tokens in 1e-6 fixed point (exact-int-to-
    * double conversions + one IEEE divide + floor — deterministic
    * cross-engine). ShardPlanSpec pins the balance property itself. */
  def shardPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val S = planShards
    val sized = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
    val ranked = sized
      .repartitionByRange(col("n_tokens").desc, col("doc_id").asc)
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id").asc)
      .as[(Long, Long)].rdd.zipWithIndex()
      .map { case ((docId, nTok), rn) => (docId, nTok, rn) }
      .toDF("doc_id", "n_tokens", "rn")
    val assigned = ranked
      .withColumn("shard",
        when(expr(s"(rn div $S) % 2") === 0L, expr(s"rn % $S"))
          .otherwise(lit(S - 1L) - expr(s"rn % $S")))
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        max("n_tokens").as("max_doc_tokens"))
      .crossJoin(broadcast(sized.agg(sum("n_tokens").as("corpus_tokens"))))
      .withColumn("tok_share_fp",
        floor(col("total_tokens").cast("double") * 1000000.0 /
          col("corpus_tokens").cast("double")).cast("long"))
      .select("shard", "n_docs", "total_tokens", "max_doc_tokens",
        "tok_share_fp")
  }

  val shardPlanSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(${Dedup.tokensSql("text")}) AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rn
       |  FROM t
       |), a AS (
       |  SELECT n_tokens,
       |    CAST(CASE WHEN (rn // $planShards) % 2 = 0 THEN rn % $planShards
       |      ELSE ${planShards - 1} - (rn % $planShards) END AS BIGINT) AS shard
       |  FROM r
       |)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  max(n_tokens) AS max_doc_tokens,
       |  CAST(floor(CAST(sum(n_tokens) AS DOUBLE) * 1000000.0 /
       |    CAST((SELECT sum(n_tokens) FROM t) AS DOUBLE)) AS BIGINT)
       |    AS tok_share_fp
       |FROM a GROUP BY 1""".stripMargin

  // ---------------------------------------------- quality-budget selection

  private[graft] val selectBudgetTokens = 15000L

  /** Token-BUDGET quality selection — "take the best documents until the
    * budget is spent", the FineWeb-Edu-style curation step that turns a
    * scored corpus plus a target token count into a training set: rank
    * docs by ([[TextAnalysis.textStatsOf]] quality_score desc, doc_id),
    * accumulate token counts in rank order, and keep every doc whose
    * running total STARTS under the budget (the doc that crosses the line
    * is kept whole — same spill rule as [[seqPacking]]; truncating it is
    * the loader's decision, not the selector's).
    *
    * Scale shape — the global rank AND the global prefix-sum both run
    * distributed: range-repartition on the sort key, then (1) one tiny
    * job collects per-partition TOKEN SUBTOTALS (one long per partition),
    * (2) the prefix offsets broadcast back and each partition streams its
    * rows adding its own running sum — the textbook two-pass distributed
    * scan, same shape [[shardPlan]] uses for ranks. No single-task
    * window, no driver data beyond one long per partition. The two
    * passes MUST run over the same materialized `rdd` (they do: one
    * `val rdd`, one shuffle) — the offsets are per-PARTITION, so a
    * refactor that rebuilt the frame per pass could draw different range
    * boundaries and apply pass-1 offsets to differently-split
    * partitions. Past the budget, partitions are SKIPPED outright (their
    * start offset already exceeds it) and the crossing partition stops
    * consuming its iterator at the crossing row — pass-2 cost is
    * O(selected), not O(corpus). The projection is evaluated once per
    * pass (two scans of a 3-column frame); at 100 TB the first pass's
    * subtotal job reads the same pruned columns, not the corpus text. */
  /** Budget-prefix selection core, shared by the heuristic and LEARNED
    * rankers: input (doc_id, score, n_tokens), rank by (score desc,
    * doc_id asc), keep every row whose cumulative token count BEFORE it
    * is under the budget. Range-partition + per-partition offsets — the
    * global sort never lands on one task. */
  private def budgetPrefix(df: DataFrame, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scored = df
      .select(col("doc_id").cast("long"), col("score").cast("double"),
        col("n_tokens").cast("long"))
      .repartitionByRange(col("score").desc, col("doc_id").asc)
      .sortWithinPartitions(col("score").desc, col("doc_id").asc)
      .as[(Long, Double, Long)]
    val rdd = scored.rdd
    val subtotals = rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator.single((i, it.map(_._3).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      if (acc >= budget) Iterator.empty // whole partition past the budget
      else new Iterator[(Long, Double, Long, Long)] {
        // rows are rank-ordered, so the first row STARTING at or past
        // the budget ends the selection — stop pulling the iterator
        def hasNext: Boolean = acc < budget && it.hasNext
        def next(): (Long, Double, Long, Long) = {
          val (docId, q, nTok) = it.next()
          acc += nTok
          (docId, q, nTok, acc)
        }
      }
    }.toDF("doc_id", "score", "n_tokens", "cum_tokens")
  }

  def qualityBudgetSelect(spark: SparkSession, dir: String): DataFrame =
    budgetPrefix(
      TextAnalysis.textStatsOf(Tables.documents(spark, dir))
        .select(col("doc_id"), col("quality_score").as("score"),
          col("n_tokens")),
      selectBudgetTokens)
      .select(col("doc_id"), col("score").as("quality_score"),
        col("n_tokens"), col("cum_tokens"))

  /** The selector A/B a pipeline owner runs before SWITCHING scorers
    * (VERDICT r13 #7): rank the same corpus by the heuristic quality
    * score AND by the learned NB log-odds
    * ([[TextAnalysis.nbQualityLogOdds]] — the distilled scorer
    * `nb_quality_classify` trains), cut both at the same token budget,
    * and report the selection overlap. A high Jaccard says the student
    * reproduces the teacher's cut and the cheap scorer can take over; a
    * low one names exactly how many documents would enter/leave the
    * training set on switch. Exactness: the learned score is integer
    * sfp (ordering preserved through the double cast far below 2^53),
    * ties break on doc_id in both engines, counts are exact ppm.
    *
    * Scale shape: the NB scoring join is term-keyed like the
    * classifier's; each selection is the same range-partitioned prefix
    * as [[qualityBudgetSelect]]; the overlap is one doc-keyed
    * full-outer join collapsed map-side to a single row. */
  def budgetSelectLearned(spark: SparkSession, dir: String): DataFrame = {
    // pinned like the learned frame below: budgetPrefix's two jobs plus
    // the overlap agg would otherwise re-run the corpus-scale
    // tokenization scan three times (r14 review, second pass)
    val stats = Dedup.eager(
      TextAnalysis.textStatsOf(Tables.documents(spark, dir))
        .select(col("doc_id"), col("quality_score"), col("n_tokens")))
    // the learned leg's teacher labels derive from the SAME pinned stats
    // frame (one corpus tokenize+score pass instead of two — r18)
    val odds = TextAnalysis.nbQualityLogOddsFrom(spark, dir, stats)
    val h = budgetPrefix(
      stats.select(col("doc_id"), col("quality_score").as("score"),
        col("n_tokens")), selectBudgetTokens).select("doc_id")
    // budgetPrefix runs TWO jobs over its input (subtotal collect +
    // output scan) and the final overlap agg a third — for the
    // heuristic side that input is a cheap stats projection, but the
    // learned side embeds the whole NB train+score DAG, so pin the
    // tiny (doc_id, score, n_tokens) frame once instead of re-scoring
    // the corpus per pass (r14 self-review finding)
    val learnedScored = Dedup.eager(
      stats.join(odds, "doc_id")
        .select(col("doc_id"), col("log_odds").as("score"), col("n_tokens")))
    val l = budgetPrefix(learnedScored, selectBudgetTokens).select("doc_id")
    h.withColumn("h", lit(1))
      .join(l.withColumn("l", lit(1)), Seq("doc_id"), "full_outer")
      .agg(count(col("h")).as("n_heur"), count(col("l")).as("n_learned"),
        count(when(col("h").isNotNull && col("l").isNotNull, 1)).as("n_both"))
      .withColumn("jaccard_ppm",
        expr("n_both * 1000000 div (n_heur + n_learned - n_both)"))
  }

  val budgetSelectLearnedSql: String =
    s"""${TextAnalysis.nbQualityOddsCtes},
       |hr AS (
       |  SELECT doc_id,
       |    CAST(coalesce(sum(n_tokens) OVER (
       |      ORDER BY quality_score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before
       |  FROM q
       |),
       |hsel AS (SELECT doc_id FROM hr WHERE cum_before < $selectBudgetTokens),
       |lr AS (
       |  SELECT q.doc_id,
       |    CAST(coalesce(sum(q.n_tokens) OVER (
       |      ORDER BY o.log_odds DESC, q.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before
       |  FROM q JOIN odds o USING (doc_id)
       |),
       |lsel AS (SELECT doc_id FROM lr WHERE cum_before < $selectBudgetTokens)
       |SELECT n_heur, n_learned, n_both,
       |  (n_both * 1000000) // (n_heur + n_learned - n_both) AS jaccard_ppm
       |FROM (
       |  SELECT (SELECT count(*) FROM hsel) AS n_heur,
       |    (SELECT count(*) FROM lsel) AS n_learned,
       |    (SELECT count(*) FROM hsel JOIN lsel USING (doc_id)) AS n_both
       |)""".stripMargin

  val qualityBudgetSelectSql: String =
    s"""WITH ${TextAnalysis.textStatsCtes("documents")},
       |q AS (
       |  SELECT doc_id, quality_score, n_tokens
       |  FROM (${TextAnalysis.textStatsSelect})
       |), r AS (
       |  SELECT doc_id, quality_score, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (
       |      ORDER BY quality_score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before
       |  FROM q
       |)
       |SELECT doc_id, quality_score, n_tokens,
       |  cum_before + n_tokens AS cum_tokens
       |FROM r WHERE cum_before < $selectBudgetTokens""".stripMargin

  // -------------------------------------- length-distribution matching

  private[graft] val lmsBucketChars = 100L

  /** Distribution-MATCHING rejection sampler: thin the training corpus so
    * its length profile matches a reference distribution (here the eval
    * holdout slice, `doc_id % 47 == 3` — the same slice every
    * decontamination query uses; production points this at whatever
    * profile the eval/deployment traffic has). Classic rejection
    * sampling: per length bucket, acceptance ∝ target density / source
    * density, normalized by the max ratio so the densest-needed bucket
    * keeps everything and every other bucket thins proportionally —
    * after the gate, kept shares converge to target shares (up to
    * binomial noise, which the report exposes side by side).
    *
    * All decisions are exact integers: the density ratio quantizes to
    * 1e-6 fixed point (`a_fp = t_b·s_tot·1e6 div (s_b·t_tot)`), the
    * per-doc draw is the salted-md5 integer gate every sampler here
    * uses, and the keep test is one cross-multiplication — no float
    * crosses engines. Source buckets absent from the target get a_fp = 0
    * (dropped: the target has no mass there); target-only buckets cannot
    * be sampled into existence and are correctly absent from the report.
    *
    * Shape: ONE map-combinable (bucket, is_eval) count over the corpus —
    * target/source margins and totals all derive from that bucket-sized
    * frame, never from re-scans — the rate table broadcasts (it is
    * O(buckets), not O(rows)), and the keep decision is a stateless
    * scan-side filter, so the whole operator is two corpus reads (count
    * + gate). BIGINT headroom: `t_b·s_tot·1e6` needs t_b·s_tot under
    * ~9e12 — fine to ~3M-doc targets against 3M-doc sources per bucket;
    * a web-scale run re-quantizes the ratio at 1e-3 or moves it to
    * doubles (losing the oracle, not the plan), the same documented
    * trade as `kn_perplexity`. */
  def lengthMatchSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("bucket", expr(s"n_chars div $lmsBucketChars"))
      .withColumn("is_eval",
        col("doc_id") % decontEvalMod === decontEvalRem)
    // the ONE corpus-scale aggregate; everything below is bucket-sized
    val c = d.groupBy("bucket", "is_eval").agg(count(lit(1)).as("n"))
    val tb = c.filter(col("is_eval")).select(col("bucket"), col("n").as("t_b"))
    val sb = c.filter(!col("is_eval")).select(col("bucket"), col("n").as("s_b"))
    val tot = c.agg(
      sum(when(col("is_eval"), col("n")).otherwise(0L)).as("t_tot"),
      sum(when(!col("is_eval"), col("n")).otherwise(0L)).as("s_tot"))
    val rates = sb.join(tb, Seq("bucket"), "left").na.fill(0L, Seq("t_b"))
      .crossJoin(broadcast(tot))
      .withColumn("a_fp", expr("t_b * s_tot * 1000000L div (s_b * t_tot)"))
    val mfp = rates.agg(max("a_fp").as("m_fp"))
    val draw = conv(substring(
        md5(concat(lit("lmatch:"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long") % 1000000L
    val keptB = d.filter(!col("is_eval"))
      .join(broadcast(rates.select("bucket", "a_fp")), Seq("bucket"))
      .crossJoin(broadcast(mfp))
      .filter(draw * col("m_fp") < col("a_fp") * 1000000L)
      .groupBy("bucket").agg(count(lit(1)).as("n_kept"))
    val kt = keptB.agg(sum("n_kept").cast("long").as("k_tot"))
    rates.join(keptB, Seq("bucket"), "left").na.fill(0L, Seq("n_kept"))
      .crossJoin(broadcast(kt))
      .withColumn("target_share_fp", expr("t_b * 1000000L div t_tot"))
      .withColumn("kept_share_fp",
        expr("CASE WHEN k_tot > 0 THEN n_kept * 1000000L div k_tot ELSE 0L END"))
      .select("bucket", "s_b", "t_b", "n_kept", "a_fp",
        "target_share_fp", "kept_share_fp")
  }

  // lazy: decontEvalMod/Rem are defined later in this object and would
  // interpolate as 0 during eager top-to-bottom val initialization
  lazy val lengthMatchSampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars // $lmsBucketChars AS bucket,
       |    (doc_id % $decontEvalMod = $decontEvalRem) AS is_eval
       |  FROM documents
       |), c AS (
       |  SELECT bucket, is_eval, count(*) AS n FROM d GROUP BY 1, 2
       |), tb AS (
       |  SELECT bucket, n AS t_b FROM c WHERE is_eval
       |), sb AS (
       |  SELECT bucket, n AS s_b FROM c WHERE NOT is_eval
       |), tot AS (
       |  SELECT
       |    CAST(sum(CASE WHEN is_eval THEN n ELSE 0 END) AS BIGINT) AS t_tot,
       |    CAST(sum(CASE WHEN NOT is_eval THEN n ELSE 0 END) AS BIGINT) AS s_tot
       |  FROM c
       |), r AS (
       |  SELECT sb.bucket, s_b, coalesce(t_b, 0) AS t_b,
       |    coalesce(t_b, 0) * s_tot * 1000000 // (s_b * t_tot) AS a_fp,
       |    t_tot
       |  FROM sb LEFT JOIN tb USING (bucket) CROSS JOIN tot
       |), m AS (
       |  SELECT max(a_fp) AS m_fp FROM r
       |), k AS (
       |  SELECT d.bucket, count(*) AS n_kept
       |  FROM d JOIN r ON d.bucket = r.bucket CROSS JOIN m
       |  WHERE NOT is_eval
       |    AND (CAST(('0x' || substr(md5('lmatch:' || CAST(doc_id AS VARCHAR)),
       |      1, 8)) AS BIGINT) % 1000000) * m_fp < a_fp * 1000000
       |  GROUP BY 1
       |), kt AS (
       |  SELECT CAST(coalesce(sum(n_kept), 0) AS BIGINT) AS k_tot FROM k
       |)
       |SELECT r.bucket, CAST(s_b AS BIGINT) AS s_b, CAST(t_b AS BIGINT) AS t_b,
       |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(a_fp AS BIGINT) AS a_fp,
       |  CAST(t_b * 1000000 // t_tot AS BIGINT) AS target_share_fp,
       |  CAST(CASE WHEN k_tot > 0
       |    THEN coalesce(n_kept, 0) * 1000000 // k_tot ELSE 0 END AS BIGINT)
       |    AS kept_share_fp
       |FROM r LEFT JOIN k USING (bucket) CROSS JOIN kt""".stripMargin

  // -------------------------------------------------- integrity manifest

  /** Per-(lang, source) integrity MANIFEST — the reproducibility record a
    * dataset card publishes so a consumer can verify a delivered
    * partition byte-for-byte without re-reading the producer's copy: row
    * count, character mass, doc_id range, and an order-free content
    * checksum (bit_xor of each doc's 60-bit md5 prefix — XOR is
    * commutative/associative with no overflow, so the aggregate is exact
    * on any partitioning at any scale; the standard XOR-checksum caveat
    * — identical duplicate PAIRS cancel — is acceptable because any
    * single-document change, loss, or substitution flips the value).
    * One map-combinable aggregate; the md5 runs scan-side. */
  def corpusManifest(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fp60",
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("n_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        expr("bit_xor(fp60)").as("content_xor"))

  val corpusManifestSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      |  bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
      |    AS content_xor
      |FROM documents GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- shard export

  /** Training-shard sink: the corpus written as a partitioned parquet
    * layout (`split=train/validation/test`) with files capped at
    * `maxRecordsPerFile` rows — the directory shape a training loader
    * consumes (list one split dir, stream its shards).
    *
    * Scale posture: `partitionBy` here is a WRITE layout, not a shuffle —
    * each task writes its rows into per-split files in place, so the
    * export is one pass with no exchange; the record cap bounds shard
    * size whatever the input skew. Readers get static partition pruning
    * on `split` for free (pinned by `CorpusSinkSpec`): a `split='train'`
    * filter never lists, let alone reads, the other splits' files. */
  def exportShards(df: DataFrame, out: String, maxRecordsPerFile: Long): Unit =
    df.write
      .partitionBy("split")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
      .parquet(out)

  /** The frame [[exportShards]] is meant for: every doc with its split
    * and token count (what a loader needs to budget batches). */
  def shardFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .join(corpusSplit(spark, dir).select("doc_id", "split"), "doc_id")
      .select(col("doc_id"), col("text"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"),
        col("split"))

  // ------------------------------------------------- decontamination

  private val decontEvalMod = 47L
  private val decontEvalRem = 3L

  /** Benchmark DECONTAMINATION — the pipeline step that keeps eval data
    * out of the training corpus: flag every training document sharing at
    * least one word-3-shingle with any held-out document (here the
    * deterministic ~2% slice `doc_id % 47 == 3` stands in for the
    * benchmark suite; a real run substitutes its eval files on the same
    * shape). Output per contaminated doc: how many distinct shingles
    * leak (`n_shared_ngrams`) and how many eval docs it collides with
    * (`n_eval_docs`) — the triage columns for a drop-vs-inspect
    * decision.
    *
    * Scale shape: a REAL eval suite is small by nature (benchmarks, not
    * corpora), and with one its shingle table broadcasts — one corpus
    * scan, no shuffle of the training side. This stand-in slice is
    * instead PROPORTIONAL to the corpus (~2% of all shingles), so a
    * forced `broadcast()` hint would OOM the driver at the 100 TB scale
    * this scaladoc claims (ADVICE r6). The hint is therefore omitted: at
    * real-eval sizes Spark's size estimate (or AQE's runtime one) picks
    * the broadcast join on its own, and when the eval side genuinely
    * outgrows `autoBroadcastJoinThreshold` the plan degrades to a
    * shuffled hash join instead of an OOM. The per-doc aggregate
    * carries matched rows only. Shingling reuses
    * [[Dedup.shingleRows]]'s primitive loop (distinct per doc). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleRows(Tables.documents(spark, dir))
    val evalSh = sh.filter(col("doc_id") % decontEvalMod === decontEvalRem)
      .select(col("sh"), col("doc_id").as("eval_id"))
    val trainSh = sh.filter(col("doc_id") % decontEvalMod =!= decontEvalRem)
    trainSh.join(evalSh, "sh")
      .groupBy("doc_id")
      .agg(countDistinct("sh").as("n_shared_ngrams"),
        countDistinct("eval_id").as("n_eval_docs"))
  }

  private val reportQualityCut = 0.25 // report threshold for "low quality"

  /** One-row DATASET CARD — the corpus-level summary a training-data
    * release ships (and the first thing a 100 TB run prints): doc/token/
    * char volume, language spread, exact-duplicate mass, and the count
    * under the quality cut. Every column is an exact integer count (the
    * quality gate compares each doc's deterministic score to the cut
    * per-row — no float is ever summed, so the row is bit-stable
    * cross-engine). Shape: two scans (stats projection + digest groupBy)
    * collapsing map-side to 1-row/tiny aggregates, then broadcast-joined
    * — nothing scales with the corpus but the scans. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stats = TextAnalysis.textStatsOf(docs)
    val s1 = stats.agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      sum("len_chars").as("n_chars"),
      sum(when(col("quality_score") < reportQualityCut, 1L).otherwise(0L))
        .as("low_quality_docs"))
    val s2 = docs.agg(countDistinct("lang").as("n_langs"))
    val s3 = docs.groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L))
        .as("dup_docs"))
    s1.crossJoin(s2).crossJoin(s3)
  }

  val corpusReportSql: String =
    s"""WITH ${TextAnalysis.textStatsCtes("documents")},
       |st AS (${TextAnalysis.textStatsSelect}),
       |a1 AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(len_chars) AS BIGINT) AS n_chars,
       |    CAST(sum(CASE WHEN quality_score < $reportQualityCut
       |      THEN 1 ELSE 0 END) AS BIGINT) AS low_quality_docs
       |  FROM st
       |),
       |a2 AS (SELECT count(DISTINCT lang) AS n_langs FROM documents),
       |a3 AS (
       |  SELECT coalesce(CAST(sum(CASE WHEN c >= 2 THEN c END) AS BIGINT), 0)
       |    AS dup_docs
       |  FROM (SELECT md5(text) AS fp, count(*) AS c FROM documents GROUP BY 1)
       |)
       |SELECT n_docs, n_tokens, n_chars, low_quality_docs, n_langs, dup_docs
       |FROM a1 CROSS JOIN a2 CROSS JOIN a3""".stripMargin

  /** Span-level decontamination — the SURGICAL form of [[decontaminate]]
    * (which only FLAGS training docs sharing n-grams with the held-out
    * slice): every 10-token window of a training doc that appears
    * verbatim in the eval slice is CUT OUT of the training text, Lee
    * et-al.-style, instead of dropping the whole doc. Same batch-vs-base
    * core as `span_dedup_incremental` ([[Dedup.spanCleanAgainstBase]])
    * with (train, eval) in the (batch, base) roles: one training-corpus
    * scan, one digest semi-join against the (small, broadcastable) eval
    * span set — at 100 TB the eval set is fixed-size, so this is a
    * shuffle-light map over the corpus. */
  def decontaminateSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.spanCleanAgainstBase(
      docs.filter(col("doc_id") % decontEvalMod =!= decontEvalRem),
      Dedup.baseSpanDigests(
        docs.filter(col("doc_id") % decontEvalMod === decontEvalRem)))
  }

  val decontaminateSpansSql: String = Dedup.spanCleanSql(
    s"doc_id % $decontEvalMod <> $decontEvalRem",
    s"doc_id % $decontEvalMod = $decontEvalRem")

  val decontaminateSql: String =
    s"""WITH tt AS (
       |  SELECT doc_id, ${Dedup.tokensSql("text")} AS toks FROM documents
       |), shx AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql("toks")}) AS sh FROM tt
       |), e AS (
       |  SELECT sh, doc_id AS eval_id FROM shx
       |  WHERE doc_id % $decontEvalMod = $decontEvalRem
       |), tr AS (
       |  SELECT doc_id, sh FROM shx
       |  WHERE doc_id % $decontEvalMod <> $decontEvalRem
       |)
       |SELECT tr.doc_id, count(DISTINCT tr.sh) AS n_shared_ngrams,
       |  count(DISTINCT eval_id) AS n_eval_docs
       |FROM tr JOIN e USING (sh) GROUP BY 1""".stripMargin

  // ------------------------------------------------- curation funnel

  /** CURATION FUNNEL — per-document drop attribution across the corpus
    * gates, in pipeline order: every document is assigned the FIRST stage
    * that removes it (eval holdout → near-duplicate cluster loser →
    * quality-score gate → n-gram eval contamination → kept), and the
    * funnel reports each stage's document count and corpus share. This is
    * the audit a pipeline team reads before touching thresholds: the
    * existing queries say WHO each gate drops; this one says WHERE each
    * document exits, so a threshold change's blast radius is one query
    * away (and `kept`'s share is the corpus yield number a run reports).
    *
    * Stage semantics reuse the shipped gates verbatim — near-dup loser =
    * NOT [[dedupClusters]]' `is_keeper` (component-min survivorship over
    * the exact+Jaccard edge graph), quality = [[corpusClean]]'s
    * `quality_score < 0.2` on the same [[TextAnalysis.textStatsOf]]
    * score (docs the stats cannot score, i.e. zero-token, count as
    * fail), contamination = [[decontaminate]]'s shared-shingle hit on
    * the `doc_id % 47 == 3` eval slice — so the funnel can never
    * disagree with the gates it summarizes.
    *
    * Scale shape: three flag frames, each itself the gate's own shape
    * (the component propagation; the stats projection; the shingle
    * semi-join), joined back on doc_id — hash joins on the primary key,
    * no payload wider than a boolean/double after each gate's own scan.
    * The final agg is ≤5 rows; the corpus total rides a 1-row broadcast,
    * so shares are integer division, not a driver count. */
  /** Per-document stage assignment behind [[curationFunnel]], exposed so
    * CurationFunnelSpec can pin first-failing semantics per doc. */
  private[graft] def curationStages(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nd = dedupClusters(spark, dir).filter(!col("is_keeper"))
      .select(col("doc_id"), lit(true).as("is_dup"))
    val qs = TextAnalysis.textStatsOf(docs)
      .select(col("doc_id"), col("quality_score"))
    val ct = decontaminate(spark, dir).select(col("doc_id"), lit(true).as("hit"))
    docs.select("doc_id")
      .join(nd, Seq("doc_id"), "left")
      .join(qs, Seq("doc_id"), "left")
      .join(ct, Seq("doc_id"), "left")
      .withColumn("stage_id",
        when(col("doc_id") % decontEvalMod === decontEvalRem, 0L)
          .when(coalesce(col("is_dup"), lit(false)), 1L)
          .when(coalesce(col("quality_score"), lit(0.0)) < qualityMin, 2L)
          .when(coalesce(col("hit"), lit(false)), 3L)
          .otherwise(4L))
      .select("doc_id", "stage_id")
  }

  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    curationStages(spark, dir).groupBy("stage_id").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("total"))))
      .withColumn("stage",
        when(col("stage_id") === 0L, "eval_holdout")
          .when(col("stage_id") === 1L, "near_dup")
          .when(col("stage_id") === 2L, "quality")
          .when(col("stage_id") === 3L, "contaminated")
          .otherwise("kept"))
      .withColumn("share_fp", expr("(n_docs * 1000000) div total"))
      .select("stage_id", "stage", "n_docs", "share_fp")
  }

  val curationFunnelSql: String =
    s"""WITH ${TextAnalysis.textStatsCtes("documents")},
       |qs AS (
       |  SELECT doc_id, quality_score FROM (${TextAnalysis.textStatsSelect})
       |), nd AS (
       |  SELECT doc_id, TRUE AS is_dup FROM ($dedupClustersSql)
       |  WHERE NOT is_keeper
       |), ct AS (
       |  SELECT doc_id, TRUE AS hit FROM ($decontaminateSql)
       |), st AS (
       |  SELECT d.doc_id,
       |    CAST(CASE WHEN d.doc_id % $decontEvalMod = $decontEvalRem THEN 0
       |      WHEN coalesce(nd.is_dup, FALSE) THEN 1
       |      WHEN coalesce(qs.quality_score, 0.0) < $qualityMin THEN 2
       |      WHEN coalesce(ct.hit, FALSE) THEN 3
       |      ELSE 4 END AS BIGINT) AS stage_id
       |  FROM documents d
       |  LEFT JOIN nd USING (doc_id)
       |  LEFT JOIN qs USING (doc_id)
       |  LEFT JOIN ct USING (doc_id)
       |), tot AS (
       |  SELECT count(*) AS total FROM documents
       |)
       |SELECT stage_id,
       |  CASE stage_id WHEN 0 THEN 'eval_holdout' WHEN 1 THEN 'near_dup'
       |    WHEN 2 THEN 'quality' WHEN 3 THEN 'contaminated'
       |    ELSE 'kept' END AS stage,
       |  count(*) AS n_docs,
       |  (count(*) * 1000000) // max(tot.total) AS share_fp
       |FROM st CROSS JOIN tot GROUP BY stage_id""".stripMargin

  /** Temperature-rebalanced mixture PLANNER (the UniMax / multilingual
    * temperature-sampling shape, tau = 2): where [[corpusMixture]]
    * applies FIXED per-language weights, this derives them from the
    * corpus itself — p_l proportional to sqrt(n_l) — and emits the plan
    * a mixture job consumes: per language, the observed share and the
    * temperature share, both in exact 1e-6 fixed point.
    *
    * Exactness: sqrt(n) is one correctly-rounded IEEE op on an exact
    * count; it is quantized to a 1e-6 fixed-point LONG before anything
    * sums or divides, so the cross-language total is an exact integer
    * and every share is integer division (non-negative operands:
    * truncation == floor in both engines). The output is ALL integers —
    * no float ever crosses rows.
    *
    * Scale shape: one map-combinable language agg (a key space of
    * |languages|), one 1-row broadcast of the totals — nothing else. */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w_fp",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
    val tot = perLang.agg(sum("n_docs").as("n_total"), sum("w_fp").as("w_total"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("w_fp"),
        expr("(n_docs * 1000000) div n_total").as("prop_share_fp"),
        expr("(w_fp * 1000000) div w_total").as("temp_share_fp"))
  }

  val mixturePlanSql: String =
    """WITH p AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |      AS w_fp
      |  FROM documents GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
      |    CAST(sum(w_fp) AS BIGINT) AS w_total FROM p
      |)
      |SELECT lang, n_docs, w_fp,
      |  (n_docs * 1000000) // n_total AS prop_share_fp,
      |  (w_fp * 1000000) // w_total AS temp_share_fp
      |FROM p CROSS JOIN t""".stripMargin

  /** Term-distribution DRIFT monitor — the data-quality alarm a
    * continuously-fed corpus needs: compare the incoming batch's token
    * distribution (deterministic split: every 3rd doc plays "today's
    * crawl") against the base corpus and surface the terms whose
    * frequency share moved most. A sudden drift top-list full of one
    * domain's vocabulary is how template floods, encoding bugs, and
    * scraper loops get caught before they enter training.
    *
    * Exactness: per-split term counts and totals are exact integers;
    * each share quantizes to 1e-6 fixed point by integer division
    * (non-negative, so truncation == floor in both engines) BEFORE the
    * difference — the drift score is a pure integer. Rare-term noise is
    * gated by a minimum combined count.
    *
    * Scale shape: ONE scan+explode (the split tag rides along, so base
    * and batch counts come from the same map-combinable term agg as
    * conditional sums), a 1-row totals broadcast, TakeOrdered(20) —
    * never a global sort, and the term key space cannot concentrate. */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select((col("doc_id") % 3 === 0).as("isNew"),
        explode(Dedup.tokens(col("text"))).as("term"))
    val counts = toks.groupBy("term").agg(
      sum(when(col("isNew"), 1L).otherwise(0L)).as("c_new"),
      sum(when(col("isNew"), 0L).otherwise(1L)).as("c_base"))
    val tot = counts.agg(sum("c_new").as("n_new"), sum("c_base").as("n_base"))
    val scored = counts
      .filter(col("c_new") + col("c_base") >= 5L)
      .crossJoin(broadcast(tot))
      .withColumn("drift_fp",
        abs(expr("(c_new * 1000000) div n_new") -
          expr("(c_base * 1000000) div n_base")))
      .select("term", "c_base", "c_new", "drift_fp")
    scored.orderBy(col("drift_fp").desc, col("term")).limit(20)
  }

  val corpusDriftSql: String =
    s"""WITH t AS (
       |  SELECT doc_id % 3 = 0 AS is_new, unnest(${Dedup.tokensSql("text")}) AS term
       |  FROM documents
       |), c AS (
       |  SELECT term,
       |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new,
       |    CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_base
       |  FROM t GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(c_new) AS BIGINT) AS n_new,
       |    CAST(sum(c_base) AS BIGINT) AS n_base FROM c
       |)
       |SELECT term, c_base, c_new,
       |  abs((c_new * 1000000) // n_new - (c_base * 1000000) // n_base) AS drift_fp
       |FROM c CROSS JOIN tot
       |WHERE c_new + c_base >= 5
       |ORDER BY drift_fp DESC, term LIMIT 20""".stripMargin

  // ---------------------------------------------------------- DSIR

  private val dsirBuckets = 1024L
  private val dsirTargetLang = "en"

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): estimate a TARGET unigram
    * distribution p (here: the `lang = 'en'` slice stands in for the
    * curated target corpus) and the RAW distribution q over hashed
    * n-gram features, then score every document by its importance
    * weight Σ log(p_b/q_b) over its feature occurrences — the docs the
    * target distribution "prefers". The paper resamples with Gumbel
    * noise; RNG is not oracle-expressible, so selection is the
    * deterministic above-corpus-mean test on the exact ratio signal
    * (integer cross-multiplied, the `above_mean_events` pattern) and
    * the full weight rides along for any downstream top-k/temperature
    * policy.
    *
    * Exactness: features hash through the engine-portable
    * [[Dedup.h60]] (md5-derived) into B=1024 buckets; p_b and q_b are
    * add-½-smoothed RATIONALS and each log2 is the same integer
    * ceil(−log2 ·) shift formula as [[TextAnalysis.lmPerplexity]]
    * (no transcendentals cross engines), giving the integer
    * `dbits(b) = s_q(b) − s_p(b)` ∈ log2(p_b/q_b) ± 1. The sub-bit
    * signal is `r_fp` — the exact ratio (nump·denq)/(denp·numq)
    * 1e-6-quantized; its cross-products stay < 2^53 up to ~1e7-token
    * buckets (far past sf1; at true 100 TB counts the ratio would
    * compute in log space off the same integer counts).
    *
    * Scale shape: one token scan; the model is a B-row table built by
    * ONE map-combined aggregate (target and raw counts in the same
    * pass) and BROADCAST into doc scoring — the corpus never joins
    * anything bigger than 1024 rows. Tokenless docs emit no row
    * (absence-is-reject, as [[TextAnalysis.textStats]]). */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(Dedup.tokens(col("text"))).as("term"))
      .withColumn("bkt", pmod(Dedup.h60(lit("dsir"), col("term")), lit(dsirBuckets)))
    val stats = toks.groupBy("bkt").agg(
      count(lit(1)).as("cq"),
      sum(when(col("lang") === dsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val tot = stats.agg(sum("cq").as("tq"), sum("ct").as("tt"))
    val model = stats.crossJoin(broadcast(tot))
      .withColumn("nump", col("ct") * 2L + 1L)
      .withColumn("denp", col("tt") * 2L + lit(dsirBuckets))
      .withColumn("numq", col("cq") * 2L + 1L)
      .withColumn("denq", col("tq") * 2L + lit(dsirBuckets))
      .withColumn("sftp",
        (length(bin(col("denp"))) - length(bin(col("nump")))).cast("int"))
      .withColumn("sftq",
        (length(bin(col("denq"))) - length(bin(col("numq")))).cast("int"))
      .withColumn("sp",
        when(col("nump") > expr("shiftright(denp - 1, sftp)"), col("sftp"))
          .otherwise(col("sftp") + 1).cast("long"))
      .withColumn("sq",
        when(col("numq") > expr("shiftright(denq - 1, sftq)"), col("sftq"))
          .otherwise(col("sftq") + 1).cast("long"))
      .withColumn("dbits", col("sq") - col("sp"))
      .withColumn("r_fp",
        floor((col("nump") * col("denq")).cast("double") /
          (col("denp") * col("numq")).cast("double") * 1000000.0 + 0.5)
          .cast("long"))
      .select("bkt", "dbits", "r_fp")
    val perDoc = toks.groupBy("doc_id", "lang", "bkt").agg(count(lit(1)).as("k"))
      .join(broadcast(model), "bkt")
      .groupBy("doc_id", "lang")
      .agg(sum("k").as("n_tokens"),
        sum(col("k") * col("dbits")).as("logw_bits"),
        sum(col("k") * col("r_fp")).as("s_rfp"))
    // selection: docs whose mean importance ratio beats the token-
    // weighted corpus mean — the integer cross-multiplied inequality
    // (above_mean_events pattern), never a float comparison
    val glob = perDoc.agg(sum("s_rfp").as("g_rfp"), sum("n_tokens").as("g_n"))
    perDoc.crossJoin(broadcast(glob))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("logw_bits"),
        (col("logw_bits").cast("double") / col("n_tokens")).as("bits_per_token"),
        (col("s_rfp").cast("double") / col("n_tokens") / 1000000.0).as("mean_ratio"),
        (col("s_rfp") * col("g_n") > col("g_rfp") * col("n_tokens")).as("selected"))
  }

  val dsirSelectSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, unnest(${Dedup.tokensSql("text")}) AS term
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, lang,
       |    ${Dedup.h60Sql("'dsir'", "term")} % $dsirBuckets AS bkt
       |  FROM t
       |), st AS (
       |  SELECT bkt, count(*) AS cq,
       |    CAST(sum(CASE WHEN lang = '$dsirTargetLang' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ct
       |  FROM b GROUP BY 1
       |), tt AS (
       |  SELECT CAST(sum(cq) AS BIGINT) AS tq, CAST(sum(ct) AS BIGINT) AS tt
       |  FROM st
       |), m0 AS (
       |  SELECT bkt, ct * 2 + 1 AS nump, tt * 2 + $dsirBuckets AS denp,
       |    cq * 2 + 1 AS numq, tq * 2 + $dsirBuckets AS denq
       |  FROM st CROSS JOIN tt
       |), m1 AS (
       |  SELECT bkt, nump, denp, numq, denq,
       |    length(bin(denp)) - length(bin(nump)) AS sftp,
       |    length(bin(denq)) - length(bin(numq)) AS sftq
       |  FROM m0
       |), m AS (
       |  SELECT bkt,
       |    CAST(CASE WHEN numq > ((denq - 1) >> sftq) THEN sftq
       |        ELSE sftq + 1 END AS BIGINT)
       |      - CAST(CASE WHEN nump > ((denp - 1) >> sftp) THEN sftp
       |        ELSE sftp + 1 END AS BIGINT) AS dbits,
       |    CAST(floor(CAST(nump * denq AS DOUBLE) / CAST(denp * numq AS DOUBLE)
       |      * 1000000.0 + 0.5) AS BIGINT) AS r_fp
       |  FROM m1
       |), db AS (
       |  SELECT doc_id, lang, bkt, count(*) AS k FROM b GROUP BY 1, 2, 3
       |), pd AS (
       |  SELECT doc_id, lang, CAST(sum(k) AS BIGINT) AS n_tokens,
       |    CAST(sum(k * dbits) AS BIGINT) AS logw_bits,
       |    CAST(sum(k * r_fp) AS BIGINT) AS s_rfp
       |  FROM db JOIN m USING (bkt) GROUP BY 1, 2
       |), g AS (
       |  SELECT CAST(sum(s_rfp) AS BIGINT) AS g_rfp,
       |    CAST(sum(n_tokens) AS BIGINT) AS g_n
       |  FROM pd
       |)
       |SELECT doc_id, lang, n_tokens, logw_bits,
       |  CAST(logw_bits AS DOUBLE) / n_tokens AS bits_per_token,
       |  CAST(s_rfp AS DOUBLE) / n_tokens / 1000000.0 AS mean_ratio,
       |  s_rfp * g_n > g_rfp * n_tokens AS selected
       |FROM pd CROSS JOIN g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsir_select" -> (dsirSelect _),
    "corpus_drift" -> (corpusDrift _),
    "mixture_plan" -> (mixturePlan _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_canonical" -> (dedupCanonical _),
    "dedup_profile" -> (dedupProfile _),
    "crossmodal_clusters" -> (crossmodalClusters _),
    "crossmodal_incremental" -> (crossmodalIncremental _),
    "url_dedup" -> (urlDedup _),
    "url_dedup_incremental" -> (urlDedupIncremental _),
    "url_host_profile" -> (urlHostProfile _),
    "dedup_channel_overlap" -> (dedupChannelOverlap _),
    "corpus_split" -> (corpusSplit _),
    "grouped_split_audit" -> (groupedSplitAudit _),
    "packing_efficiency" -> (packingEfficiency _),
    "shard_plan" -> (shardPlan _),
    "corpus_sample" -> (corpusSample _),
    "corpus_importance_sample" -> (corpusImportanceSample _),
    "corpus_mixture" -> (corpusMixture _),
    "seq_packing" -> (seqPacking _),
    "corpus_clean" -> (corpusClean _),
    "corpus_decontaminate" -> (decontaminate _),
    "decontaminate_spans" -> (decontaminateSpans _),
    "corpus_report" -> (corpusReport _),
    "corpus_domain_cap" -> (domainCap _),
    "curation_funnel" -> (curationFunnel _),
    "quality_budget_select" -> (qualityBudgetSelect _),
    "budget_select_learned" -> (budgetSelectLearned _),
    "corpus_manifest" -> (corpusManifest _),
    "length_match_sample" -> (lengthMatchSample _),
    "dedup_bcubed" -> (dedupBcubed _),
  )

  val oracles: Map[String, String] = Map(
    "dsir_select" -> dsirSelectSql,
    "corpus_drift" -> corpusDriftSql,
    "mixture_plan" -> mixturePlanSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_profile" -> dedupProfileSql,
    "crossmodal_clusters" -> crossmodalClustersSql,
    // the incremental merge must be hash-exact against the FULL closure
    "crossmodal_incremental" -> crossmodalClustersSql,
    "url_dedup" -> urlDedupSql,
    "url_dedup_incremental" -> urlDedupIncrementalSql,
    "url_host_profile" -> urlHostProfileSql,
    "dedup_channel_overlap" -> dedupChannelOverlapSql,
    "dedup_canonical" -> dedupCanonicalSql,
    "corpus_split" -> corpusSplitSql,
    "grouped_split_audit" -> groupedSplitAuditSql,
    "packing_efficiency" -> packingEfficiencySql,
    "shard_plan" -> shardPlanSql,
    "corpus_sample" -> corpusSampleSql,
    "corpus_importance_sample" -> corpusImportanceSampleSql,
    "corpus_mixture" -> corpusMixtureSql,
    "seq_packing" -> seqPackingSql,
    "corpus_clean" -> corpusCleanSql,
    "corpus_decontaminate" -> decontaminateSql,
    "decontaminate_spans" -> decontaminateSpansSql,
    "corpus_report" -> corpusReportSql,
    "corpus_domain_cap" -> domainCapSql,
    "curation_funnel" -> curationFunnelSql,
    "quality_budget_select" -> qualityBudgetSelectSql,
    "budget_select_learned" -> budgetSelectLearnedSql,
    "corpus_manifest" -> corpusManifestSql,
    "length_match_sample" -> lengthMatchSampleSql,
    "dedup_bcubed" -> dedupBcubedSql,
  )
}
