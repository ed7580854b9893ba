package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted deletion / right-to-be-forgotten over the corpus AND every
  * persisted dedup artifact derived from it — the lifecycle operation a
  * production training-data pipeline must support: deleting a document
  * from `documents` is not enough if its fingerprints live on in the
  * incremental-dedup bases, where they would keep suppressing ("this is
  * a dup of doc X") or mutilating (span removal) future content on
  * behalf of a document that no longer exists.
  *
  * Two halves:
  *
  *  - [[corpusForget]]: the oracle-gated accounting query — for a
  *    deterministic kill list (doc_id % 7 == 3), the row counts of every
  *    artifact family before the delete, after the ARTIFACT-LEVEL delete
  *    (what [[forgetIncrementalBase]]/[[forgetSpanBase]]/
  *    [[forgetEmbeddingBase]] produce by rewriting the stored bases), and
  *    after a full RE-DERIVE from the surviving corpus, plus the rows
  *    re-keyed to a new keeper. Artifact-level delete and re-derive agree
  *    everywhere except where the artifact stores strictly less than the
  *    corpus (a digest whose keeper died but whose text survives in a
  *    non-keeper copy can be re-keyed only with corpus access — the
  *    `rows_rekeyed` column counts exactly those).
  *
  *  - the `forget*Base` rewriters: the executable artifact-level delete
  *    for the four streaming base layouts
  *    ([[graft.streaming.StreamingIncrementalDedup]] `digests/` +
  *    `shingles/`, [[graft.streaming.StreamingSpanDedup]] `spans/`,
  *    [[graft.streaming.StreamingEmbeddingDedup]] `cells/`,
  *    [[graft.streaming.StreamingUrlDedup]] `canon/` — all under the
  *    [[graft.streaming.PartitionedBase]] per-batchId layout since r15),
  *    each materializing the surviving rows BEFORE the layout-preserving
  *    swap (the plan reads the same path it rewrites). A forget compacts
  *    the base into one `batch=-1` partition as a side effect; like the
  *    recrawl compactor, it must not run concurrently with the stream.
  *
  * 100 TB shape: every leg is a keyed anti-join against the (small,
  * broadcastable) kill list — O(artifact) scan, no self-join, no driver
  * materialization. The one corpus-wide cost is span attestation
  * ([[forgetSpanBase]]): `spans/` stores bare digests with no
  * provenance, so deciding which of the KILLED docs' spans any survivor
  * still attests needs one pass over the surviving corpus — but the
  * killed-span set is O(kill list) and broadcast, so that pass is a
  * map-side semi-join filter inside the scan: nothing but the (tiny)
  * attested subset ever reaches an exchange. That is the standard
  * batched-delete cost model (RTBF deletes run as periodic compactions,
  * not per-request scans).
  */
object Forget {

  private val forgetMod = 7L
  private val forgetRem = 3L
  private def killDoc = col("doc_id") % forgetMod === forgetRem
  private def killVec = col("vec_id") % forgetMod === forgetRem
  private val killSqlDoc = s"doc_id % $forgetMod = $forgetRem"
  private val killSqlVec = s"vec_id % $forgetMod = $forgetRem"

  // ---- artifact-level rewriters (streaming base layouts) -----------------

  /** Replace a [[graft.streaming.PartitionedBase]]-layout base dir with
    * `rows` (rolled into one `batch=-1` partition), materializing first:
    * the plan reads the very path it replaces, and a lazy overwrite would
    * delete its own input mid-scan. Layout-preserving — the streaming
    * twins' `batch < batchId` reads keep working after a forget. */
  private def rewrite(spark: SparkSession, rows: DataFrame,
      path: String): Unit = {
    val (mat, rdd) = graft.util.Ckpt.materialize(rows)
    try graft.streaming.PartitionedBase.replace(spark, path, mat)
    finally rdd.unpersist(blocking = false)
  }

  /** Delete `killIds` (one `doc_id` column) from an incremental-dedup
    * base (`digests/` + `shingles/`). With `rekeyFrom` = the surviving
    * corpus, a digest whose KEEPER died but whose text survives in a
    * non-keeper copy is re-keyed (fp → min surviving doc_id, shingle
    * rows re-emitted under the new keeper) instead of dropped — without
    * corpus access the artifact stores no second copy to promote, so the
    * fp is forgotten and the text re-enters the base as novel on its
    * next appearance (exactly the "cannot resurface via survivorship"
    * contract). */
  def forgetIncrementalBase(spark: SparkSession, baseDir: String,
      killIds: DataFrame, rekeyFrom: Option[DataFrame] = None): Unit = {
    val kill = broadcast(killIds.select(col("doc_id")).distinct())
    val dig = graft.streaming.PartitionedBase.all(spark, s"$baseDir/digests")
    val sh = graft.streaming.PartitionedBase.all(spark, s"$baseDir/shingles")
    val keptDig = dig.join(kill,
      dig("base_doc_id") === kill("doc_id"), "left_anti")
    val keptSh = sh.join(kill, Seq("doc_id"), "left_anti")
    val (newDig, newSh) = rekeyFrom match {
      case None => (keptDig, keptSh)
      case Some(surv) =>
        val orphanFp = dig.join(kill,
            dig("base_doc_id") === kill("doc_id"), "left_semi")
          .select("fp")
        val rekeyDocs = Dedup.canonicalDocs(surv)
          .withColumn("fp", md5(col("text")))
          .join(broadcast(orphanFp), Seq("fp"), "left_semi")
        (keptDig.unionByName(
            rekeyDocs.select(col("fp"), col("doc_id").as("base_doc_id"))),
          keptSh.unionByName(Dedup.shingleRows(rekeyDocs)))
    }
    // materialize BOTH before the first swap: newSh's plan reads
    // `digests/` (through orphanFp), which the first rewrite replaces
    val (digMat, digRdd) = graft.util.Ckpt.materialize(newDig)
    val (shMat, shRdd) = graft.util.Ckpt.materialize(newSh)
    try {
      graft.streaming.PartitionedBase.replace(spark,
        s"$baseDir/digests", digMat)
      graft.streaming.PartitionedBase.replace(spark,
        s"$baseDir/shingles", shMat)
    } finally {
      digRdd.unpersist(blocking = false)
      shRdd.unpersist(blocking = false)
    }
  }

  /** Delete the killed docs' contribution from a span base (`spans/`):
    * drop every digest the killed docs attest that NO survivor attests.
    * Needs both document sets — the artifact stores bare digests with no
    * provenance (see the class doc for why the survivor pass is a
    * broadcast-filtered map-side scan, not a shuffle). */
  def forgetSpanBase(spark: SparkSession, baseDir: String,
      killedDocs: DataFrame, survivors: DataFrame): Unit = {
    val killedH = Dedup.baseSpanDigests(killedDocs)
    val stillAttested = Dedup.spanRows(survivors).select("h")
      .join(broadcast(killedH), Seq("h"), "left_semi").distinct()
    val drop = killedH.join(stillAttested, Seq("h"), "left_anti")
    val spans = graft.streaming.PartitionedBase.all(spark, s"$baseDir/spans")
    rewrite(spark, spans.join(broadcast(drop), Seq("h"), "left_anti"),
      s"$baseDir/spans")
  }

  /** Delete `killIds` (one `vec_id` column) from an embedding-dedup cell
    * index (`cells/`). Centroids are statistics of the training sample,
    * not per-document content — they stay (the production cadence:
    * retrain + reindex on schedule, delete keyed rows on demand). */
  def forgetEmbeddingBase(spark: SparkSession, baseDir: String,
      killIds: DataFrame): Unit = {
    val kill = broadcast(killIds.select(col("vec_id")).distinct())
    val cells = graft.streaming.PartitionedBase.all(spark, s"$baseDir/cells")
    rewrite(spark, cells.join(kill, Seq("vec_id"), "left_anti"),
      s"$baseDir/cells")
  }

  /** Delete `killIds` (one `doc_id` column) from a canonical-URL keeper
    * base ([[graft.streaming.StreamingUrlDedup]] `canon/` — the FOURTH
    * streaming base layout, added r13). With `rekeyFrom` = the surviving
    * corpus's (doc_id, url) rows, a canonical URL whose KEEPER died but
    * which a surviving doc still carries is re-keyed (canon_url → min
    * surviving doc_id) instead of dropped — the same survivorship
    * contract as [[forgetIncrementalBase]]: without corpus access the
    * artifact stores no second copy to promote, so the URL is forgotten
    * and re-enters the base as novel on its next appearance. */
  def forgetUrlBase(spark: SparkSession, baseDir: String,
      killIds: DataFrame, rekeyFrom: Option[DataFrame] = None): Unit = {
    val kill = broadcast(killIds.select(col("doc_id")).distinct())
    val canon = graft.streaming.PartitionedBase.all(spark, s"$baseDir/canon")
    val kept = canon.join(kill,
      canon("base_doc_id") === kill("doc_id"), "left_anti")
    val out = rekeyFrom match {
      case None => kept
      case Some(surv) =>
        val orphan = canon.join(kill,
            canon("base_doc_id") === kill("doc_id"), "left_semi")
          .select("canon_url")
        kept.unionByName(Corpus.urlBaseCanon(surv)
          .join(broadcast(orphan), Seq("canon_url"), "left_semi"))
    }
    rewrite(spark, out, s"$baseDir/canon")
  }

  /** Delete `killIds` (one `doc_id` column) from a CDC chunk-digest base
    * ([[graft.streaming.StreamingCdc]] `chunks/`). Same keeper-vs-
    * survivor contract as [[forgetIncrementalBase]]: with `rekeyFrom` =
    * the surviving corpus, a chunk digest whose KEEPER died but whose
    * content survives in another doc is re-keyed (chunk_md5 → min
    * surviving doc carrying it); without corpus access the digest is
    * forgotten and the content re-enters the base as novel on its next
    * appearance. */
  def forgetCdcBase(spark: SparkSession, baseDir: String,
      killIds: DataFrame, rekeyFrom: Option[DataFrame] = None): Unit = {
    val kill = broadcast(killIds.select(col("doc_id")).distinct())
    val chunks = graft.streaming.PartitionedBase.all(spark, s"$baseDir/chunks")
    val kept = chunks.join(kill,
      chunks("base_doc") === kill("doc_id"), "left_anti")
    val out = rekeyFrom match {
      case None => kept
      case Some(surv) =>
        val orphan = chunks.join(kill,
            chunks("base_doc") === kill("doc_id"), "left_semi")
          .select("chunk_md5")
        kept.unionByName(
          TextAnalysis.cdcBaseDigestsOf(TextAnalysis.cdcChunksOf(surv))
            .join(broadcast(orphan), Seq("chunk_md5"), "left_semi"))
    }
    rewrite(spark, out, s"$baseDir/chunks")
  }

  /** Delete `killIds` (one `doc_id` column) from a winnow fingerprint
    * base ([[graft.streaming.StreamingWinnow]] `fps/`). The artifact is
    * per-doc ATTRIBUTION rows, not keeper rows — every doc's
    * fingerprints live under its own id — so the delete is one keyed
    * anti-join and artifact-level == re-derive with nothing to re-key
    * (a surviving copy's fingerprints are already stored under the
    * surviving doc's id). */
  def forgetWinnowBase(spark: SparkSession, baseDir: String,
      killIds: DataFrame): Unit = {
    val kill = broadcast(killIds.select(col("doc_id")).distinct())
    val fps = graft.streaming.PartitionedBase.all(spark, s"$baseDir/fps")
    rewrite(spark, fps.join(kill, Seq("doc_id"), "left_anti"),
      s"$baseDir/fps")
  }

  /** Delete `killPages` (one `page` column) from a recrawl state table
    * ([[graft.streaming.StreamingRecrawl]] `state/` — partial rows keyed
    * by page, additive across partitions). Dropping EVERY partial of a
    * killed page removes it from the schedule and resets its history:
    * if the page is fetched again it re-enters as new (n=1, x=0) — the
    * RTBF contract for crawl telemetry keyed to a forgotten site. The
    * rewrite rolls survivors into one `batch=-1` partition (the same
    * compaction [[graft.streaming.StreamingRecrawl.compact]] performs),
    * so a checkpointed stream resumes against the rewritten state. */
  def forgetRecrawlState(spark: SparkSession, baseDir: String,
      killPages: DataFrame): Unit = {
    val kill = broadcast(killPages.select(col("page")).distinct())
    val state = graft.streaming.PartitionedBase.all(spark, s"$baseDir/state")
    rewrite(spark, state.join(kill, Seq("page"), "left_anti"),
      s"$baseDir/state")
  }

  /** Delete `killIds` from a cross-modal label table
    * ([[graft.streaming.StreamingCrossmodal]] `labels/`). The interesting
    * RTBF case: a forgotten doc may BE the component-min label of its
    * cluster, so dropping its rows is not enough — the surviving members
    * must be RELABELED.
    *
    *  - With `survEdges` = the surviving corpus's edge set (d1, d2) —
    *    what the per-channel generators recompute on demand — the
    *    affected components (those containing a killed doc) are re-closed
    *    via [[Corpus.components]] over their surviving edges ONLY:
    *    labels stay component-min, and a component SPLIT by the deletion
    *    (the killed doc was a cut vertex) splits here too — artifact-
    *    level delete == re-derive. Survivors left with no surviving edge
    *    drop out of the table (absent == singleton, the read contract).
    *  - Without edges the artifact alone cannot see splits (it stores
    *    labels, not connectivity — the same stores-strictly-less caveat
    *    as the digest keeper table): surviving members of an affected
    *    cluster keep one cluster, re-keyed to their min surviving id.
    *
    * Unaffected components pass through untouched (their edges cannot
    * involve a killed doc — components are closed under edges). The
    * rewrite aggregates to ONE row per doc before the swap, exactly like
    * [[graft.streaming.StreamingCrossmodal.compact]], so the
    * `max_by(batch)` read stays well-defined. Scale shape: kill list and
    * affected-cluster set broadcast; one anti-join pass over the label
    * table; the closure touches affected-component edges only. */
  def forgetCrossmodalLabels(spark: SparkSession, baseDir: String,
      killIds: DataFrame, survEdges: Option[DataFrame] = None): Unit = {
    val kill = broadcast(killIds.select(col("doc_id")).distinct())
    val cur = graft.streaming.StreamingCrossmodal.labels(spark, baseDir)
    val affected = broadcast(
      cur.join(kill, Seq("doc_id"), "left_semi")
        .select("cluster_id").distinct())
    val untouched = cur.join(kill, Seq("doc_id"), "left_anti")
      .join(affected, Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id")
    val relabeled = survEdges match {
      case Some(edges) =>
        // restrict to affected components' SURVIVING edges: both
        // endpoints of an edge share a component, so one endpoint check
        // suffices for membership; killed endpoints are dropped anyway
        val lab1 = cur.select(col("doc_id").as("d1"),
          col("cluster_id").as("c1"))
        val aff = edges.select(col("d1"), col("d2"))
          .join(kill.select(col("doc_id").as("d1")), Seq("d1"), "left_anti")
          .join(kill.select(col("doc_id").as("d2")), Seq("d2"), "left_anti")
          .join(lab1, Seq("d1"), "left")
          .join(affected.select(col("cluster_id").as("c1")), Seq("c1"),
            "left_semi")
          .select("d1", "d2")
        Corpus.components(aff)
      case None =>
        val affSurv = cur.join(affected, Seq("cluster_id"), "left_semi")
          .join(kill, Seq("doc_id"), "left_anti")
        affSurv
          .join(affSurv.groupBy("cluster_id")
              .agg(min("doc_id").as("new_cluster")),
            Seq("cluster_id"))
          .select(col("doc_id"), col("new_cluster").as("cluster_id"))
    }
    rewrite(spark, untouched.unionByName(relabeled),
      s"$baseDir/labels")
  }

  // ---- the oracle-gated accounting query ---------------------------------

  /** Per-artifact forget accounting over the deterministic kill list —
    * see the class doc. Output: one row per artifact family
    * (corpus, digests, shingles, spans, cells, cells_nonempty,
    * url_canon) with
    * rows_before / rows_after_forget (artifact-level delete) /
    * rows_rederived (recompute from survivors) / rows_rekeyed. */
  def corpusForget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    def leg(name: String, before: org.apache.spark.sql.Column,
        after: org.apache.spark.sql.Column,
        rederived: org.apache.spark.sql.Column,
        rekeyed: org.apache.spark.sql.Column)(src: DataFrame): DataFrame =
      src.agg(before.cast("long").as("rows_before"),
          after.cast("long").as("rows_after_forget"),
          rederived.cast("long").as("rows_rederived"),
          rekeyed.cast("long").as("rows_rekeyed"))
        .select(lit(name).as("artifact"), col("rows_before"),
          col("rows_after_forget"), col("rows_rederived"), col("rows_rekeyed"))

    val alive = count(when(!killDoc, 1))
    val corpus = leg("corpus", count(lit(1)), alive, alive, lit(0))(docs)

    // one groupBy(md5(text)) carries every digest statistic: the keeper
    // over all docs (what the artifact stores), the keeper over the
    // survivors (what a re-derive would store), and their disagreement
    val fp = docs.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keeper_all"),
        min(when(col("doc_id") % forgetMod =!= forgetRem, col("doc_id")))
          .as("keeper_surv"))
    val keeperKilled = col("keeper_all") % forgetMod === forgetRem
    val digests = leg("digests",
      count(lit(1)),
      count(when(!keeperKilled, 1)),
      count(col("keeper_surv")),
      count(when(keeperKilled && col("keeper_surv").isNotNull, 1)))(fp)

    // shingle rows live under the keeper doc_id; the count per fp is a
    // function of the TEXT alone, so re-keying preserves it — computed
    // once per canonical doc by the fast primitive loop and joined back
    val shCnt = Dedup.shingleRows(Dedup.canonicalDocs(docs))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val fpSh = fp.join(shCnt, fp("keeper_all") === shCnt("doc_id"), "left")
      .withColumn("n_sh", coalesce(col("n_sh"), lit(0L)))
    val shingles = leg("shingles",
      sum("n_sh"),
      sum(when(!keeperKilled, col("n_sh")).otherwise(0L)),
      sum(when(col("keeper_surv").isNotNull, col("n_sh")).otherwise(0L)),
      sum(when(keeperKilled && col("keeper_surv").isNotNull, col("n_sh"))
        .otherwise(0L)))(fpSh)

    // spans: artifact-level delete drops the killed-only digests;
    // re-derive keeps the survivor-attested ones — computed as two
    // independent expressions over one groupBy(h) that must agree
    val sp = Dedup.spanRows(docs)
      .groupBy("h")
      .agg(max(when(col("doc_id") % forgetMod =!= forgetRem, 1).otherwise(0))
        .as("has_surv"))
    val spans = leg("spans",
      count(lit(1)),
      count(lit(1)) - count(when(col("has_surv") === 0, 1)),
      sum("has_surv"),
      lit(0))(sp)

    // cells: the multi-probe index rows are keyed deletes (no re-key);
    // cells_nonempty tracks the occupancy the index maintenance cares
    // about — a forget that empties a cell changes the probe geometry
    val idx = Similarity.cellIndex(
      Similarity.vecs(spark, dir), Similarity.sdCentsDf(spark, dir))
    val byCell = idx.groupBy("cell")
      .agg(count(lit(1)).as("n_b"),
        count(when(!killVec, 1)).as("n_a"))
    val cells = leg("cells",
      sum("n_b"), sum("n_a"), sum("n_a"), lit(0))(byCell)
    val cellsNonempty = leg("cells_nonempty",
      count(lit(1)),
      count(when(col("n_a") > 0, 1)),
      count(when(col("n_a") > 0, 1)),
      lit(0))(byCell)

    // url keeper table: same keeper-vs-survivor accounting as digests,
    // keyed by the canonical URL instead of the text digest
    val uf = Corpus.rawUrls(docs)
      .groupBy(Corpus.canonicalUrl(col("url")).as("canon_url"))
      .agg(min("doc_id").as("keeper_all"),
        min(when(col("doc_id") % forgetMod =!= forgetRem, col("doc_id")))
          .as("keeper_surv"))
    val urlKeeperKilled = col("keeper_all") % forgetMod === forgetRem
    val urlCanon = leg("url_canon",
      count(lit(1)),
      count(when(!urlKeeperKilled, 1)),
      count(col("keeper_surv")),
      count(when(urlKeeperKilled && col("keeper_surv").isNotNull, 1)))(uf)

    corpus.unionByName(digests).unionByName(shingles).unionByName(spans)
      .unionByName(cells).unionByName(cellsNonempty).unionByName(urlCanon)
  }

  val corpusForgetSql: String = {
    val n = Dedup.spanLen
    s"""WITH ${Similarity.vecsSql},
       |${Similarity.sdAsgCtes},
       |fp AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS keeper_all,
       |    min(CASE WHEN NOT ($killSqlDoc) THEN doc_id END) AS keeper_surv,
       |    min(text) AS text
       |  FROM documents GROUP BY 1
       |), fpsh AS (
       |  SELECT keeper_all % $forgetMod = $forgetRem AS keeper_killed,
       |    keeper_surv,
       |    len(${Dedup.shinglesSql(Dedup.tokensSql("text"))}) AS n_sh
       |  FROM fp
       |), t AS (SELECT doc_id, ${Dedup.tokensSql("text")} AS toks FROM documents),
       |sp AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(toks) >= $n
       |    THEN list_transform(generate_series(1, len(toks) - ${n - 1}),
       |      i -> md5(array_to_string(list_slice(toks, i, i + ${n - 1}), ' ')))
       |    ELSE [] END)) AS h
       |  FROM t
       |), sph AS (
       |  SELECT h, max(CASE WHEN NOT ($killSqlDoc) THEN 1 ELSE 0 END) AS has_surv
       |  FROM sp GROUP BY 1
       |), a2 AS (
       |  SELECT vec_id, cent_id AS cell FROM asg
       |  WHERE c_rank <= ${Similarity.semdedupProbes}
       |), bycell AS (
       |  SELECT cell, count(*) AS n_b,
       |    sum(CASE WHEN NOT ($killSqlVec) THEN 1 ELSE 0 END) AS n_a
       |  FROM a2 GROUP BY 1
       |), ru AS (${Corpus.rawUrlsSql}),
       |cuq AS (${Corpus.canonicalUrlSql("SELECT * FROM ru")}),
       |uf AS (
       |  SELECT canon_url, min(doc_id) AS keeper_all,
       |    min(CASE WHEN NOT ($killSqlDoc) THEN doc_id END) AS keeper_surv
       |  FROM cuq GROUP BY 1
       |)
       |SELECT 'corpus' AS artifact,
       |  CAST(count(*) AS BIGINT) AS rows_before,
       |  CAST(count(CASE WHEN NOT ($killSqlDoc) THEN 1 END) AS BIGINT)
       |    AS rows_after_forget,
       |  CAST(count(CASE WHEN NOT ($killSqlDoc) THEN 1 END) AS BIGINT)
       |    AS rows_rederived,
       |  CAST(0 AS BIGINT) AS rows_rekeyed
       |FROM documents
       |UNION ALL
       |SELECT 'digests', CAST(count(*) AS BIGINT),
       |  CAST(count(CASE WHEN NOT (keeper_all % $forgetMod = $forgetRem)
       |    THEN 1 END) AS BIGINT),
       |  CAST(count(keeper_surv) AS BIGINT),
       |  CAST(count(CASE WHEN keeper_all % $forgetMod = $forgetRem
       |    AND keeper_surv IS NOT NULL THEN 1 END) AS BIGINT)
       |FROM fp
       |UNION ALL
       |SELECT 'shingles', CAST(sum(n_sh) AS BIGINT),
       |  CAST(sum(CASE WHEN NOT keeper_killed THEN n_sh ELSE 0 END) AS BIGINT),
       |  CAST(sum(CASE WHEN keeper_surv IS NOT NULL THEN n_sh ELSE 0 END)
       |    AS BIGINT),
       |  CAST(sum(CASE WHEN keeper_killed AND keeper_surv IS NOT NULL
       |    THEN n_sh ELSE 0 END) AS BIGINT)
       |FROM fpsh
       |UNION ALL
       |SELECT 'spans', CAST(count(*) AS BIGINT),
       |  CAST(count(*) - count(CASE WHEN has_surv = 0 THEN 1 END) AS BIGINT),
       |  CAST(sum(has_surv) AS BIGINT),
       |  CAST(0 AS BIGINT)
       |FROM sph
       |UNION ALL
       |SELECT 'cells', CAST(sum(n_b) AS BIGINT), CAST(sum(n_a) AS BIGINT),
       |  CAST(sum(n_a) AS BIGINT), CAST(0 AS BIGINT)
       |FROM bycell
       |UNION ALL
       |SELECT 'cells_nonempty', CAST(count(*) AS BIGINT),
       |  CAST(count(CASE WHEN n_a > 0 THEN 1 END) AS BIGINT),
       |  CAST(count(CASE WHEN n_a > 0 THEN 1 END) AS BIGINT),
       |  CAST(0 AS BIGINT)
       |FROM bycell
       |UNION ALL
       |SELECT 'url_canon', CAST(count(*) AS BIGINT),
       |  CAST(count(CASE WHEN NOT (keeper_all % $forgetMod = $forgetRem)
       |    THEN 1 END) AS BIGINT),
       |  CAST(count(keeper_surv) AS BIGINT),
       |  CAST(count(CASE WHEN keeper_all % $forgetMod = $forgetRem
       |    AND keeper_surv IS NOT NULL THEN 1 END) AS BIGINT)
       |FROM uf""".stripMargin
  }

  /** Forget accounting over the four STATE tables the dedup/crawl twins
    * persist beyond the corpus-derived artifacts [[corpusForget]] covers
    * (r15 verdict #2): CDC chunk digests, winnow fingerprints, recrawl
    * pages, and the cross-modal label table. Same kill list, same four
    * accounting columns. Per leg:
    *
    *  - `cdc_chunks`: keeper digest rows (one per distinct chunk_md5) —
    *    the keeper-vs-survivor split of [[forgetCdcBase]]; rekeyed
    *    counts digests whose keeper died but whose content survives.
    *  - `winnow_fps`: per-doc attribution rows — artifact delete and
    *    re-derive agree exactly (a doc's fingerprints depend on its text
    *    alone), so rekeyed = 0 by construction.
    *  - `recrawl_pages`: pages in the crawl state (kill = page % 7 = 3,
    *    the page-keyed image of the doc rule); dropping a page resets
    *    its history, nothing to re-key.
    *  - `crossmodal_labels`: edge-touched label rows. after_forget is
    *    the COMPONENT-AWARE artifact delete ([[forgetCrossmodalLabels]]
    *    with edges): survivors of affected components re-closed over
    *    surviving edges — which equals the re-derive by construction
    *    (unaffected components cannot contain a killed edge endpoint);
    *    rekeyed counts survivors whose label CHANGED (their old
    *    component min died, or their component split).
    *
    * Scale note: this is the one query that closes the crossmodal graph
    * TWICE (full + survivor) — inherent to auditing a delete against a
    * re-derive; both closures run over the already-bucketed candidate
    * edges, never all-pairs. */
  def stateForget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    def leg(name: String, before: org.apache.spark.sql.Column,
        after: org.apache.spark.sql.Column,
        rederived: org.apache.spark.sql.Column,
        rekeyed: org.apache.spark.sql.Column)(src: DataFrame): DataFrame =
      src.agg(before.cast("long").as("rows_before"),
          after.cast("long").as("rows_after_forget"),
          rederived.cast("long").as("rows_rederived"),
          rekeyed.cast("long").as("rows_rekeyed"))
        .select(lit(name).as("artifact"), col("rows_before"),
          col("rows_after_forget"), col("rows_rederived"), col("rows_rekeyed"))

    // cdc chunk digests: same keeper accounting as corpus_forget's digests
    val cfp = TextAnalysis.cdcChunksOf(docs).groupBy("chunk_md5")
      .agg(min("doc_id").as("keeper_all"),
        min(when(col("doc_id") % forgetMod =!= forgetRem, col("doc_id")))
          .as("keeper_surv"))
    val cdcKilled = col("keeper_all") % forgetMod === forgetRem
    val cdcLeg = leg("cdc_chunks",
      count(lit(1)),
      count(when(!cdcKilled, 1)),
      count(col("keeper_surv")),
      count(when(cdcKilled && col("keeper_surv").isNotNull, 1)))(cfp)

    val wfp = TextAnalysis.winnowFps(docs).select("doc_id", "fp").distinct()
    val alive = count(when(!killDoc, 1))
    val winnowLeg = leg("winnow_fps", count(lit(1)), alive, alive, lit(0))(wfp)

    val pages = Crawl.fetchLog(spark, dir).select("page").distinct()
    val pageAlive = count(when(col("page") % forgetMod =!= forgetRem, 1))
    val recrawlLeg = leg("recrawl_pages",
      count(lit(1)), pageAlive, pageAlive, lit(0))(pages)

    // label table: full closure vs survivor-edge closure (cl_s is null
    // for killed docs AND for survivors left with no surviving edge).
    // The two closures are independent given the one materialized edge
    // set, and each is a chain of SMALL iterative jobs that leaves most
    // cores idle between stages — so they run on concurrent driver
    // threads and back-fill each other's schedule gaps (guide §2.6;
    // FIFO scheduling interleaves their tasks). Results are identical
    // to the sequential form: each closure only touches its own frames.
    val edges = Corpus.crossmodalEdgesCached(spark, dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fullF = Future(Corpus.components(edges))
    val survF = Future(Corpus.components(edges.filter(
      col("d1") % forgetMod =!= forgetRem &&
        col("d2") % forgetMod =!= forgetRem)))
    val full = Await.result(fullF, Duration.Inf)
    val surv = Await.result(survF, Duration.Inf)
    val cmp = full.select(col("doc_id"), col("cluster_id").as("cl_f"))
      .join(surv.select(col("doc_id"), col("cluster_id").as("cl_s")),
        Seq("doc_id"), "left")
    val labelLeg = leg("crossmodal_labels",
      count(lit(1)),
      count(col("cl_s")),
      count(col("cl_s")),
      count(when(col("cl_s").isNotNull && col("cl_s") =!= col("cl_f"), 1)))(cmp)

    cdcLeg.unionByName(winnowLeg).unionByName(recrawlLeg)
      .unionByName(labelLeg)
  }

  val stateForgetSql: String = {
    def cnt(c: String): String = s"CAST($c AS BIGINT)"
    s"""SELECT 'cdc_chunks' AS artifact,
       |  ${cnt("count(*)")} AS rows_before,
       |  ${cnt(s"count(CASE WHEN NOT (keeper_all % $forgetMod = $forgetRem) THEN 1 END)")}
       |    AS rows_after_forget,
       |  ${cnt("count(keeper_surv)")} AS rows_rederived,
       |  ${cnt(s"count(CASE WHEN keeper_all % $forgetMod = $forgetRem AND keeper_surv IS NOT NULL THEN 1 END)")}
       |    AS rows_rekeyed
       |FROM (
       |  WITH ${TextAnalysis.cdcCtes}
       |  SELECT chunk_md5, min(doc_id) AS keeper_all,
       |    min(CASE WHEN NOT ($killSqlDoc) THEN doc_id END) AS keeper_surv
       |  FROM cdc GROUP BY 1
       |)
       |UNION ALL
       |SELECT 'winnow_fps', ${cnt("count(*)")},
       |  ${cnt(s"count(CASE WHEN NOT ($killSqlDoc) THEN 1 END)")},
       |  ${cnt(s"count(CASE WHEN NOT ($killSqlDoc) THEN 1 END)")},
       |  ${cnt("0")}
       |FROM (
       |  WITH ${TextAnalysis.winnowCtes}
       |  SELECT DISTINCT doc_id, fp FROM wfp
       |)
       |UNION ALL
       |SELECT 'recrawl_pages', ${cnt("count(*)")},
       |  ${cnt(s"count(CASE WHEN NOT (page % $forgetMod = $forgetRem) THEN 1 END)")},
       |  ${cnt(s"count(CASE WHEN NOT (page % $forgetMod = $forgetRem) THEN 1 END)")},
       |  ${cnt("0")}
       |FROM (
       |  SELECT DISTINCT user_id AS page FROM events WHERE user_id IS NOT NULL
       |)
       |UNION ALL
       |SELECT 'crossmodal_labels', ${cnt("count(*)")},
       |  ${cnt("count(cl_s)")},
       |  ${cnt("count(cl_s)")},
       |  ${cnt("count(CASE WHEN cl_s IS NOT NULL AND cl_s <> cl_f THEN 1 END)")}
       |FROM (
       |  WITH RECURSIVE ${Corpus.crossmodalEdgeCtes},
       |  edges_f AS MATERIALIZED (
       |    SELECT d1 AS src, d2 AS dst FROM e0
       |    UNION SELECT d2, d1 FROM e0
       |  ),
       |  reach_f(doc_id, r) AS (
       |    SELECT src, src FROM edges_f
       |    UNION
       |    SELECT e.src, reach_f.r
       |    FROM edges_f e JOIN reach_f ON e.dst = reach_f.doc_id
       |  ),
       |  cl_full AS (SELECT doc_id, min(r) AS cluster_id FROM reach_f GROUP BY 1),
       |  e1 AS (
       |    SELECT d1, d2 FROM e0
       |    WHERE NOT (d1 % $forgetMod = $forgetRem)
       |      AND NOT (d2 % $forgetMod = $forgetRem)
       |  ),
       |  edges_s AS MATERIALIZED (
       |    SELECT d1 AS src, d2 AS dst FROM e1
       |    UNION SELECT d2, d1 FROM e1
       |  ),
       |  reach_s(doc_id, r) AS (
       |    SELECT src, src FROM edges_s
       |    UNION
       |    SELECT e.src, reach_s.r
       |    FROM edges_s e JOIN reach_s ON e.dst = reach_s.doc_id
       |  ),
       |  cl_surv AS (SELECT doc_id, min(r) AS cluster_id FROM reach_s GROUP BY 1)
       |  SELECT f.cluster_id AS cl_f, s.cluster_id AS cl_s
       |  FROM cl_full f LEFT JOIN cl_surv s USING (doc_id)
       |)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_forget" -> (corpusForget _),
    "state_forget" -> (stateForget _))

  val oracleSql: Map[String, String] = Map(
    "corpus_forget" -> corpusForgetSql,
    "state_forget" -> stateForgetSql)
}
