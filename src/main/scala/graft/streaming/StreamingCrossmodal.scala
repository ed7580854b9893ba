package graft.streaming

import graft.operators.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.Corpus.crossmodalIncremental]] —
  * cross-modal cluster maintenance as a stream, completing the streaming
  * symmetry of the incremental family (every dedup CHANNEL has a twin;
  * this is the twin of the channel FUSION): micro-batches of
  * batch-incident edges (d1, d2) — the rows the per-channel
  * batch-vs-base generators already produce
  * ([[graft.operators.Dedup.hitsAgainstBase]],
  * [[graft.operators.Corpus.urlHitsAgainstBase]], the pHash banded join
  * against the persisted band table) — merge into a PERSISTED label
  * artifact via [[Corpus.crossmodalMerge]], so the historical graph is
  * NEVER re-closed: each batch closes only its own contracted incident
  * edges.
  *
  * Label artifact under `baseDir/labels` ([[PartitionedBase]] — the
  * per-batchId overwrite layout, used from the start):
  *  - `batch=-1/`: the bootstrap label table (doc_id, cluster_id),
  *    cluster_id = component-min doc_id — what [[initBase]] closes once
  *    from the initial corpus's edges (or what a batch pipeline already
  *    persists);
  *  - `batch=<id>/`: that batch's label DELTA — one row per doc whose
  *    label CHANGED (a base doc whose component merged) or first
  *    appeared (a batch doc touched by an edge). Docs with no row
  *    anywhere are singletons (cluster_id = doc_id) — the same default
  *    [[Corpus.crossmodalIncremental]] applies.
  *
  * The CURRENT label of a doc is its row from the LATEST partition that
  * mentions it ([[labels]]: one `max_by(cluster_id, batch)` agg) — the
  * last-writer-wins reading the recrawl table gets from additivity, and
  * this table gets from delta monotonicity: each batch's delta is
  * computed against (and supersedes) everything before it.
  *
  * Delivery guarantee: at-least-once with BYTE-IDENTICAL re-delivery;
  * label growth: idempotent (exactly-once effective). The merge reads
  * labels strictly before `batchId` and the delta overwrites the
  * batch's own partition, so a marker-deleted (or mid-write-crashed)
  * replay recomputes the identical delta against the identical state
  * (see [[PartitionedBase]]).
  *
  * Parity theorem (StreamingCrossmodalSpec): contraction by the
  * labels-so-far partition preserves connectivity (the
  * [[Corpus.crossmodalMerge]] argument), and component-min labels
  * compose — merging E1 then E2 equals merging E1 ∪ E2 equals the full
  * closure of base ∪ E1 ∪ E2. So ANY in-order micro-batch split of the
  * incident-edge stream yields labels identical to
  * `crossmodal_incremental`'s single merged batch, including across a
  * replay.
  *
  * Scale shape: per batch, one doc-keyed hash join of the batch's edge
  * endpoints against the label table, one [[Corpus.components]] closure
  * over O(batch-incident CONTRACTED edges) (a quiet day closes a
  * near-empty graph regardless of history), one O(delta) partition
  * overwrite. The label read is one doc-keyed agg over bootstrap +
  * deltas — bounded by rolling history up with [[compact]] between
  * stream runs. Do NOT compact this table with
  * [[PartitionedBase.migrateFlat]]: that unions the raw DELTA rows into
  * one partition, and a doc with rows in several batches would get tied
  * `batch` values under the last-writer-wins read (`max_by(cluster_id,
  * batch)` picks nondeterministically among ties) — silent label
  * corruption. [[compact]] aggregates to one row per doc FIRST. */
object StreamingCrossmodal {

  private def labelsDir(baseDir: String) = s"$baseDir/labels"

  /** One-time bootstrap: persist `baseLabels` (doc_id, cluster_id) as
    * the `batch=-1` partition. Callers typically pass the closure of the
    * initial corpus (`components` of its edges, singletons defaulted or
    * omitted — omitted singletons read back as themselves). */
  def initBase(baseLabels: DataFrame, baseDir: String): Unit =
    PartitionedBase.init(
      baseLabels.select(col("doc_id"), col("cluster_id")), labelsDir(baseDir))

  /** Current labels as of `batchId` (partitions strictly before it):
    * per doc, the row from the latest partition mentioning it. */
  private def labelsBefore(spark: SparkSession, baseDir: String,
      batchId: Long): DataFrame =
    PartitionedBase.withBatch(spark, labelsDir(baseDir))
      .filter(col("batch") < batchId)
      .groupBy("doc_id")
      .agg(max_by(col("cluster_id"), col("batch")).as("cluster_id"))

  /** The CURRENT label table (all partitions): docs absent from it are
    * singletons — join against a docs frame and coalesce to doc_id for
    * the full report, exactly the [[Corpus.crossmodalIncremental]]
    * default. */
  def labels(spark: SparkSession, baseDir: String): DataFrame =
    PartitionedBase.withBatch(spark, labelsDir(baseDir))
      .groupBy("doc_id")
      .agg(max_by(col("cluster_id"), col("batch")).as("cluster_id"))

  /** OFFLINE compaction of the label table: the CURRENT labels —
    * aggregated to ONE row per doc BEFORE the swap — replace the
    * bootstrap + delta history as a single `batch=-1` partition, so the
    * `max_by(batch)` read stops growing with batch count. This, not
    * [[PartitionedBase.migrateFlat]], is the compaction procedure for
    * this table (see the class doc: migrateFlat would flatten delta
    * rows into tied batch values and corrupt last-writer-wins). Same
    * crash contract as every [[PartitionedBase.replace]] caller: must
    * not run concurrently with [[onBatch]]. */
  def compact(spark: SparkSession, baseDir: String): Unit = {
    val (mat, rdd) = graft.util.Ckpt.materialize(labels(spark, baseDir))
    try PartitionedBase.replace(spark, labelsDir(baseDir), mat)
    finally rdd.unpersist(blocking = false)
  }

  /** The `foreachBatch` body, exposed for direct (deterministic)
    * testing: the batch frame carries incident edges (d1, d2). Delivers
    * the batch's label DELTA — the docs this batch relabeled or
    * introduced. */
  def onBatch(baseDir: String,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_crossmodal_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val sofar = labelsBefore(spark, baseDir, batchId)
        val merged = Corpus.crossmodalMerge(sofar, batch)
        // delta = rows that differ from (or are absent in) labels-so-far
        val old = sofar.withColumnRenamed("cluster_id", "old_cluster")
        val delta = merged.join(old, Seq("doc_id"), "left")
          .filter(col("old_cluster").isNull ||
            col("old_cluster") =!= col("cluster_id"))
          .select("doc_id", "cluster_id")
        val (pinned, rdd) = graft.util.Ckpt.materialize(delta)
        try {
          PartitionedBase.write(pinned, labelsDir(baseDir), batchId)
          deliver(pinned, batchId)
        } finally rdd.unpersist(blocking = false)
      }
  }

  /** Start the streaming query over a stream of incident edges
    * (d1, d2). */
  def start(edges: DataFrame, baseDir: String, checkpointDir: String,
      triggerMs: Long,
      deliver: (DataFrame, Long) => Unit): StreamingQuery =
    edges.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(onBatch(baseDir, deliver))
      .start()
}
