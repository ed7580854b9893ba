package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.Similarity.embeddingDedupIncremental]]
  * — online semantic dedup of incoming embeddings against a PERSISTENT
  * cell index (the embedding analog of [[StreamingIncrementalDedup]]):
  * micro-batches of (vec_id, embedding) assign to their top-probes cells
  * under the STORED centroids and pair only against base index rows
  * sharing a cell; in grow mode the batch's novel vectors (no pair at the
  * radius) join the index so later increments dedup against them.
  *
  * Base layout under `baseDir`:
  *  - `centroids/` parquet (cent_id, cv, cn): the trained k-means cells —
  *    the artifact ONE training run produces and every later batch
  *    reuses (re-training = rebuilding this dir + reindexing, exactly
  *    the production cadence). Flat: centroids are statistics, not
  *    per-batch state.
  *  - `cells/batch=<id>/` parquet (vec_id, v, norm, cell): the
  *    multi-probe cell index ([[Similarity.cellIndex]] shape) under the
  *    [[PartitionedBase]] layout — the batch's novel vectors live in its
  *    own partition, bootstrap = `batch=-1`. A flat pre-r15 `cells/`
  *    migrates with [[PartitionedBase.migrateFlat]].
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * at-least-once with BYTE-IDENTICAL re-delivery; index growth:
  * idempotent (exactly-once effective) — pairing reads `batch <
  * batchId` and growth overwrites the batch's own partition, so a
  * crash-and-replay recomputes the same pairs against the same index
  * and lands the same novel rows in the same directory (see
  * [[PartitionedBase]]). Hits via the SAME [[Similarity.pairsAgainstBase]]
  * core as the batch operator — each new vector's verdict depends only on
  * (vector, base), so against a static base ANY micro-batch split emits
  * exactly the batch operator's pairs (the parity theorem the spec
  * checks, including across a marker-deleted replay).
  *
  * Scale shape: centroids broadcast (tiny), one hash shuffle on the cell
  * id per batch, growth an O(novel) partition overwrite — per-batch cost
  * is O(batch x touched cells), never O(index). */
object StreamingEmbeddingDedup {

  /** Bootstrap the persistent artifacts: centroids (trained on `dir`'s
    * bounded sample — the same deterministic artifact every IVF oracle
    * replays) and the cell index over `baseVecs` (vec_id, v, norm). */
  def initBase(spark: SparkSession, dir: String, baseVecs: DataFrame,
      baseDir: String): Unit = {
    // one artifact layout for streaming and batch: `centroids/` +
    // `pq_codebook/` here are exactly what a batch session loads via
    // `spark.graft.ann.artifactDir` (Similarity.saveIndexArtifacts)
    Similarity.saveIndexArtifacts(spark, dir, baseDir)
    val cents = spark.read.parquet(s"$baseDir/centroids")
    PartitionedBase.init(Similarity.cellIndex(baseVecs, cents),
      s"$baseDir/cells")
  }

  /** The `foreachBatch` body, exposed for deterministic testing: the
    * batch frame carries (vec_id, embedding array<float|double>). */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_embdedup_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val cents = spark.read.parquet(s"$baseDir/centroids")
        val baseIdx = PartitionedBase.before(spark, s"$baseDir/cells", batchId)
        val newIdx = Similarity.cellIndex(
          Similarity.normalized(batch), cents)
        // materialized to compute the index scan once across the two
        // consumers (pairing + growth), not for the refreshByPath trap —
        // the batch<batchId filter already excludes the written partition
        val (hits, hitsRdd) = graft.util.Ckpt.materialize(
          Similarity.pairsAgainstBase(newIdx, baseIdx))
        val (idx, idxRdd) = graft.util.Ckpt.materialize(newIdx)
        try {
          deliver(hits, batchId)
          if (growBase) {
            PartitionedBase.write(
              idx.join(hits.select(col("v1").as("vec_id")).distinct(),
                Seq("vec_id"), "left_anti"),
              s"$baseDir/cells", batchId)
          }
        } finally {
          hitsRdd.unpersist(blocking = false)
          idxRdd.unpersist(blocking = false)
        }
      }
  }

  /** Start the streaming query over a stream of (vec_id, embedding). */
  def start(vecs: DataFrame, baseDir: String, checkpointDir: String,
      triggerMs: Long, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(onBatch(baseDir, growBase, deliver))
      .start()
}
