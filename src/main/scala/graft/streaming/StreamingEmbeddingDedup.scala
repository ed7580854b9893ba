package graft.streaming

import graft.operators.{Dedup, Similarity}
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
  *    the production cadence);
  *  - `cells/` parquet (vec_id, v, norm, cell): the multi-probe cell
  *    index over the base vectors ([[Similarity.cellIndex]] shape).
  *
  * Per micro-batch, wrapped in [[BatchLedger]] (pair delivery AND index
  * growth are side effects, at-most-once per batch id across restarts):
  * hits via the SAME [[Similarity.pairsAgainstBase]] core as the batch
  * operator — each new vector's verdict depends only on (vector, base),
  * so against a static base ANY micro-batch split emits exactly the
  * batch operator's pairs (the parity theorem the spec checks). The
  * batch's hits frame and the novel-vector index rows are materialized
  * BEFORE the appends (localCheckpoint — the write path's refreshByPath
  * would otherwise re-derive them against the grown index, the same trap
  * [[StreamingIncrementalDedup]] documents).
  *
  * Scale shape: centroids broadcast (tiny), one hash shuffle on the cell
  * id per batch, appends are blind parquet writes — per-batch cost is
  * O(batch x touched cells), never O(index). */
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
    Similarity.cellIndex(baseVecs, cents)
      .write.mode("overwrite").parquet(s"$baseDir/cells")
  }

  /** The `foreachBatch` body, exposed for deterministic testing: the
    * batch frame carries (vec_id, embedding array<float|double>). */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_embdedup_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val cents = spark.read.parquet(s"$baseDir/centroids")
        val baseIdx = spark.read.parquet(s"$baseDir/cells")
        val newIdx = Similarity.cellIndex(
          Similarity.normalized(batch), cents)
        // pin hits + the batch index to the base-as-of-batch-start: the
        // appends below refresh the cells path and would re-derive both
        val (hits, hitsRdd) = graft.util.Ckpt.materialize(
          Similarity.pairsAgainstBase(newIdx, baseIdx))
        val (idx, idxRdd) = graft.util.Ckpt.materialize(newIdx)
        try {
          deliver(hits, batchId)
          if (growBase) {
            idx.join(hits.select(col("v1").as("vec_id")).distinct(),
                Seq("vec_id"), "left_anti")
              .write.mode("append").parquet(s"$baseDir/cells")
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
