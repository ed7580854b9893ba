package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.Dedup.spanDedupIncremental]] —
  * exact-substring span removal run as a stream, completing the
  * incremental-dedup family's streaming symmetry (exact:
  * [[StreamingIncrementalDedup]], embedding:
  * [[StreamingEmbeddingDedup]], spans: here): micro-batches of documents
  * clean against a PERSISTENT base span-digest set, and — in grow mode —
  * the batch's novel span digests join the base so a span first seen in
  * batch k is removed from every later batch that repeats it (the Lee
  * et al. keep-first-occurrence semantics, extended across increments).
  *
  * Base layout under `baseDir` ([[PartitionedBase]] — per-batchId
  * overwrite partitions): `spans/batch=<id>/` parquet, one column `h` —
  * the span digests FIRST seen in that batch (bootstrap = `batch=-1`).
  * The union over partitions is the DISTINCT md5 of every 10-token
  * window in the corpus so far (exactly [[Dedup.baseSpanDigests]]'s
  * frame; each batch's novel set is anti-joined against everything
  * earlier, so a digest lives in exactly one partition). A flat pre-r15
  * base migrates with [[PartitionedBase.migrateFlat]].
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * at-least-once with BYTE-IDENTICAL re-delivery; state growth:
  * idempotent (exactly-once effective) — cleaning and the novel-digest
  * anti-join read `batch < batchId`, growth overwrites the batch's own
  * partition, so a crash-and-replay recomputes the same cleaned texts
  * against the same base and lands the same digests in the same
  * directory (see [[PartitionedBase]]).
  *
  *  1. cleaned = [[Dedup.spanCleanAgainstBase]](batch, spans-as-of-
  *     batch-start); `deliver(cleaned, batchId)`.
  *  2. grow mode: the batch's distinct window digests NOT already in the
  *     base-so-far overwrite `spans/batch=<id>`. ALL of the batch's
  *     digests qualify as "seen" from now on — including those just
  *     removed from the batch itself — because their first corpus
  *     occurrence now exists.
  *
  * Both frames are still materialized (localCheckpoint) before the
  * write — no longer for the refreshByPath trap (the `batch < batchId`
  * filter excludes the written partition) but to avoid recomputing the
  * span scan. Contract: a batch doc's cleaned text depends only on
  * (doc, base) — batch docs are NOT cleaned against each other — so
  * against a static base any micro-batch split emits exactly the batch
  * operator's rows (parity pinned by StreamingSpanDedupSpec, including
  * across a marker-deleted replay).
  *
  * Scale shape: per batch, one scan of the batch (tokens + digests),
  * one digest semi-join against the base artifact, one O(novel-digests)
  * partition overwrite — O(batch), never O(base). */
object StreamingSpanDedup {

  /** Bootstrap the persistent artifact from an initial corpus. */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit =
    PartitionedBase.init(Dedup.baseSpanDigests(baseDocs), s"$baseDir/spans")

  /** The `foreachBatch` body, exposed for deterministic testing: the
    * batch frame carries (doc_id, text). */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_spandedup_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val baseH = PartitionedBase.before(spark, s"$baseDir/spans", batchId)
        val (cleaned, cleanedRdd) = graft.util.Ckpt.materialize(
          Dedup.spanCleanAgainstBase(batch, baseH, cached += _))
        val (novel, novelRdd) = graft.util.Ckpt.materialize(
          Dedup.spanRows(batch).select("h").distinct()
            .join(baseH, Seq("h"), "left_anti"))
        try {
          deliver(cleaned, batchId)
          if (growBase)
            PartitionedBase.write(novel, s"$baseDir/spans", batchId)
        } finally {
          cleanedRdd.unpersist(blocking = false)
          novelRdd.unpersist(blocking = false)
          cached.foreach(_.unpersist())
        }
      }
  }

  /** Start the streaming query over a stream of (doc_id, text). */
  def start(docs: DataFrame, baseDir: String, checkpointDir: String,
      triggerMs: Long, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(onBatch(baseDir, growBase, deliver))
      .start()
}
