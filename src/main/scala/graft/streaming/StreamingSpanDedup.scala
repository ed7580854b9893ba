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
  * Base layout under `baseDir`: `spans/` parquet, one column `h` — the
  * DISTINCT md5 of every 10-token window in the corpus so far (exactly
  * [[Dedup.baseSpanDigests]]'s frame; the batch operator derives the
  * same set in-query).
  *
  * Per micro-batch (ledger-wrapped — delivery and base growth are side
  * effects, at most once per batch id across restarts):
  *  1. cleaned = [[Dedup.spanCleanAgainstBase]](batch, spans-as-of-
  *     batch-start); `deliver(cleaned, batchId)`.
  *  2. grow mode: the batch's distinct window digests NOT already in the
  *     base append to `spans/`. ALL of the batch's digests qualify as
  *     "seen" from now on — including those just removed from the batch
  *     itself — because their first corpus occurrence now exists.
  *
  * Both the cleaned frame and the novel-digest frame are materialized
  * (localCheckpoint) BEFORE the append: their plans read the `spans/`
  * parquet, and the write path's refreshByPath would otherwise
  * re-derive them against the grown base (the same trap every grow-mode
  * twin documents). Contract: a batch doc's cleaned text depends only
  * on (doc, base) — batch docs are NOT cleaned against each other —
  * so against a static base any micro-batch split emits exactly the
  * batch operator's rows (parity pinned by StreamingSpanDedupSpec).
  *
  * Scale shape: per batch, one scan of the batch (tokens + digests),
  * one digest semi-join against the base artifact, blind parquet
  * appends — O(batch), never O(base). */
object StreamingSpanDedup {

  /** Bootstrap the persistent artifact from an initial corpus. */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit =
    Dedup.baseSpanDigests(baseDocs)
      .write.mode("overwrite").parquet(s"$baseDir/spans")

  /** The `foreachBatch` body, exposed for deterministic testing: the
    * batch frame carries (doc_id, text). */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_spandedup_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val baseH = spark.read.parquet(s"$baseDir/spans")
        val (cleaned, cleanedRdd) = graft.util.Ckpt.materialize(
          Dedup.spanCleanAgainstBase(batch, baseH, cached += _))
        val (novel, novelRdd) = graft.util.Ckpt.materialize(
          Dedup.spanRows(batch).select("h").distinct()
            .join(baseH, Seq("h"), "left_anti"))
        try {
          deliver(cleaned, batchId)
          if (growBase)
            novel.write.mode("append").parquet(s"$baseDir/spans")
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
