package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.TextAnalysis.cdcIncremental]] —
  * content-defined-chunk dedup as a stream: micro-batches of new
  * documents are CDC-chunked ([[TextAnalysis.cdcChunksOf]], the SAME
  * per-document boundary loop the batch operator runs) and their chunk
  * digests attributed against a PERSISTENT base digest table; in grow
  * mode the batch's previously-unseen digests join the base, so later
  * increments match against earlier ones.
  *
  * Because boundaries are content-defined, the stream inherits CdcSpec's
  * edit-survival property: a passage copied into a later increment at
  * ANY offset — even with a prepended edit that would shift every fixed
  * window — still lands on the base's chunk digests after the first
  * post-edit boundary.
  *
  * Base layout under `baseDir`:
  *  - `chunks/` parquet (chunk_md5, base_doc, n_toks): one row per
  *    distinct chunk digest seen so far, keeper = smallest doc_id —
  *    exactly [[TextAnalysis.cdcBaseDigestsOf]] of the corpus so far.
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * AT-LEAST-ONCE. The ledger marker is written only after the body
  * completes, so every replay after the marker is skipped, but a crash
  * in the window between the grow-mode append and the marker replays
  * the whole body once — the replayed anti-join then sees the already-
  * grown base (its own digests included), so growth converges (fresh
  * is empty, no duplicate digest rows land) while the re-delivered
  * match set can carry EXTRA self-hit rows the first delivery did not
  * (batch chunks now matching the digests the crashed run appended).
  * A crash MID-append can additionally leave partial part files under
  * `chunks/` that need manual cleanup before restart. Only a
  * transactional target closes this window; downstream consumers must
  * key on (batch doc, base doc, chunk) if they need dedup.
  *
  *  1. matches = batch chunks x base digests equi-join on chunk_md5
  *     ([[TextAnalysis.cdcMatchAgainstBase]] — the batch operator's
  *     core); `deliver(matches, batchId)`.
  *  2. grow mode: the batch's digests NOT already in the base (one
  *     keeper per digest, smallest batch doc_id) append to `chunks/`.
  *    The anti-join's plan reads the base path, so the survivor set is
  *    lineage-pinned BEFORE the append (same refreshByPath hazard and
  *    same cure as StreamingIncrementalDedup.grow).
  *
  * Contract, matching the batch operator: matches pair a batch chunk
  * against the BASE only — two copies of a chunk inside one micro-batch
  * are not paired with each other (in grow mode the later copy in any
  * LATER batch hits the grown base). Against a static base each doc's
  * matches depend only on (doc, base), so any micro-batch split of the
  * same documents emits exactly the batch operator's rows — the parity
  * theorem StreamingCdcSpec checks, plus the corpus-replay
  * reconstruction of `cdc_dedup`'s duplicate-digest set.
  *
  * Scale shape: identical to the batch operator — the chunker is a
  * zero-shuffle per-doc loop, the attribution an equi-join on digest
  * with the increment as the small side, the base never re-paired
  * against itself; growth is an append of O(new digests), never O(base).
  */
object StreamingCdc {

  /** Materialize the digest base from an initial corpus (the one-time
    * bootstrap before streaming increments). */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit =
    TextAnalysis.cdcBaseDigestsOf(TextAnalysis.cdcChunksOf(baseDocs))
      .write.mode("overwrite").parquet(s"$baseDir/chunks")

  /** Matches for one micro-batch, given its ALREADY-chunked table
    * (chunked once per batch — matching and grow-mode growth share it,
    * so the per-token MD5 loop never runs twice). Materialized before
    * return; caches are reported to `track` for end-of-batch
    * unpersist. */
  def batchMatches(batchChunks: DataFrame, baseDir: String,
      track: DataFrame => Unit): DataFrame = {
    val spark = batchChunks.sparkSession
    val base = spark.read.parquet(s"$baseDir/chunks")
    val m = TextAnalysis.cdcMatchAgainstBase(batchChunks, base)
    m.cache(); m.count(); track(m)
    m
  }

  /** The `foreachBatch` body, exposed for direct (deterministic) testing:
    * ledger-guarded match delivery + optional base growth. */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_cdc_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        // chunk ONCE: matching and grow mode both read it
        val chunks = TextAnalysis.cdcChunksOf(batch)
        chunks.cache(); cached += chunks
        val m = batchMatches(chunks, baseDir, cached += _)
        try {
          deliver(m, batchId)
          if (growBase) {
            val fresh = TextAnalysis.cdcBaseDigestsOf(chunks)
              .join(spark.read.parquet(s"$baseDir/chunks")
                .select("chunk_md5"), Seq("chunk_md5"), "left_anti")
            val (pinned, rdd) = graft.util.Ckpt.materialize(fresh)
            try pinned.write.mode("append").parquet(s"$baseDir/chunks")
            finally rdd.unpersist(blocking = false)
          }
        } finally cached.foreach(_.unpersist())
      }
  }

  /** Start the streaming query: a stream of (doc_id, text) documents,
    * CDC-attributed per micro-batch against (and, in grow mode, into)
    * the persistent digest base at `baseDir`. */
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
