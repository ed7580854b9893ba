package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
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
  * Base layout under `baseDir` ([[PartitionedBase]] — per-batchId
  * overwrite partitions):
  *  - `chunks/batch=<id>/` parquet (chunk_md5, base_doc, n_toks): one row
  *    per distinct chunk digest FIRST seen in that batch, keeper =
  *    smallest doc_id; bootstrap = `batch=-1`. The union over partitions
  *    is exactly [[TextAnalysis.cdcBaseDigestsOf]] of the corpus so far
  *    (each batch's fresh set is anti-joined against everything earlier,
  *    so a digest appears in exactly one partition). A flat pre-r15 base
  *    migrates with [[PartitionedBase.migrateFlat]].
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * at-least-once with BYTE-IDENTICAL re-delivery; state growth:
  * idempotent (exactly-once effective). Matching and the fresh-digest
  * anti-join both read `batch < batchId`, and growth overwrites the
  * batch's own partition — so a crash-and-replay (even mid-write, with
  * partial part files left in the partition) recomputes the same match
  * set against the same base and lands the same fresh digests in the
  * same directory. The extra-self-hit re-delivery and the
  * manual-cleanup-after-mid-append-crash caveats of the flat-append
  * layout are both gone (see [[PartitionedBase]]).
  *
  *  1. matches = batch chunks x base digests equi-join on chunk_md5
  *     ([[TextAnalysis.cdcMatchAgainstBase]] — the batch operator's
  *     core); `deliver(matches, batchId)`.
  *  2. grow mode: the batch's digests NOT already in the base-so-far
  *     (one keeper per digest, smallest batch doc_id) overwrite
  *     `chunks/batch=<id>`.
  *
  * Contract, matching the batch operator: matches pair a batch chunk
  * against the BASE only — two copies of a chunk inside one micro-batch
  * are not paired with each other (in grow mode the later copy in any
  * LATER batch hits the grown base). Against a static base each doc's
  * matches depend only on (doc, base), so any micro-batch split of the
  * same documents emits exactly the batch operator's rows — the parity
  * theorem StreamingCdcSpec checks, plus the corpus-replay
  * reconstruction of `cdc_dedup`'s duplicate-digest set and the
  * marker-deleted replay case.
  *
  * Scale shape: identical to the batch operator — the chunker is a
  * zero-shuffle per-doc loop, the attribution an equi-join on digest
  * with the increment as the small side, the base never re-paired
  * against itself; growth is an O(new digests) partition overwrite,
  * never O(base).
  */
object StreamingCdc {

  /** Materialize the digest base from an initial corpus (the one-time
    * bootstrap before streaming increments). */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit =
    PartitionedBase.init(
      TextAnalysis.cdcBaseDigestsOf(TextAnalysis.cdcChunksOf(baseDocs)),
      s"$baseDir/chunks")

  /** Matches for one micro-batch, given its ALREADY-chunked table
    * (chunked once per batch — matching and grow-mode growth share it,
    * so the per-token MD5 loop never runs twice), against the base
    * as-of `batchId`. Materialized before return; caches are reported
    * to `track` for end-of-batch unpersist. */
  def batchMatches(batchChunks: DataFrame, baseDir: String, batchId: Long,
      track: DataFrame => Unit): DataFrame = {
    val spark = batchChunks.sparkSession
    val base = PartitionedBase.before(spark, s"$baseDir/chunks", batchId)
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
        val m = batchMatches(chunks, baseDir, batchId, cached += _)
        try {
          deliver(m, batchId)
          if (growBase) {
            val fresh = TextAnalysis.cdcBaseDigestsOf(chunks)
              .join(PartitionedBase
                  .before(spark, s"$baseDir/chunks", batchId)
                  .select("chunk_md5"), Seq("chunk_md5"), "left_anti")
            val (pinned, rdd) = graft.util.Ckpt.materialize(fresh)
            try PartitionedBase.write(pinned, s"$baseDir/chunks", batchId)
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
