package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.TextAnalysis.winnowIncremental]] —
  * copy detection as a stream: micro-batches of new documents are
  * winnowed ([[TextAnalysis.winnowFps]], the SAME core the batch operator
  * uses) and attributed against a PERSISTENT fingerprint base; in grow
  * mode every batch's fingerprints join the base, so later increments
  * match against earlier ones.
  *
  * Base layout under `baseDir` ([[PartitionedBase]] — per-batchId
  * overwrite partitions):
  *  - `fps/batch=<id>/` parquet (doc_id, fp): the distinct winnowed
  *    fingerprints of that batch's documents (bootstrap = `batch=-1`);
  *    the union over partitions is exactly the artifact the batch
  *    operator's session memo materializes. The hot-fingerprint DF cap
  *    is re-derived from the base-so-far each batch (a gram gone
  *    boilerplate as the corpus grows stops pairing from that batch on),
  *    matching the batch operator's base-side-cap contract. A flat
  *    pre-r15 `fps/` migrates with [[PartitionedBase.migrateFlat]].
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * at-least-once with BYTE-IDENTICAL re-delivery; base growth:
  * idempotent (exactly-once effective) — matching reads `batch <
  * batchId` and growth overwrites the batch's own partition, so a
  * crash-and-replay recomputes the same matches against the same base
  * and re-lands the same fingerprint rows (a doc's fingerprints derive
  * from the batch alone, so the overwrite is trivially deterministic;
  * the flat layout's replayed-append duplication cannot occur).
  *
  *  1. matches = batch fps x base fps equi-join on fp (cap applied both
  *     sides), >= minShared shared prints, cover = matched share of the
  *     batch doc's prints; `deliver(matches, batchId)`.
  *  2. grow mode: the batch's full fingerprint table overwrites
  *     `fps/batch=<id>` (copy detection is attribution, not dedup —
  *     matched docs are part of the corpus too, so ALL batch docs grow
  *     the base).
  *
  * Contract, matching the batch operator: matches pair a batch doc
  * against the BASE only — two copies inside one micro-batch are not
  * paired with each other; with grow on, the second copy in any LATER
  * batch hits the grown base. Against a static base each doc's verdict
  * depends only on (doc, base), so any micro-batch split of the same
  * documents emits exactly the batch operator's rows — the parity theorem
  * StreamingWinnowSpec checks, including across a marker-deleted replay.
  *
  * Scale shape: identical to the batch operator — the winnow is a
  * zero-shuffle per-doc loop, the attribution an equi-join on fp with the
  * increment as the small side, the base never re-paired against itself;
  * growth is an O(batch) partition overwrite, never O(base).
  */
object StreamingWinnow {

  /** Materialize the fingerprint base from an initial corpus (the
    * one-time bootstrap before streaming increments). */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit =
    PartitionedBase.init(
      TextAnalysis.winnowFps(baseDocs).select("doc_id", "fp").distinct(),
      s"$baseDir/fps")

  /** Copy matches for one micro-batch, given its ALREADY-winnowed
    * distinct (doc_id, fp) table (winnowed once per batch — matching and
    * grow-mode growth share it, so the per-gram MD5 loop never runs
    * twice), against the base as-of `batchId`. The attribution itself is
    * [[TextAnalysis.winnowMatchAgainstBase]] — the SAME code path as the
    * batch operator, so stream and batch agree by construction.
    * Materialized before return; caches are reported to `track` for
    * end-of-batch unpersist. */
  def batchMatches(batchFps: DataFrame, baseDir: String, batchId: Long,
      track: DataFrame => Unit): DataFrame = {
    val spark = batchFps.sparkSession
    val base = PartitionedBase.before(spark, s"$baseDir/fps", batchId)
    val m = TextAnalysis.winnowMatchAgainstBase(batchFps, base)
    m.cache(); m.count(); track(m)
    m
  }

  /** The `foreachBatch` body, exposed for direct (deterministic) testing:
    * ledger-guarded match delivery + optional base growth. */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_winnow_ledger", batch, batchId) {
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        // winnow ONCE: matching reads it (twice: cap sizes + pair join)
        // and grow mode writes it — cache spans both consumers
        val batchFps = TextAnalysis.winnowFps(batch)
          .select("doc_id", "fp").distinct()
        batchFps.cache(); cached += batchFps
        val m = batchMatches(batchFps, baseDir, batchId, cached += _)
        try {
          deliver(m, batchId)
          if (growBase)
            PartitionedBase.write(batchFps, s"$baseDir/fps", batchId)
        } finally cached.foreach(_.unpersist())
      }
  }

  /** Start the streaming query: a stream of (doc_id, text) documents,
    * copy-attributed per micro-batch against (and, in grow mode, into)
    * the persistent fingerprint base at `baseDir`. */
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
