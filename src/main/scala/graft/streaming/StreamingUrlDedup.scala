package graft.streaming

import graft.operators.Corpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.Corpus.urlDedupIncremental]] —
  * the canonical-URL dedup channel run as a stream: micro-batches of
  * (doc_id, url) rows dedup against a PERSISTENT canonical-URL keeper
  * table, and — in grow mode — the batch's surviving canonical URLs join
  * the base so later increments dedup against them. This is the first
  * gate of a streaming crawl ingest: it fires before any text is even
  * fetched, on the URL string alone.
  *
  * Base layout under `baseDir` ([[PartitionedBase]] — per-batchId
  * overwrite partitions; the row shape per partition is exactly the batch
  * operator's input, see [[Corpus.urlHitsAgainstBase]], which this twin
  * shares verbatim — the two paths agree by construction AND by the
  * parity spec):
  *
  *  - `canon/batch=<id>/` parquet (canon_url, base_doc_id): one row per
  *    distinct canonical URL first surviving in that batch, keeper =
  *    smallest doc_id ([[Corpus.urlBaseCanon]]); bootstrap = `batch=-1`.
  *    NOTE: a base written by a pre-r14 build must be REBUILT from raw
  *    URLs on upgrade — r14 changed the canonical form of scheme-less
  *    rows and bare tracking params (see the [[Corpus.canonicalUrl]]
  *    artifact-compatibility note); a FLAT pre-r15 base migrates with
  *    [[PartitionedBase.migrateFlat]].
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * at-least-once with BYTE-IDENTICAL re-delivery; state growth:
  * idempotent (exactly-once effective). Both reads are pinned to
  * `batch < batchId` and the growth overwrites the batch's own
  * partition, so a crash-and-replay — before or after the marker, even
  * mid-write — recomputes the same hits against the same base and lands
  * the same keeper rows in the same directory (see [[PartitionedBase]];
  * the self-hit re-delivery artifact the flat-append layout documented
  * is gone).
  *
  *  1. hits = canonicalize + equi-join against the base as-of batch
  *     start; `deliver(hits, batchId)`.
  *  2. grow mode: batch docs with NO hit, collapsed to one keeper per
  *     distinct canonical URL (min doc_id), overwrite `canon/batch=<id>`.
  *
  * Contract notes, matching the batch operator: hits pair a new doc
  * against the BASE only — two copies of a page inside one micro-batch
  * are NOT paired with each other (they collapse to a single keeper in
  * grow mode, and a copy arriving in any LATER batch hits the grown
  * base). Against a STATIC base, each doc's verdict depends only on
  * (doc, base), so ANY micro-batch split of the same documents emits
  * exactly the batch operator's rows — the parity theorem
  * StreamingUrlDedupSpec checks, including across a marker-deleted
  * replay.
  *
  * Scale shape: identical to the batch operator (one hash equi-join on
  * the canonical string, batch side small, base never re-joined against
  * itself); growth is an O(batch-survivors) partition overwrite, never
  * O(base), and the `batch < batchId` filter prunes at directory-listing
  * time. */
object StreamingUrlDedup {

  /** Materialize the keeper table from an initial corpus's (doc_id, url)
    * rows — the one-time bootstrap before streaming increments. */
  def initBase(baseUrls: DataFrame, baseDir: String): Unit =
    PartitionedBase.init(Corpus.urlBaseCanon(baseUrls), s"$baseDir/canon")

  /** Hits for one micro-batch of (doc_id, url) rows against the base
    * as-of `batchId` (partitions strictly before it). Materialized via
    * cache — the caller reads it at least twice (deliver + growth
    * anti-join); the cache is reported to `track` for end-of-batch
    * unpersist. */
  def batchHits(batch: DataFrame, baseDir: String, batchId: Long,
      track: DataFrame => Unit): DataFrame = {
    val spark = batch.sparkSession
    val hits = Corpus.urlHitsAgainstBase(batch,
      PartitionedBase.before(spark, s"$baseDir/canon", batchId))
    hits.cache()
    hits.count()
    track(hits)
    hits
  }

  /** Grow the base: docs with no hit, one keeper per distinct canonical
    * URL (smallest doc_id — within-batch copies of a page collapse
    * here), overwritten into the batch's own partition.
    *
    * `keepers` is localCheckpoint-ed BEFORE the write: not for
    * correctness anymore (the hits plan's `batch < batchId` filter
    * excludes the written partition, so a refreshByPath recompute would
    * see the same rows) but to avoid paying the join twice. */
  private def grow(batch: DataFrame, hits: DataFrame, baseDir: String,
      batchId: Long): Unit = {
    val survivors = batch
      .join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val (keepers, rdd) =
      graft.util.Ckpt.materialize(Corpus.urlBaseCanon(survivors))
    try PartitionedBase.write(keepers, s"$baseDir/canon", batchId)
    finally rdd.unpersist(blocking = false)
  }

  /** The `foreachBatch` body, exposed for direct (deterministic)
    * testing: ledger-guarded hits delivery + optional base growth. */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_url_ledger", batch, batchId) {
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val hits = batchHits(batch, baseDir, batchId, cached += _)
        try {
          deliver(hits, batchId)
          if (growBase) grow(batch, hits, baseDir, batchId)
        } finally cached.foreach(_.unpersist())
      }
  }

  /** Start the streaming query: a stream of (doc_id, url) rows, deduped
    * per micro-batch against (and, in grow mode, into) the persistent
    * keeper table at `baseDir`. */
  def start(urls: DataFrame, baseDir: String, checkpointDir: String,
      triggerMs: Long, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): StreamingQuery =
    urls.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(onBatch(baseDir, growBase, deliver))
      .start()
}
