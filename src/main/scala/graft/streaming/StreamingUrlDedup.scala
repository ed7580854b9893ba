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
  * Base layout under `baseDir` (exactly the batch operator's input, see
  * [[Corpus.urlHitsAgainstBase]], which this twin shares verbatim — the
  * two paths agree by construction AND by the parity spec):
  *
  *  - `canon/` parquet (canon_url, base_doc_id): one row per distinct
  *    canonical base URL, keeper = smallest doc_id
  *    ([[Corpus.urlBaseCanon]]). NOTE: a base written by a pre-r14
  *    build must be REBUILT from raw URLs on upgrade — r14 changed the
  *    canonical form of scheme-less rows and bare tracking params, so
  *    stale keeper strings silently stop matching (see the
  *    [[Corpus.canonicalUrl]] artifact-compatibility note).
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * AT-LEAST-ONCE. The marker is written only after the body completes,
  * so replays after the marker are skipped — but a crash between the
  * grow-mode append and the marker replays the body once: the replayed
  * hit join then sees the grown base, so the batch's surviving keepers
  * hit THEMSELVES (extra self-hit rows in the re-delivery), and the
  * shrunken survivor set re-appends nothing new (growth converges; the
  * keeper rows are deterministic, so no divergent duplicates land). A
  * crash MID-append can leave partial part files under `canon/`
  * needing cleanup. Only a transactional target closes this window:
  *
  *  1. hits = canonicalize + equi-join against the base as-of batch
  *     start; `deliver(hits, batchId)`.
  *  2. grow mode: batch docs with NO hit, collapsed to one keeper per
  *     distinct canonical URL (min doc_id), append to `canon/`.
  *
  * Contract notes, matching the batch operator: hits pair a new doc
  * against the BASE only — two copies of a page inside one micro-batch
  * are NOT paired with each other (they collapse to a single keeper in
  * grow mode, and a copy arriving in any LATER batch hits the grown
  * base). Against a STATIC base, each doc's verdict depends only on
  * (doc, base), so ANY micro-batch split of the same documents emits
  * exactly the batch operator's rows — the parity theorem
  * StreamingUrlDedupSpec checks.
  *
  * Scale shape: identical to the batch operator (one hash equi-join on
  * the canonical string, batch side small, base never re-joined against
  * itself); growth is a blind parquet append, so a batch's cost is
  * O(batch + matched base partitions), never O(base). */
object StreamingUrlDedup {

  /** Materialize the keeper table from an initial corpus's (doc_id, url)
    * rows — the one-time bootstrap before streaming increments. */
  def initBase(baseUrls: DataFrame, baseDir: String): Unit =
    Corpus.urlBaseCanon(baseUrls)
      .write.mode("overwrite").parquet(s"$baseDir/canon")

  /** Hits for one micro-batch of (doc_id, url) rows against the
    * persistent base. Materialized via cache — the caller reads it at
    * least twice (deliver + growth anti-join); the cache is reported to
    * `track` for end-of-batch unpersist (a cache surviving the batch
    * could serve a STALE base after grow-mode appends). */
  def batchHits(batch: DataFrame, baseDir: String,
      track: DataFrame => Unit): DataFrame = {
    val spark = batch.sparkSession
    val hits = Corpus.urlHitsAgainstBase(batch,
      spark.read.parquet(s"$baseDir/canon"))
    hits.cache()
    hits.count()
    track(hits)
    hits
  }

  /** Append the batch's surviving URLs to the base: docs with no hit,
    * one keeper per distinct canonical URL (smallest doc_id — within-
    * batch copies of a page collapse here).
    *
    * `keepers` is localCheckpoint-ed BEFORE the append: the hits plan
    * reads the base parquet, and Spark's write-path `refreshByPath`
    * recomputes every cached plan referencing the written path — a
    * merely cache()d survivor set would re-derive against the GROWN
    * base and the batch's own keepers would hit themselves (the exact
    * failure [[StreamingIncrementalDedup]] documents). */
  private def grow(batch: DataFrame, hits: DataFrame,
      baseDir: String): Unit = {
    val survivors = batch
      .join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val (keepers, rdd) =
      graft.util.Ckpt.materialize(Corpus.urlBaseCanon(survivors))
    try keepers.write.mode("append").parquet(s"$baseDir/canon")
    finally rdd.unpersist(blocking = false)
  }

  /** The `foreachBatch` body, exposed for direct (deterministic)
    * testing: ledger-guarded hits delivery + optional base growth. */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_url_ledger", batch, batchId) {
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val hits = batchHits(batch, baseDir, cached += _)
        try {
          deliver(hits, batchId)
          if (growBase) grow(batch, hits, baseDir)
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
