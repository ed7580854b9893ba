package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.Dedup.incrementalDedup]] — the
  * daily-crawl dedup shape run as a stream: micro-batches of new documents
  * dedup against a PERSISTENT base (the artifacts a production pipeline
  * keeps between increments), and — in grow mode — the batch's surviving
  * texts join the base so later increments dedup against them.
  *
  * Base layout under `baseDir` (both exactly the batch operator's inputs,
  * see [[Dedup.hitsAgainstBase]], which this twin shares verbatim — the
  * two paths agree by construction AND by the parity spec):
  *
  *  - `digests/`  parquet (fp, base_doc_id): one row per distinct base
  *    text, keeper = smallest doc_id — the exact-dedup join target.
  *  - `shingles/` parquet (doc_id, sh): word-3-shingle rows over canonical
  *    base docs — the near-dup inverted index. The hot-shingle DF cap is
  *    re-derived from the CURRENT base each batch, so a shingle that goes
  *    hot as the base grows stops generating candidate pairs from that
  *    batch on.
  *
  * Per micro-batch (wrapped in [[BatchLedger]] so delivery AND base growth
  * happen at most once per batch id across restarts — base growth is a
  * side effect exactly like alert delivery, and replaying it would both
  * duplicate digest rows and flag the batch against its own survivors):
  *
  *  1. hits = exact (digest join) ∪ near (capped-shingle Jaccard >= 0.8)
  *     against the base as-of batch start; `deliver(hits, batchId)`.
  *  2. grow mode: batch docs with NO hit, collapsed to one keeper per
  *     distinct text (min doc_id), append to `digests/`; their shingle
  *     rows append to `shingles/`.
  *
  * Contract notes, matching the batch operator:
  *  - hits pair a new doc against the BASE only — two near-dup docs inside
  *    one micro-batch are NOT paired with each other (the batch operator's
  *    documented increment-vs-base contract); in grow mode the exact-dup
  *    copies inside one batch collapse to a single keeper, and a copy
  *    arriving in any LATER batch hits the grown base.
  *  - against a STATIC base (grow = false), each doc's verdict depends
  *    only on (doc, base), so ANY micro-batch split of the same documents
  *    emits exactly the batch operator's rows — the parity theorem
  *    StreamingIncrementalDedupSpec checks.
  *
  * Scale shape: identical to the batch operator (hash equi-joins keyed by
  * digest/shingle, increment side small, base never re-paired against
  * itself); the appends are blind parquet writes (no read-modify-write of
  * the base), so a batch's cost is O(batch + touched base partitions),
  * never O(base). A transactional table format would additionally close
  * the crash-between-append-and-marker window the ledger documents.
  */
object StreamingIncrementalDedup {

  /** Materialize the base artifacts from an initial corpus (the one-time
    * bootstrap a production pipeline runs before streaming increments). */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit = {
    Dedup.baseDigests(baseDocs)
      .write.mode("overwrite").parquet(s"$baseDir/digests")
    Dedup.shingleRows(Dedup.canonicalDocs(baseDocs))
      .write.mode("overwrite").parquet(s"$baseDir/shingles")
  }

  /** Hits for one micro-batch of documents (`doc_id`, `text`) against the
    * persistent base — the batch operator's core on parquet-read base
    * artifacts. Result is materialized (the caller reads it at least
    * twice: deliver + growth anti-join); all caches this creates are
    * reported to `track` for end-of-batch unpersist (a cache surviving
    * the batch could serve a STALE base after grow-mode appends — cached
    * plans match by canonicalized equality, not files on disk). */
  def batchHits(batch: DataFrame, baseDir: String,
      track: DataFrame => Unit): DataFrame = {
    val spark = batch.sparkSession
    val hits = Dedup.hitsAgainstBase(batch,
      spark.read.parquet(s"$baseDir/digests"),
      spark.read.parquet(s"$baseDir/shingles"), track)
    hits.cache()
    hits.count()
    track(hits)
    hits
  }

  /** Append the batch's surviving texts to the base: docs with no hit,
    * one keeper per distinct text (smallest doc_id — within-batch exact
    * copies collapse here), digest + shingle rows.
    *
    * `keepers` is localCheckpoint-ed BEFORE the first append: the plan
    * reads the base parquet (through `hits`), and Spark's write-path
    * `refreshByPath` invalidates-and-recomputes every cached plan that
    * references the written path — so after the digest append, a merely
    * `cache()`d survivor set would silently re-derive against the GROWN
    * digests, the batch's own keepers would exact-hit themselves, and
    * the shingle append would write nothing (observed exactly so).
    * Truncating the lineage pins the survivor set to the base-as-of-
    * batch-start for both appends. */
  private def grow(batch: DataFrame, hits: DataFrame, baseDir: String): Unit = {
    val survivors = batch
      .join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val (keepers, rdd) = graft.util.Ckpt.materialize(Dedup.canonicalDocs(survivors))
    try {
      Dedup.baseDigests(keepers)
        .write.mode("append").parquet(s"$baseDir/digests")
      Dedup.shingleRows(keepers)
        .write.mode("append").parquet(s"$baseDir/shingles")
    } finally rdd.unpersist(blocking = false)
  }

  /** The `foreachBatch` body, exposed for direct (deterministic) testing:
    * ledger-guarded hits delivery + optional base growth. */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_dedup_ledger", batch, batchId) {
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val hits = batchHits(batch, baseDir, cached += _)
        try {
          deliver(hits, batchId)
          if (growBase) grow(batch, hits, baseDir)
        } finally cached.foreach(_.unpersist())
      }
  }

  /** Start the streaming query: a stream of (doc_id, text) documents,
    * deduped per micro-batch against (and, in grow mode, into) the
    * persistent base at `baseDir`. */
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
