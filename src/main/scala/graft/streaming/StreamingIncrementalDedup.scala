package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[graft.operators.Dedup.incrementalDedup]] — the
  * daily-crawl dedup shape run as a stream: micro-batches of new documents
  * dedup against a PERSISTENT base (the artifacts a production pipeline
  * keeps between increments), and — in grow mode — the batch's surviving
  * texts join the base so later increments dedup against them.
  *
  * Base layout under `baseDir` (both artifacts under the
  * [[PartitionedBase]] per-batchId overwrite layout; the per-partition
  * row shapes are exactly the batch operator's inputs, see
  * [[Dedup.hitsAgainstBase]], which this twin shares verbatim — the two
  * paths agree by construction AND by the parity spec):
  *
  *  - `digests/batch=<id>/`  parquet (fp, base_doc_id): one row per
  *    distinct text FIRST surviving in that batch, keeper = smallest
  *    doc_id — the exact-dedup join target (bootstrap = `batch=-1`).
  *  - `shingles/batch=<id>/` parquet (doc_id, sh): word-3-shingle rows
  *    over that batch's surviving canonical docs — the near-dup inverted
  *    index. The hot-shingle DF cap is re-derived from the base-so-far
  *    each batch, so a shingle that goes hot as the base grows stops
  *    generating candidate pairs from that batch on.
  *
  *  Flat pre-r15 dirs migrate with [[PartitionedBase.migrateFlat]] (run
  *  once per artifact dir, stream stopped).
  *
  * Per micro-batch, wrapped in [[BatchLedger]]. Delivery guarantee:
  * at-least-once with BYTE-IDENTICAL re-delivery; base growth:
  * idempotent (exactly-once effective). The hits read and the growth
  * write follow the [[PartitionedBase]] discipline (`batch < batchId` in,
  * overwrite-own-partition out), so a crash-and-replay — even one that
  * crashed mid-write — recomputes the same hits against the same base
  * and lands the same keeper/shingle rows in the same directories. The
  * flat layout's replay artifact (a batch exact-hitting its own crashed
  * growth) cannot occur.
  *
  *  1. hits = exact (digest join) ∪ near (capped-shingle Jaccard >= 0.8)
  *     against the base as-of batch start; `deliver(hits, batchId)`.
  *  2. grow mode: batch docs with NO hit, collapsed to one keeper per
  *     distinct text (min doc_id); digest rows overwrite
  *     `digests/batch=<id>`, shingle rows `shingles/batch=<id>`.
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
  *    StreamingIncrementalDedupSpec checks, including across a
  *    marker-deleted replay.
  *
  * Scale shape: identical to the batch operator (hash equi-joins keyed by
  * digest/shingle, increment side small, base never re-paired against
  * itself); growth is two O(batch-survivors) partition overwrites (no
  * read-modify-write of the base), so a batch's cost is O(batch + touched
  * base partitions), never O(base).
  */
object StreamingIncrementalDedup {

  /** Materialize the base artifacts from an initial corpus (the one-time
    * bootstrap a production pipeline runs before streaming increments). */
  def initBase(baseDocs: DataFrame, baseDir: String): Unit = {
    PartitionedBase.init(Dedup.baseDigests(baseDocs), s"$baseDir/digests")
    PartitionedBase.init(Dedup.shingleRows(Dedup.canonicalDocs(baseDocs)),
      s"$baseDir/shingles")
  }

  /** Hits for one micro-batch of documents (`doc_id`, `text`) against the
    * base as-of `batchId` — the batch operator's core on parquet-read
    * base artifacts (partitions strictly before `batchId`). Result is
    * materialized (the caller reads it at least twice: deliver + growth
    * anti-join); all caches this creates are reported to `track` for
    * end-of-batch unpersist. */
  def batchHits(batch: DataFrame, baseDir: String, batchId: Long,
      track: DataFrame => Unit): DataFrame = {
    val spark = batch.sparkSession
    val hits = Dedup.hitsAgainstBase(batch,
      PartitionedBase.before(spark, s"$baseDir/digests", batchId),
      PartitionedBase.before(spark, s"$baseDir/shingles", batchId), track)
    hits.cache()
    hits.count()
    track(hits)
    hits
  }

  /** Grow the base: docs with no hit, one keeper per distinct text
    * (smallest doc_id — within-batch exact copies collapse here), digest
    * + shingle rows overwritten into the batch's own partitions.
    *
    * `keepers` is localCheckpoint-ed BEFORE the writes so the canonical
    * scan runs once for both artifacts (the refreshByPath trap the flat
    * layout had to pin against is structurally gone — both reads filter
    * `batch < batchId`, which excludes the written partitions). */
  private def grow(batch: DataFrame, hits: DataFrame, baseDir: String,
      batchId: Long): Unit = {
    val survivors = batch
      .join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val (keepers, rdd) = graft.util.Ckpt.materialize(Dedup.canonicalDocs(survivors))
    try {
      PartitionedBase.write(Dedup.baseDigests(keepers),
        s"$baseDir/digests", batchId)
      PartitionedBase.write(Dedup.shingleRows(keepers),
        s"$baseDir/shingles", batchId)
    } finally rdd.unpersist(blocking = false)
  }

  /** The `foreachBatch` body, exposed for direct (deterministic) testing:
    * ledger-guarded hits delivery + optional base growth. */
  def onBatch(baseDir: String, growBase: Boolean,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_dedup_ledger", batch, batchId) {
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val hits = batchHits(batch, baseDir, batchId, cached += _)
        try {
          deliver(hits, batchId)
          if (growBase) grow(batch, hits, baseDir, batchId)
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
