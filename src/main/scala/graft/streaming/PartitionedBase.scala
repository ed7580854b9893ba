package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-batchId overwrite-partition state layout shared by every
  * grow-mode streaming base — first proven on the recrawl state table
  * ([[StreamingRecrawl]]), factored out here so the six dedup twins
  * (exact, URL, span, embedding, CDC, winnow) get the same guarantee.
  *
  * Layout: Hive-partitioned parquet, `<dir>/batch=<id>/` — one directory
  * per micro-batch that grew the base, bootstrap rows under `batch=-1`.
  * Readers see the union; the `batch` column rides along from partition
  * discovery and is dropped before use.
  *
  * Why this beats a flat append: growth becomes IDEMPOTENT under replay
  * instead of at-least-once-with-a-crash-window.
  *
  *  - A batch writes its new rows with `overwrite` into its OWN
  *    `batch=<id>` partition, so a crash-and-replay — even one that
  *    crashed MID-write and left partial part files in the partition —
  *    overwrites the same directory instead of appending duplicates.
  *  - Every in-batch read is pinned to `batch < batchId`: the state as of
  *    the batch's FIRST attempt. A replayed batch therefore recomputes
  *    byte-identical hits (no self-hit rows from seeing its own crashed
  *    growth — the exact artifact the flat-append twins had to document)
  *    and byte-identical growth rows.
  *
  * The [[BatchLedger]] marker remains in front of every body, but it is
  * no longer load-bearing for STATE correctness — only for skipping
  * redundant work and for not re-DELIVERING downstream. Net delivery
  * guarantee: at-least-once with byte-identical re-delivery; state:
  * exactly-once effective.
  *
  * Partition-pruning note (100 TB): `batch < batchId` is a partition
  * filter — Spark prunes the excluded directories at listing time, so a
  * replay never even lists its own partial output. Reads that feed an
  * equi-join (digest/canon/fp lookup) behave exactly as the flat layout
  * did; the only new cost is directory-count growth, bounded by the same
  * offline compaction discipline as the recrawl table (roll history into
  * one partition between stream runs — [[replace]] with the identity).
  *
  * MIGRATION (pre-r15 flat bases): a base dir written by the append-mode
  * twins holds root-level part files with no `batch=` directories. Run
  * [[migrateFlat]] once (stream stopped) to move the rows under
  * `batch=-1`; the ledger dir is untouched, so a checkpointed stream
  * resumes where it left off. */
object PartitionedBase {

  /** One-time bootstrap: the initial corpus's rows become `batch=-1`. */
  def init(rows: DataFrame, dir: String): Unit =
    rows.write.mode("overwrite").parquet(s"$dir/batch=-1")

  /** Base read with the `batch` column kept, schema pinned to the
    * bootstrap partition when one exists: Parquet schema inference
    * samples ONE file footer before partition filters apply, so a
    * corrupt partial part file left in a crashed `batch=<id>` partition
    * could otherwise be the sampled file and fail every read — replay
    * correctness must not depend on `batch=-1` happening to sort first.
    * The bootstrap partition is written once, atomically, by [[init]] /
    * [[replace]], so its footers are always intact; a dir with no
    * bootstrap partition (a flat pre-r15 base — only [[migrateFlat]]
    * reads those) falls back to plain inference. */
  def withBatch(spark: SparkSession, dir: String): DataFrame = {
    val boot = new org.apache.hadoop.fs.Path(s"$dir/batch=-1")
    val fs = boot.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(boot))
      spark.read
        .schema(spark.read.parquet(s"$dir/batch=-1").schema
          .add("batch", org.apache.spark.sql.types.LongType))
        .parquet(dir)
    else spark.read.parquet(dir)
  }

  /** State-so-far for `batchId`: partitions STRICTLY before it. This is
    * the read every onBatch body must use — excluding the batch's own id
    * (and any later leftovers) is what makes replay idempotent. */
  def before(spark: SparkSession, dir: String, batchId: Long): DataFrame =
    withBatch(spark, dir).filter(col("batch") < batchId).drop("batch")

  /** Everything, for offline reads (audits, forget rewrites, specs). */
  def all(spark: SparkSession, dir: String): DataFrame =
    withBatch(spark, dir).drop("batch")

  /** Idempotent growth: overwrite the batch's OWN partition. */
  def write(rows: DataFrame, dir: String, batchId: Long): Unit =
    rows.write.mode("overwrite").parquet(s"$dir/batch=$batchId")

  /** Layout-preserving OFFLINE rewrite: swap `rows` in as the entire base
    * content, rolled into one `batch=<upto>` partition. Used by the
    * forget rewriters and by compaction/migration. `rows` must already be
    * materialized (localCheckpoint) if its plan reads `dir` — the swap
    * replaces the plan's input.
    *
    * COMPACTION CADENCE (measured, DirGrowthProbe r17 — SCALE_NOTES):
    * at fixed row count the per-read cost grows linearly in partition
    * count, ~10 ms per accumulated partition with 32-file batch
    * directories (file-open/footer cost, not listing: the one-RPC
    * directory listing term is ~0.1 s at 200 partitions), putting the
    * probe at 1.6x its compacted floor by ~50 partitions and ~5x by
    * 200. Compact (this method with the identity, or [[migrateFlat]])
    * roughly every 50 grown batches: at that cadence the mean read
    * overhead stays under ~50% of the floor and the measured ~5 s
    * compaction amortizes to <0.1 s per batch at 1M-row state scale.
    *
    * Crash contract (same as the recrawl compactor): must not run
    * concurrently with onBatch. The swap is two renames; a crash between
    * them leaves no `dir` — loud, recoverable by renaming `<dir>_old`
    * back. A crash while writing `<dir>_tmp` changes nothing visible. */
  def replace(spark: SparkSession, dir: String, rows: DataFrame,
      upto: Long = -1L): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val cur = new org.apache.hadoop.fs.Path(dir)
    val fs = cur.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(s"${dir}_tmp")
    // a leftover _tmp from a previously crashed swap may hold OTHER
    // batch=<id> partitions than this call's `upto` — the overwrite
    // below is scoped to `batch=$upto` only, so without this delete the
    // rename would silently install those stale partitions (data
    // resurrection, fatal for the forget/RTBF callers)
    fs.delete(tmp, true)
    rows.write.mode("overwrite").parquet(s"${dir}_tmp/batch=$upto")
    val old = new org.apache.hadoop.fs.Path(s"${dir}_old")
    fs.delete(old, true)
    require(fs.rename(cur, old), s"replace: could not retire $cur")
    require(fs.rename(tmp, cur), s"replace: could not install $tmp")
    fs.delete(old, true)
  }

  /** One-time migration of a pre-r15 FLAT base dir (root-level part
    * files, written by the append-mode twins) into this layout: the rows
    * move under `batch=-1`. Idempotent on an already-migrated dir. */
  def migrateFlat(spark: SparkSession, dir: String): Unit = {
    // drop("batch") is a no-op on a flat dir, so this also re-compacts
    // an already-partitioned base — both shapes converge to batch=-1
    val (mat, rdd) = graft.util.Ckpt.materialize(all(spark, dir))
    try replace(spark, dir, mat)
    finally rdd.unpersist(blocking = false)
  }
}
