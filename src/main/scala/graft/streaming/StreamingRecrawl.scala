package graft.streaming

import graft.operators.Crawl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Crawl.recrawlIncremental]] — the
  * recrawl scheduler run as a continuously-fed state table: micro-batches
  * of fetch observations (page, sig, ts_sec, event_id) reduce to per-page
  * PARTIAL state rows (fetch count, internal change count, boundary flip
  * vs the state-so-far, last signature + order key), and the current
  * schedule is one aggregation over the partial rows. Batches must arrive
  * in fetch-time order per page — the natural property of a crawl log,
  * and the same ordering contract the incremental batch form assumes.
  *
  * State layout under `baseDir/state`: Hive-partitioned parquet,
  * `batch=<batchId>/` one directory per micro-batch, each holding one
  * partial row per page the batch touched. Readers see the union; the
  * `batch` column rides along from partition discovery.
  *
  * Delivery guarantee: state growth is IDEMPOTENT under replay —
  * stronger than the at-least-once append the CDC/URL twins document.
  * Each batch's partials are written with `overwrite` into its OWN
  * `batch=<id>` partition directory, so a crash-and-replay (even one
  * that crashed mid-write and left partial part files) overwrites the
  * same directory instead of appending a duplicate: n and x never
  * double-count. The boundary-flip input likewise ignores `batch >=
  * batchId` partitions, so a replay recomputes against exactly the
  * state the original attempt saw (see [[lastSigSoFar]]). The [[BatchLedger]] marker still short-circuits clean
  * replays; it is no longer load-bearing for correctness, only for
  * skipping work (and for not re-DELIVERING the schedule downstream).
  *
  * Boundary flips: the batch's first signature per page is compared
  * against the state-so-far's last signature (argmax over the partial
  * rows by the last-fetch order key) — exactly the one comparison
  * [[Crawl.recrawlIncremental]] makes, applied per micro-batch. Since n
  * and x are additive and the flip is computed against the true
  * predecessor fetch, ANY in-order micro-batch split of the same log
  * yields byte-identical schedules to the batch operator — the parity
  * theorem StreamingRecrawlSpec checks, including across a replay.
  *
  * Scale shape: per batch, one page-keyed window over the BATCH (small),
  * one aggregation over the state partials restricted to the batch's
  * pages (a semi-join in production; the full read here is fixture-
  * sized), one overwrite of O(batch pages) rows. The schedule read is
  * one page-keyed agg over partials — O(pages x batches) rows, compacted
  * in production by replacing history with a rolled-up `batch=-1`
  * partition (the same compaction discipline as the detector state
  * stores). */
object StreamingRecrawl {

  private def stateDir(baseDir: String) = s"$baseDir/state"

  /** One-time bootstrap: reduce an initial fetch log to the `batch=-1`
    * partial-state partition. */
  def initBase(log: DataFrame, baseDir: String): Unit =
    Crawl.pageState(log)
      .withColumn("x_total", col("x"))
      .select("page", "n", "x_total", "last_sig", "last_ts", "last_eid")
      .write.mode("overwrite")
      .parquet(s"${stateDir(baseDir)}/batch=-1")

  /** Current last-signature per page from the state STRICTLY BEFORE
    * `batchId`: the partial row with the max (last_ts, last_eid) among
    * `batch < batchId` partitions. Excluding the current id (and any
    * later leftovers) is what makes replay idempotent — a crashed batch
    * re-running must not see its OWN previous output as "state-so-far",
    * or the boundary flip would compare the batch against itself. */
  private def lastSigSoFar(spark: SparkSession, baseDir: String,
      batchId: Long): DataFrame = {
    val w = Window.partitionBy("page")
      .orderBy(col("last_ts").desc, col("last_eid").desc)
    spark.read.parquet(stateDir(baseDir))
      .filter(col("batch") < batchId)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("page"), col("last_sig").as("prev_sig"))
  }

  /** The `foreachBatch` body, exposed for direct (deterministic)
    * testing: write the batch's partial state idempotently, then
    * deliver the refreshed schedule. */
  def onBatch(baseDir: String,
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      BatchLedger.once(s"$baseDir/_graft_recrawl_ledger", batch, batchId) {
        val spark = batch.sparkSession
        val prev = lastSigSoFar(spark, baseDir, batchId)
        val partials = Crawl.pageState(batch)
          .join(prev, Seq("page"), "left")
          .select(col("page"), col("n"),
            (col("x") + when(col("prev_sig").isNotNull &&
              col("prev_sig") =!= col("first_sig"), 1L).otherwise(0L))
              .as("x_total"),
            col("last_sig"), col("last_ts"), col("last_eid"))
        val (rows, rdd) = graft.util.Ckpt.materialize(partials)
        try rows.write.mode("overwrite")
          .parquet(s"${stateDir(baseDir)}/batch=$batchId")
        finally rdd.unpersist(blocking = false)
        deliver(schedule(spark, baseDir), batchId)
      }
  }

  /** The current recrawl schedule from the state partials — the same
    * output schema as [[Crawl.recrawlSchedule]] (minus nothing): one
    * page-keyed agg, then the shared interval projection. */
  def schedule(spark: SparkSession, baseDir: String): DataFrame =
    Crawl.scheduleFrom(
      spark.read.parquet(stateDir(baseDir))
        .groupBy("page").agg(
          sum("n").as("n_fetches"),
          sum("x_total").as("n_changes")))

  /** OFFLINE state compaction: roll every `batch <= uptoBatch` partition
    * into ONE partial row per page stored under `batch=<uptoBatch>`,
    * pass later partitions through unchanged, and atomically swap the
    * new layout in. Bounds the schedule read at O(pages + pages x
    * batches-since-compaction) instead of O(pages x all batches).
    *
    * Correctness: n and x_total are additive across a page's partials
    * (each batch's boundary flip is already inside ITS x_total), and
    * the rolled last_sig/last_ts/last_eid are the argmax row's — so
    * onBatch boundary checks and schedule() see identical state before
    * and after (CompactionSpec case in StreamingRecrawlSpec).
    *
    * Crash contract: must not run concurrently with [[onBatch]] /
    * [[schedule]] (it rewrites the directory they read). The swap is
    * two renames; a crash between them leaves no `state` dir — loud,
    * and recoverable by renaming `state_old` back. A crash while
    * writing `state_tmp` changes nothing visible. */
  def compact(spark: SparkSession, baseDir: String, uptoBatch: Long): Unit = {
    val sd = stateDir(baseDir)
    val all = spark.read.parquet(sd)
    val w = Window.partitionBy("page")
      .orderBy(col("last_ts").desc, col("last_eid").desc)
    val rolled = all.filter(col("batch") <= uptoBatch)
      .withColumn("rn", row_number().over(w))
      .groupBy("page").agg(
        sum("n").as("n"),
        sum("x_total").as("x_total"),
        max(when(col("rn") === 1, col("last_sig"))).as("last_sig"),
        max(when(col("rn") === 1, col("last_ts"))).as("last_ts"),
        max(when(col("rn") === 1, col("last_eid"))).as("last_eid"))
      .withColumn("batch", lit(uptoBatch))
    val keep = all.filter(col("batch") > uptoBatch)
      .select("page", "n", "x_total", "last_sig", "last_ts", "last_eid", "batch")
    rolled.select("page", "n", "x_total", "last_sig", "last_ts", "last_eid", "batch")
      .unionByName(keep)
      .write.partitionBy("batch").mode("overwrite").parquet(s"$baseDir/state_tmp")
    val fs = new org.apache.hadoop.fs.Path(sd).getFileSystem(
      spark.sessionState.newHadoopConf())
    val state = new org.apache.hadoop.fs.Path(sd)
    val tmp = new org.apache.hadoop.fs.Path(s"$baseDir/state_tmp")
    val old = new org.apache.hadoop.fs.Path(s"$baseDir/state_old")
    fs.delete(old, true)
    require(fs.rename(state, old), s"compact: could not retire $state")
    require(fs.rename(tmp, state), s"compact: could not install $tmp")
    fs.delete(old, true)
  }
}
