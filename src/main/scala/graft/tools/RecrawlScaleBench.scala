package graft.tools

import graft.operators.Crawl
import graft.streaming.StreamingRecrawl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recrawl scheduler at STATE scale (r14 verdict #7): drive
  * [[StreamingRecrawl]] at 1M pages across 20+ micro-batches, including
  * a mid-write crash replay and an offline compaction cycle, and report
  *  - per-batch onBatch latency as the partial-state table grows,
  *  - schedule-read latency BEFORE vs AFTER compaction,
  *  - byte-exactness: the final schedule vs the batch operator
  *    ([[Crawl.recrawlFrom]]) on the union of everything fed, vs itself
  *    across the crash replay, vs itself across compaction.
  *
  * Workload: bootstrap fetch of all N pages, then B batches each
  * touching the 20% page slice `page % 5 == b % 5` (ts monotone across
  * batches — the in-order contract a crawl log satisfies); signatures
  * flip every 4th visit of a page, so boundary comparisons land on real
  * cross-batch changes.
  *
  * Run: SPARK_GRAFT_RECRAWL_N=1000000 SPARK_GRAFT_RECRAWL_B=20 \
  *   sbt "runMain graft.tools.RecrawlScaleBench"  */
object RecrawlScaleBench {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Order-free content checksum of a schedule frame (bit_xor combine —
    * sum would overflow Long under ANSI at 1M 64-bit hashes). */
  private def checksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(df.columns.map(col): _*)), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def batchLog(spark: SparkSession, n: Long, b: Long): DataFrame =
    spark.range(n).filter(col("id") % 5L === b % 5L)
      .select(col("id").as("page"),
        // a page's signature advances every 4th batch, so boundary
        // comparisons land on real cross-batch changes (batch 0 matches
        // the bootstrap signature; batches 4, 8, ... flip it)
        ((lit(b / 4L) + (col("id") % 7L)) % 3L).as("sig"),
        (lit(1000L) + lit(b)).as("ts_sec"),
        (lit(b + 1L) * n + col("id")).as("event_id"))

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_RECRAWL_N", "1000000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_RECRAWL_B", "20").toInt
    val spark = graft.sources.Sessions
      .builder(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("recrawl_scale").toString
    println(s"[recrawl-scale] n=$n batches=$nBatches base=$base")

    val boot = spark.range(n).select(col("id").as("page"),
      (col("id") % 7L % 3L).as("sig"), lit(0L).as("ts_sec"),
      col("id").as("event_id"))
    val (_, tInit) = time(StreamingRecrawl.initBase(boot, base))
    println(f"[recrawl-scale] initBase ($n%d pages)           ${tInit}%7.2f s")

    val body = StreamingRecrawl.onBatch(base, (sched, _) => sched.count(): Unit)
    val perBatch = (0 until nBatches).map { b =>
      val (_, t) = time(body(batchLog(spark, n, b.toLong), b.toLong))
      if (b % 5 == 0 || b == nBatches - 1)
        println(f"[recrawl-scale] batch $b%2d onBatch+schedule     $t%7.2f s")
      t
    }
    println(f"[recrawl-scale] per-batch sec first->last: " +
      f"${perBatch.head}%.2f -> ${perBatch.last}%.2f " +
      f"(mean ${perBatch.sum / perBatch.size}%.2f)")

    // schedule-read latency BEFORE compaction (min of 3)
    def readLatency(): Double =
      (1 to 3).map { _ =>
        time(StreamingRecrawl.schedule(spark, base).count())._2
      }.min
    val before = checksum(StreamingRecrawl.schedule(spark, base))
    val latBefore = readLatency()
    println(f"[recrawl-scale] schedule read pre-compact  $latBefore%7.2f s " +
      s"rows=${before._1}")

    // mid-write crash replay of the LAST batch: marker gone, junk part
    // file left in its partition — replay must restore byte-exactness
    val last = (nBatches - 1).toLong
    val marker = new java.io.File(s"$base/_graft_recrawl_ledger/$last")
    require(marker.delete(), s"missing marker $marker")
    val junk = new java.io.File(s"$base/state/batch=$last/part-crashed.parquet")
    java.nio.file.Files.write(junk.toPath, "not parquet".getBytes("UTF-8"))
    val (_, tReplay) = time(body(batchLog(spark, n, last), last))
    require(!junk.exists(), "replay must overwrite the crashed partition")
    val afterReplay = checksum(StreamingRecrawl.schedule(spark, base))
    require(afterReplay == before,
      s"crash replay changed the schedule: $before -> $afterReplay")
    println(f"[recrawl-scale] mid-write crash replay     $tReplay%7.2f s " +
      "(schedule byte-identical)")

    // offline compaction of everything but the last 4 batches
    val (_, tCompact) =
      time(StreamingRecrawl.compact(spark, base, (nBatches - 5).toLong))
    val afterCompact = checksum(StreamingRecrawl.schedule(spark, base))
    require(afterCompact == before,
      s"compaction changed the schedule: $before -> $afterCompact")
    val latAfter = readLatency()
    println(f"[recrawl-scale] compact(<=${nBatches - 5}%d)            $tCompact%7.2f s")
    println(f"[recrawl-scale] schedule read post-compact $latAfter%7.2f s " +
      f"(${latBefore / latAfter}%.2fx faster)")

    // a batch fed AFTER compaction still merges, and the final state
    // equals the batch operator on the union of everything fed
    val extra = batchLog(spark, n, nBatches.toLong)
    val (_, tPost) = time(body(extra, nBatches.toLong))
    println(f"[recrawl-scale] post-compact batch         $tPost%7.2f s")
    val all = (0 to nBatches).map(b => batchLog(spark, n, b.toLong))
      .foldLeft(boot)(_ unionAll _)
    val want = checksum(Crawl.recrawlFrom(all))
    val got = checksum(StreamingRecrawl.schedule(spark, base))
    require(got == want, s"final parity broke: batch=$want stream=$got")
    println(s"[recrawl-scale] final parity vs batch operator: OK " +
      s"(rows=${got._1}, checksum=${got._2})")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
