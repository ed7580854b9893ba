package graft.tools

import graft.operators.Corpus
import graft.streaming.{PartitionedBase, StreamingUrlDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PARTITIONED dedup twin at state scale (r15 verdict #4) — the
  * [[RecrawlScaleBench]] treatment for the per-batchId overwrite
  * layout's new cost, DIRECTORY growth: drive [[StreamingUrlDedup]] at
  * 1M base pages across 20+ micro-batches and report
  *  - per-batch onBatch latency as `canon/` accumulates one partition
  *    per batch (the layout's growth axis),
  *  - base-probe latency BEFORE vs AFTER compaction
  *    ([[PartitionedBase.migrateFlat]] doubles as the compactor),
  *  - byte-exactness: hits across a mid-write crash replay (marker
  *    deleted, junk part file left in the batch's own partition), the
  *    base across the replay, the probe across compaction, and the
  *    final keeper table vs an independently CONSTRUCTED expectation
  *    (every novel URL is novel by construction, so the exact final
  *    keeper set is known in closed form).
  *
  * Workload per batch: 50k docs — half re-crawls of existing pages
  * under tracking-decorated URLs (`HTTP://WWW.h<k>...:80/p<n>?utm_...#f`
  * canonicalizes back to the base form: exact hits), half novel pages
  * (base growth), so every batch exercises both the probe and the
  * overwrite path.
  *
  * Run: SPARK_GRAFT_URLDEDUP_N=1000000 SPARK_GRAFT_URLDEDUP_B=21 \
  *   sbt "runMain graft.tools.DedupStateScaleBench" */
object DedupStateScaleBench {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Order-free content checksum (bit_xor combine — a Long sum overflows
    * under ANSI at 1M 64-bit hashes; same recipe as RecrawlScaleBench). */
  private def checksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(df.columns.map(col): _*)), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def baseUrl(page: org.apache.spark.sql.Column) =
    concat(lit("http://h"), page % 50000L, lit(".example.org/p"), page)

  /** Batch b: even rows re-crawl page (b*37 + i) % n decorated; odd rows
    * introduce the novel page n + b*25000 + (i-1)/2. */
  private def batch(spark: SparkSession, n: Long, b: Long,
      perBatch: Long): DataFrame = {
    val hitPage = (lit(b * 37L) + col("id")) % n
    val novelPage = lit(n + b * (perBatch / 2)) + (col("id") - 1L) / 2L
    spark.range(perBatch).select(
      (lit((b + 1L) * n) + col("id")).as("doc_id"),
      when(col("id") % 2L === 0L,
        concat(lit("HTTP://WWW.h"), hitPage % 50000L,
          lit(".example.org:80/p"), hitPage, lit("?utm_source=z#f")))
        .otherwise(baseUrl(novelPage)).as("url"))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_URLDEDUP_N", "1000000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_URLDEDUP_B", "21").toInt
    val perBatch = 50000L
    val spark = graft.sources.Sessions
      .builder(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("urldedup_scale").toString
    println(s"[urldedup-scale] n=$n batches=$nBatches base=$base")

    val boot = spark.range(n).select(col("id").as("doc_id"),
      baseUrl(col("id")).as("url"))
    val (_, tInit) = time(StreamingUrlDedup.initBase(boot, base))
    println(f"[urldedup-scale] initBase ($n%d urls)            $tInit%7.2f s")

    val hitSums = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val body = StreamingUrlDedup.onBatch(base, growBase = true,
      (hits, id) => { hitSums(id) = checksum(hits.select(
        col("doc_id"), col("base_doc_id"), col("canon_url"))) })
    val perBatchSec = (0 until nBatches).map { b =>
      val (_, t) = time(body(batch(spark, n, b.toLong, perBatch), b.toLong))
      require(hitSums(b.toLong)._1 == perBatch / 2,
        s"batch $b expected ${perBatch / 2} hits, got ${hitSums(b.toLong)._1}")
      if (b % 5 == 0 || b == nBatches - 1)
        println(f"[urldedup-scale] batch $b%2d onBatch (probe+grow) $t%7.2f s " +
          s"hits=${hitSums(b.toLong)._1}")
      t
    }
    println(f"[urldedup-scale] per-batch sec first->last: " +
      f"${perBatchSec.head}%.2f -> ${perBatchSec.last}%.2f " +
      f"(mean ${perBatchSec.sum / perBatchSec.size}%.2f, " +
      f"${nBatches + 1}%d partitions at the end)")

    // base-probe latency against the fully-grown layout (min of 3):
    // the read every onBatch pays — canonicalize + equi-join the keeper
    // table across all partitions
    val probe = batch(spark, n, nBatches.toLong, perBatch)
    def probeLatency(): Double =
      (1 to 3).map { _ =>
        time(Corpus.urlHitsAgainstBase(probe, PartitionedBase.before(
          spark, s"$base/canon", Long.MaxValue)).count())._2
      }.min
    val probeBefore = checksum(Corpus.urlHitsAgainstBase(probe,
      PartitionedBase.before(spark, s"$base/canon", Long.MaxValue)))
    val latBefore = probeLatency()
    println(f"[urldedup-scale] probe pre-compact          $latBefore%7.2f s " +
      s"rows=${probeBefore._1}")

    // mid-write crash replay of the LAST batch: marker gone, junk part
    // file left in its partition — replay must deliver identical hits
    // and restore an identical base
    val last = (nBatches - 1).toLong
    val baseSum = checksum(PartitionedBase.all(spark, s"$base/canon"))
    val wantHits = hitSums(last)
    val marker = new java.io.File(s"$base/_graft_url_ledger/$last")
    require(marker.delete(), s"missing marker $marker")
    val junk = new java.io.File(s"$base/canon/batch=$last/part-crashed.parquet")
    java.nio.file.Files.write(junk.toPath, "not parquet".getBytes("UTF-8"))
    hitSums.remove(last)
    val (_, tReplay) = time(body(batch(spark, n, last, perBatch), last))
    require(!junk.exists(), "replay must overwrite the crashed partition")
    require(hitSums(last) == wantHits,
      s"replayed hits diverged: $wantHits -> ${hitSums(last)}")
    val baseAfterReplay = checksum(PartitionedBase.all(spark, s"$base/canon"))
    require(baseAfterReplay == baseSum,
      s"crash replay changed the base: $baseSum -> $baseAfterReplay")
    println(f"[urldedup-scale] mid-write crash replay     $tReplay%7.2f s " +
      "(hits + base byte-identical)")

    // offline compaction: roll every partition into batch=-1
    val (_, tCompact) =
      time(PartitionedBase.migrateFlat(spark, s"$base/canon"))
    val probeAfter = checksum(Corpus.urlHitsAgainstBase(probe,
      PartitionedBase.before(spark, s"$base/canon", Long.MaxValue)))
    require(probeAfter == probeBefore,
      s"compaction changed the probe: $probeBefore -> $probeAfter")
    val latAfter = probeLatency()
    println(f"[urldedup-scale] compact (migrateFlat)      $tCompact%7.2f s")
    println(f"[urldedup-scale] probe post-compact         $latAfter%7.2f s " +
      f"(${latBefore / latAfter}%.2fx)")

    // a batch fed AFTER compaction still probes + grows, and the final
    // keeper table equals the closed-form expectation
    val (_, tPost) = time(body(batch(spark, n, nBatches.toLong, perBatch),
      nBatches.toLong))
    println(f"[urldedup-scale] post-compact batch         $tPost%7.2f s")
    val novelTotal = (nBatches + 1) * (perBatch / 2)
    val expect = boot.select(col("url").as("canon_url"),
        col("doc_id").as("base_doc_id"))
      .unionAll(spark.range(0L, nBatches + 1L).toDF("b")
        .join(spark.range(perBatch).toDF("id"), col("id") % 2L === 1L)
        .select(
          baseUrl(lit(n) + col("b") * (perBatch / 2) + (col("id") - 1L) / 2L)
            .as("canon_url"),
          ((col("b") + 1L) * n + col("id")).as("base_doc_id")))
    val want = checksum(expect.select("canon_url", "base_doc_id"))
    val got = checksum(PartitionedBase.all(spark, s"$base/canon")
      .select("canon_url", "base_doc_id"))
    require(got == want, s"final keeper parity broke: want=$want got=$got")
    println(s"[urldedup-scale] final keeper parity: OK (rows=${got._1} = " +
      s"$n base + $novelTotal novel, checksum=${got._2})")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
