package graft.tools

import graft.operators.Corpus
import graft.streaming.PartitionedBase
import org.apache.spark.sql.functions._

/** Listing-cost curve for the [[PartitionedBase]] per-batchId layout
  * past toy partition counts (r16 verdict #4): the 21-batch
  * [[DedupStateScaleBench]] proved per-batch cost flat at 22
  * partitions; a long-lived deployment between compactions hits
  * hundreds. This probe grows a keeper base to `P` partitions with
  * NEAR-CONSTANT row count (tiny growth batches, so the curve isolates
  * DIRECTORY shape from data volume) and at checkpoint counts measures
  * min-of-3:
  *
  *  - `list`: `PartitionedBase.all` DataFrame construction alone —
  *    partition discovery + the pinned-schema footer read, the pure
  *    listing term every read pays;
  *  - `count`: the cheapest full scan (adds per-file open/footer cost);
  *  - `probe`: the read a real onBatch pays — canonicalize + equi-join
  *    a 25k-doc batch against the keeper table.
  *
  * Then compacts ([[PartitionedBase.migrateFlat]]) and re-measures, so
  * the table ends with the floor the compaction cadence should aim at.
  * Evidence + the derived cadence rule live in SCALE_NOTES.md and on
  * [[PartitionedBase.replace]]'s scaladoc.
  *
  * Run: sbt "runMain graft.tools.DirGrowthProbe" (defaults: 1M base
  * rows, 1k rows/batch, 200 partitions, checkpoints 20/50/100/150/200).
  */
object DirGrowthProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }
  private def min3(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  private def baseUrl(page: org.apache.spark.sql.Column) =
    concat(lit("http://h"), page % 50000L, lit(".example.org/p"), page)

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DIRGROWTH_N", "1000000").toLong
    val perBatch = sys.env.getOrElse("SPARK_GRAFT_DIRGROWTH_PB", "1000").toLong
    val maxP = sys.env.getOrElse("SPARK_GRAFT_DIRGROWTH_P", "200").toInt
    val checkpoints = sys.env.getOrElse("SPARK_GRAFT_DIRGROWTH_CK",
      "1,20,50,100,150,200").split(",").map(_.trim.toInt).toSet
    val spark = graft.sources.Sessions
      .builder(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("dirgrowth").toString +
      "/canon"
    println(s"[dirgrowth] n=$n perBatch=$perBatch maxP=$maxP dir=$dir")

    PartitionedBase.init(spark.range(n).select(
      baseUrl(col("id")).as("canon_url"), col("id").as("base_doc_id")), dir)

    // the probe batch: 25k re-crawls of existing pages, decorated — the
    // equi-join read path every onBatch pays
    val probeBatch = spark.range(25000L).select(
      (col("id") + 10L * n).as("doc_id"),
      concat(lit("HTTP://WWW.h"), col("id") % 50000L,
        lit(".example.org:80/p"), col("id"), lit("?utm_source=z#f"))
        .as("url"))

    def measure(label: String, parts: Int): Unit = {
      val tList = min3 { PartitionedBase.all(spark, dir) }
      val tCount = min3 { PartitionedBase.all(spark, dir).count() }
      val tProbe = min3 {
        Corpus.urlHitsAgainstBase(probeBatch,
          PartitionedBase.before(spark, dir, Long.MaxValue)).count()
      }
      println(f"[dirgrowth] $label%-12s parts=$parts%4d  " +
        f"list=$tList%6.3f s  count=$tCount%6.3f s  probe=$tProbe%6.3f s")
    }

    measure("bootstrap", 1)
    (0 until maxP).foreach { b =>
      PartitionedBase.write(spark.range(perBatch).select(
        baseUrl(lit(n) + lit(b.toLong * perBatch) + col("id")).as("canon_url"),
        (lit(n) + lit(b.toLong * perBatch) + col("id")).as("base_doc_id")),
        dir, b.toLong)
      if (checkpoints.contains(b + 1)) measure("grown", b + 2)
    }

    val tCompact = time(PartitionedBase.migrateFlat(spark, dir))
    println(f"[dirgrowth] compact (migrateFlat)       $tCompact%6.2f s")
    measure("compacted", 1)

    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
