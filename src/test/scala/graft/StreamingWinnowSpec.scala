package graft

import graft.operators.TextAnalysis
import graft.streaming.StreamingWinnow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[StreamingWinnow]]: (1) against a static base, any micro-batch
  * replay of the increment emits exactly the batch operator's rows; (2)
  * grow mode lets later batches match earlier ones, within-batch copies
  * never pair, and the delivery/growth ledger makes batch replays no-ops.
  */
class StreamingWinnowSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("batch_doc", "base_doc", "common", "cover")
      .as[(Long, Long, Long, Double)].collect().toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("static base: any micro-batch replay equals the batch operator exactly") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val newDocs = docs.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val baseDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val baseDir = tmp("graft-winnow-base")
    StreamingWinnow.initBase(baseDocs, baseDir)

    val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Double)]
    val onBatch = StreamingWinnow.onBatch(baseDir, growBase = false,
      (m, _) => got ++= rows(m))
    // replay the increment as 3 uneven micro-batches (row-hash split)
    (0 until 3).foreach { b =>
      onBatch(newDocs.filter(pmod(col("doc_id"), lit(97)) % 3 === b), b.toLong)
    }
    val want = rows(TextAnalysis.winnowIncremental(spark, dir))
    assert(want.nonEmpty, "fixture must produce incremental matches")
    assert(got.toSet == want)
  }

  test("grow mode: later batches hit earlier ones; no within-batch pairs; ledger no-ops") {
    val base = (1 to 40).map(i => s"tok$i xy$i").mkString(" ")
    val baseDir = tmp("graft-winnow-grow")
    StreamingWinnow.initBase(Seq((1L, base)).toDF("doc_id", "text"), baseDir)

    val batches = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, Double)]]
    val onBatch = StreamingWinnow.onBatch(baseDir, growBase = true,
      (m, id) => batches(id) = rows(m))

    // batch 0: two exact copies of each other, unrelated to the base doc —
    // no base match, and the increment-vs-base contract forbids pairing
    // them with each other
    val u = (1 to 40).map(i => s"new$i zz$i").mkString(" ")
    onBatch(Seq((10L, u), (11L, u)).toDF("doc_id", "text"), 0L)
    assert(batches(0L).isEmpty)

    // batch 1: a copy of doc 10 matches BOTH grown-in copies, full cover
    onBatch(Seq((20L, u)).toDF("doc_id", "text"), 1L)
    assert(batches(1L).map(_._2) == Set(10L, 11L))
    batches(1L).foreach { case (b, _, _, cover) =>
      assert(b == 20L && cover == 1.0)
    }

    // ledger: replaying batch id 1 neither re-delivers nor re-grows
    batches.remove(1L)
    onBatch(Seq((20L, u)).toDF("doc_id", "text"), 1L)
    assert(!batches.contains(1L))
    onBatch(Seq((30L, u)).toDF("doc_id", "text"), 2L)
    assert(batches(2L).map(_._2) == Set(10L, 11L, 20L),
      "doc 20 must be in the base exactly once after the replayed batch")
  }

  test("marker-deleted replay: identical re-delivery, identical base") {
    val u = (1 to 40).map(i => s"rp$i kk$i").mkString(" ")
    val baseDir = tmp("graft-winnow-replay")
    StreamingWinnow.initBase(Seq((1L, u)).toDF("doc_id", "text"), baseDir)
    val batches = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, Double)]]
    val onBatch = StreamingWinnow.onBatch(baseDir, growBase = true,
      (m, id) => batches(id) = rows(m))
    onBatch(Seq((10L, u)).toDF("doc_id", "text"), 0L)
    onBatch(Seq((20L, u)).toDF("doc_id", "text"), 1L)
    val delivered1 = batches(1L)
    assert(delivered1.map(_._2) == Set(1L, 10L))
    def baseNow(): Set[(Long, String, Int)] =
      spark.read.parquet(s"$baseDir/fps").select("doc_id", "fp", "batch")
        .as[(Long, String, Int)].collect().toSet
    val before = baseNow()
    assert(before.exists(r => r._1 == 20L && r._3 == 1),
      "doc 20's fingerprints must live in the batch=1 partition")

    // crash: marker gone; replay matches against batch < 1 (doc 20's own
    // prints invisible) and overwrites fps/batch=1 with the same rows
    val marker = new java.io.File(s"$baseDir/_graft_winnow_ledger/1")
    assert(marker.exists() && marker.delete())
    batches.remove(1L)
    onBatch(Seq((20L, u)).toDF("doc_id", "text"), 1L)
    assert(batches(1L) == delivered1)
    assert(baseNow() == before)
  }
}
