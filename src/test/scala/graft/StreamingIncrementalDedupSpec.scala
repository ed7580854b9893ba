package graft

import graft.operators.Dedup
import graft.streaming.StreamingIncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Parity + growth semantics for the streaming incremental-dedup twin.
  *
  * The load-bearing theorem: against a STATIC base, each document's
  * verdict in [[Dedup.hitsAgainstBase]] depends only on (doc, base), so
  * ANY micro-batch split of the increment must emit exactly the batch
  * operator's rows. Grow mode then adds the production semantics the
  * batch operator can't express: later increments dedup against earlier
  * survivors. */
class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def hitRows(df: DataFrame): Set[(Long, Long, String, Double)] =
    df.select("doc_id", "base_doc_id", "kind", "jaccard")
      .as[(Long, Long, String, Double)].collect().toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("static base: any micro-batch replay equals the batch operator exactly") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val newDocs = docs.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val baseDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val baseDir = tmp("graft-incr-base")
    StreamingIncrementalDedup.initBase(baseDocs, baseDir)

    val got = scala.collection.mutable.Set.empty[(Long, Long, String, Double)]
    val onBatch = StreamingIncrementalDedup.onBatch(baseDir, growBase = false,
      (hits, _) => got ++= hitRows(hits))
    // replay the increment as 3 uneven micro-batches (row-hash split)
    (0 until 3).foreach { b =>
      onBatch(newDocs.filter(pmod(col("doc_id"), lit(97)) % 3 === b), b.toLong)
    }
    val want = hitRows(Dedup.incrementalDedup(spark, dir))
    assert(want.nonEmpty && want.exists(_._3 == "near"),
      "fixture must exercise both exact and near hits")
    assert(got.toSet == want)
  }

  test("grow mode: later batches hit earlier survivors; within-batch copies collapse") {
    val baseDir = tmp("graft-incr-grow")
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // 30 distinct tokens: one mid-token substitution keeps Jaccard at
    // 25/31 ~ 0.806, just over the 0.8 near-dup threshold
    val text2 = (1 to 30).map(i => f"tok$i%02d").mkString(" ")
    StreamingIncrementalDedup.initBase(
      Seq((1L, text1)).toDF("doc_id", "text"), baseDir)

    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, String, Double)]]
    val onBatch = StreamingIncrementalDedup.onBatch(baseDir, growBase = true,
      (hits, id) => got(id) = hitRows(hits))

    // batch 0: one exact copy of the base doc, two copies of a NEW text
    // (not paired with each other; one keeper enters the base)
    onBatch(Seq((10L, text1), (11L, text2), (12L, text2)).toDF("doc_id", "text"), 0L)
    assert(got(0L) == Set((10L, 1L, "exact", 1.0)),
      "within-batch copies must not pair against each other")

    // batch 1: an exact copy and a near-dup (one word changed) of batch
    // 0's surviving text — both must hit keeper 11 in the GROWN base
    val near2 = text2.replace("tok15", "zzz")
    onBatch(Seq((20L, text2), (21L, near2)).toDF("doc_id", "text"), 1L)
    assert(got(1L).contains((20L, 11L, "exact", 1.0)))
    val nearHit = got(1L).find(_._1 == 21L)
    assert(nearHit.exists(h => h._2 == 11L && h._3 == "near" && h._4 >= 0.8),
      s"near-dup of a grown survivor must hit it: ${got(1L)}")

    // batch 2 replayed under batch 1's id: ledger skips it entirely
    onBatch(Seq((30L, text2)).toDF("doc_id", "text"), 1L)
    assert(got(1L).forall(_._1 != 30L), "replayed batch id must be skipped")
    // and the skipped batch grew nothing: doc 30's text still hits 11
    onBatch(Seq((31L, text2)).toDF("doc_id", "text"), 2L)
    assert(got(2L) == Set((31L, 11L, "exact", 1.0)))
  }

  test("marker-deleted replay: identical re-delivery, identical base") {
    val baseDir = tmp("graft-incr-replay")
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val text2 = (1 to 30).map(i => f"tok$i%02d").mkString(" ")
    StreamingIncrementalDedup.initBase(
      Seq((1L, text1)).toDF("doc_id", "text"), baseDir)
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, String, Double)]]
    val onBatch = StreamingIncrementalDedup.onBatch(baseDir, growBase = true,
      (hits, id) => got(id) = hitRows(hits))
    onBatch(Seq((10L, text2)).toDF("doc_id", "text"), 0L)
    onBatch(Seq((20L, text2), (21L, "fully novel words here")).toDF("doc_id", "text"), 1L)
    val delivered1 = got(1L)
    assert(delivered1 == Set((20L, 10L, "exact", 1.0)))
    def baseNow(): (Set[(String, Long, Int)], Long) = (
      spark.read.parquet(s"$baseDir/digests")
        .select("fp", "base_doc_id", "batch")
        .as[(String, Long, Int)].collect().toSet,
      spark.read.parquet(s"$baseDir/shingles").count())
    val before = baseNow()
    assert(before._1.exists(r => r._2 == 21L && r._3 == 1),
      s"doc 21 must have grown into the batch=1 partition: ${before._1}")

    // crash: marker gone, replay the whole body — the replay reads
    // batch < 1 (cannot exact-hit its own crashed growth) and overwrites
    // its own partitions (no duplicate digest/shingle rows)
    val marker = new java.io.File(s"$baseDir/_graft_dedup_ledger/1")
    assert(marker.exists() && marker.delete())
    got.remove(1L)
    onBatch(Seq((20L, text2), (21L, "fully novel words here")).toDF("doc_id", "text"), 1L)
    assert(got(1L) == delivered1)
    assert(baseNow() == before)
  }

  test("end-to-end streaming query over a MemoryStream") {
    val baseDir = tmp("graft-incr-stream")
    val ckpt = tmp("graft-incr-ckpt")
    val textA = "red orange yellow green blue indigo violet ultraviolet infrared gamma"
    StreamingIncrementalDedup.initBase(
      Seq((1L, textA)).toDF("doc_id", "text"), baseDir)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, String, Double)]
    val q = StreamingIncrementalDedup.start(
      ms.toDS().toDF("doc_id", "text"), baseDir, ckpt, triggerMs = 50L,
      growBase = true, (hits, _) => got.synchronized { got ++= hitRows(hits) })
    try {
      ms.addData((10L, textA), (11L, "totally different words entirely"))
      q.processAllAvailable()
      ms.addData((20L, "totally different words entirely"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == Set(
      (10L, 1L, "exact", 1.0), // vs the bootstrap base
      (20L, 11L, "exact", 1.0))) // vs batch 0's survivor
  }
}
