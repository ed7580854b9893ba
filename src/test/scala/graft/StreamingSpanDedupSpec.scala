package graft

import graft.operators.Dedup
import graft.streaming.StreamingSpanDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity + growth semantics for the streaming span-removal twin.
  *
  * Theorem: a batch doc's cleaned text in
  * [[Dedup.spanCleanAgainstBase]] depends only on (doc, base digest
  * set), so against a STATIC base any micro-batch split of the
  * increment emits exactly [[Dedup.spanDedupIncremental]]'s rows. Grow
  * mode adds the cross-increment Lee-et-al. semantics: a span FIRST
  * seen in batch k survives there but is removed from every later
  * batch that repeats it. */
class StreamingSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Long, Long, String)] =
    df.select("doc_id", "n_tokens", "kept_tokens", "clean_md5")
      .as[(Long, Long, Long, String)].collect().toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("static base: any micro-batch replay equals the batch operator exactly") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.documents(spark, dir)
    val newDocs = docs.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val baseDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val baseDir = tmp("graft-span-base")
    StreamingSpanDedup.initBase(baseDocs, baseDir)

    val got = scala.collection.mutable.Set.empty[(Long, Long, Long, String)]
    val onBatch = StreamingSpanDedup.onBatch(baseDir, growBase = false,
      (cleaned, _) => got ++= rows(cleaned))
    (0 until 3).foreach { b =>
      onBatch(newDocs.filter(pmod(col("doc_id"), lit(97)) % 3 === b), b.toLong)
    }
    val want = rows(Dedup.spanDedupIncremental(spark, dir))
    assert(want.nonEmpty && want.exists(r => r._3 < r._2),
      "fixture increment must actually lose spans to the base")
    assert(got.toSet == want)
  }

  test("grow mode: a span first seen in batch k is removed from later batches") {
    val baseDir = tmp("graft-span-grow")
    StreamingSpanDedup.initBase(
      Seq((1L, "base only words that overlap nothing in the batches at all"))
        .toDF("doc_id", "text"), baseDir)
    val novel = (1 to 15).map(i => f"nov$i%02d").mkString(" ") // 15 tokens
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long, String)]]
    val onBatch = StreamingSpanDedup.onBatch(baseDir, growBase = true,
      (cleaned, id) => got(id) = rows(cleaned))
    onBatch(Seq((10L, novel)).toDF("doc_id", "text"), 0L)
    onBatch(Seq((20L, novel)).toDF("doc_id", "text"), 1L)
    // batch 0: no base overlap -> everything kept
    assert(got(0L).head == ((10L, 15L, 15L,
      java.security.MessageDigest.getInstance("MD5")
        .digest(novel.getBytes("UTF-8")).map("%02x".format(_)).mkString)))
    // batch 1: every 10-token window of the same text is now in the base
    // -> every position covered, cleaned text empty
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    assert(got(1L).head == ((20L, 15L, 0L, emptyMd5)))
  }

  test("replaying a batch id is a no-op (ledger guards delivery and growth)") {
    val baseDir = tmp("graft-span-ledger")
    StreamingSpanDedup.initBase(
      Seq((1L, "unrelated base text")).toDF("doc_id", "text"), baseDir)
    val novel = (1 to 12).map(i => f"led$i%02d").mkString(" ")
    var calls = 0
    val onBatch = StreamingSpanDedup.onBatch(baseDir, growBase = true,
      (_, _) => calls += 1)
    onBatch(Seq((10L, novel)).toDF("doc_id", "text"), 0L)
    onBatch(Seq((10L, novel)).toDF("doc_id", "text"), 0L) // replay
    assert(calls == 1, "replayed batch id must not deliver or grow again")
    // and the base grew exactly once: the novel text's 3 windows
    assert(spark.read.parquet(s"$baseDir/spans").count() ==
      spark.read.parquet(s"$baseDir/spans").distinct().count())
  }

  test("marker-deleted replay: identical re-delivery, identical base") {
    val baseDir = tmp("graft-span-replay")
    val novel = (1 to 15).map(i => f"rep$i%02d").mkString(" ")
    StreamingSpanDedup.initBase(
      Seq((1L, "short base")).toDF("doc_id", "text"), baseDir)
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long, String)]]
    val onBatch = StreamingSpanDedup.onBatch(baseDir, growBase = true,
      (cleaned, id) => got(id) = rows(cleaned))
    onBatch(Seq((10L, novel)).toDF("doc_id", "text"), 0L)
    onBatch(Seq((20L, novel)).toDF("doc_id", "text"), 1L) // fully covered
    val delivered1 = got(1L)
    assert(delivered1.head._3 == 0L, s"batch 1 must be fully cleaned: $delivered1")
    def baseNow(): Set[(String, Int)] =
      spark.read.parquet(s"$baseDir/spans").select("h", "batch")
        .as[(String, Int)].collect().toSet
    val before = baseNow()

    // crash: marker gone; the replay reads batch < 1 (same digest set as
    // the first attempt) and overwrites batch=1 (here: the empty novel
    // set — doc 20's windows were all first seen in batch 0)
    val marker = new java.io.File(s"$baseDir/_graft_spandedup_ledger/1")
    assert(marker.exists() && marker.delete())
    got.remove(1L)
    onBatch(Seq((20L, novel)).toDF("doc_id", "text"), 1L)
    assert(got(1L) == delivered1)
    assert(baseNow() == before)
  }
}
