package graft

import graft.operators.Corpus
import graft.streaming.StreamingUrlDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity + growth semantics for the streaming canonical-URL dedup twin.
  *
  * The load-bearing theorem: against a STATIC base, each doc's verdict
  * in [[Corpus.urlHitsAgainstBase]] depends only on (doc, base), so ANY
  * micro-batch split of the increment must emit exactly the batch
  * operator's rows. Grow mode adds the production semantics the batch
  * operator can't express: later increments dedup against earlier
  * survivors — and because hits join on the CANONICAL string, a re-crawl
  * under a different decoration of a grown URL still hits its keeper. */
class StreamingUrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def hitRows(df: DataFrame): Set[(Long, Long, String)] =
    df.select("doc_id", "base_doc_id", "canon_url")
      .as[(Long, Long, String)].collect().toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("static base: any micro-batch replay equals the batch operator exactly") {
    val urls = Corpus.rawUrls(graft.sources.Tables.documents(spark, dir))
    val newUrls = urls.filter(col("doc_id") % 10 === 1)
    val baseDir = tmp("graft-url-base")
    StreamingUrlDedup.initBase(urls.filter(col("doc_id") % 10 =!= 1), baseDir)

    val got = scala.collection.mutable.Set.empty[(Long, Long, String)]
    val onBatch = StreamingUrlDedup.onBatch(baseDir, growBase = false,
      (hits, _) => got ++= hitRows(hits))
    // replay the increment as 3 uneven micro-batches (row-hash split)
    (0 until 3).foreach { b =>
      onBatch(newUrls.filter(pmod(col("doc_id"), lit(97)) % 3 === b), b.toLong)
    }
    val want = hitRows(Corpus.urlDedupIncremental(spark, dir))
    assert(want.nonEmpty, "fixture must produce URL hits")
    assert(got.toSet == want)
  }

  test("grow mode: later decorations hit earlier survivors; ledger replay skipped") {
    val baseDir = tmp("graft-url-grow")
    StreamingUrlDedup.initBase(
      Seq((1L, "http://example.com/a?x=1")).toDF("doc_id", "url"), baseDir)

    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, String)]]
    val onBatch = StreamingUrlDedup.onBatch(baseDir, growBase = true,
      (hits, id) => got(id) = hitRows(hits))

    // batch 0: a DIFFERENT decoration of the base URL (must hit through
    // canonicalization), plus two decorations of a NEW page (not paired
    // with each other; one keeper enters the base)
    onBatch(Seq(
      (10L, "HTTP://WWW.example.com:80/a?utm_source=z&x=1#f"),
      (11L, "http://example.com/b/?y=2&z=3"),
      (12L, "http://EXAMPLE.com/b?z=3&y=2&gclid=q")).toDF("doc_id", "url"), 0L)
    assert(got(0L) == Set((10L, 1L, "http://example.com/a?x=1")),
      s"within-batch copies must not pair against each other: ${got(0L)}")

    // batch 1: a third decoration of the new page must hit keeper 11 in
    // the GROWN base
    onBatch(Seq((20L, "https://example.com/b?y=2&z=3"),       // https: distinct
                (21L, "http://www.example.com/b?y=2&z=3")).toDF("doc_id", "url"), 1L)
    assert(got(1L) == Set((21L, 11L, "http://example.com/b?y=2&z=3")),
      s"grown keeper must catch later decorations, https must NOT: ${got(1L)}")

    // batch 2 replayed under batch 1's id: ledger skips it entirely
    onBatch(Seq((30L, "http://example.com/b?y=2&z=3")).toDF("doc_id", "url"), 1L)
    assert(got(1L).forall(_._1 != 30L), "replayed batch id must be skipped")
    // and the skipped batch grew nothing: doc 30's url still hits 11
    val onBatch2 = StreamingUrlDedup.onBatch(baseDir, growBase = false,
      (hits, id) => got(id) = hitRows(hits))
    onBatch2(Seq((40L, "http://example.com/b?y=2&z=3")).toDF("doc_id", "url"), 5L)
    assert(got(5L) == Set((40L, 11L, "http://example.com/b?y=2&z=3")))
  }

  test("marker-deleted replay: identical re-delivery, identical base, even mid-write") {
    val baseDir = tmp("graft-url-replay")
    StreamingUrlDedup.initBase(
      Seq((1L, "http://example.com/a?x=1")).toDF("doc_id", "url"), baseDir)
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, String)]]
    val onBatch = StreamingUrlDedup.onBatch(baseDir, growBase = true,
      (hits, id) => got(id) = hitRows(hits))
    onBatch(Seq((10L, "http://example.com/c?p=1")).toDF("doc_id", "url"), 0L)
    onBatch(Seq((20L, "http://EXAMPLE.com/c?p=1&utm_source=z"), // hits keeper 10
                (21L, "http://example.com/d")).toDF("doc_id", "url"), 1L)
    val delivered1 = got(1L)
    assert(delivered1 == Set((20L, 10L, "http://example.com/c?p=1")))
    def baseNow(): Set[(String, Long, Int)] =
      spark.read.parquet(s"$baseDir/canon")
        .select("canon_url", "base_doc_id", "batch")
        .as[(String, Long, Int)].collect().toSet
    val baseBefore = baseNow()
    assert(baseBefore.exists(r => r._2 == 21L && r._3 == 1),
      s"doc 21 must have grown into the batch=1 partition: $baseBefore")

    // crash simulation: the marker never landed AND the crashed attempt
    // left a partial part file in the batch's own partition
    val marker = new java.io.File(s"$baseDir/_graft_url_ledger/1")
    assert(marker.exists() && marker.delete())
    val junk = new java.io.File(s"$baseDir/canon/batch=1/part-crashed.parquet")
    java.nio.file.Files.write(junk.toPath,
      "not a parquet file".getBytes("UTF-8"))
    got.remove(1L)
    onBatch(Seq((20L, "http://EXAMPLE.com/c?p=1&utm_source=z"),
                (21L, "http://example.com/d")).toDF("doc_id", "url"), 1L)
    // byte-identical re-delivery: the replay read batch < 1, so it could
    // NOT see its own crashed growth (no self-hit rows)
    assert(got(1L) == delivered1)
    // the overwrite cleared the partial file and re-landed the same rows
    assert(!junk.exists(), "replay must overwrite the crashed partition")
    assert(baseNow() == baseBefore)
    // and the grown base still serves later batches exactly once
    onBatch(Seq((30L, "http://example.com/d?gclid=x")).toDF("doc_id", "url"), 2L)
    assert(got(2L) == Set((30L, 21L, "http://example.com/d")))
  }
}
