package graft

import graft.operators.TextAnalysis
import graft.streaming.StreamingCdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[StreamingCdc]]: (1) against a static base, any micro-batch
  * replay of the increment emits exactly the batch operator's rows; (2)
  * grow mode carries the CDC edit-survival property across batches —
  * a copy with a prepended edit still matches every chunk after the
  * first post-edit boundary — within-batch copies never pair, and the
  * delivery/growth ledger makes batch replays no-ops; (3) a one-doc-per-
  * batch grow-mode replay of the whole fixture reconstructs exactly the
  * corpus-wide `cdc_dedup` duplicate-digest set. */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(Long, Long, Long, String, Long)] =
    df.select("doc_id", "chunk_idx", "n_toks", "chunk_md5", "base_doc")
      .as[(Long, Long, Long, String, Long)].collect().toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("static base: any micro-batch replay equals the batch operator exactly") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val newDocs = docs.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val baseDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val baseDir = tmp("graft-cdc-base")
    StreamingCdc.initBase(baseDocs, baseDir)

    val got = scala.collection.mutable.Set.empty[(Long, Long, Long, String, Long)]
    val onBatch = StreamingCdc.onBatch(baseDir, growBase = false,
      (m, _) => got ++= rows(m))
    // replay the increment as 3 uneven micro-batches (row-hash split)
    (0 until 3).foreach { b =>
      onBatch(newDocs.filter(pmod(col("doc_id"), lit(97)) % 3 === b), b.toLong)
    }
    val want = rows(TextAnalysis.cdcIncremental(spark, dir))
    assert(want.nonEmpty, "fixture must produce incremental CDC matches")
    assert(got.toSet == want)
  }

  test("grow mode: edit-shifted copies match later; no within-batch pairs; ledger no-ops") {
    // text long enough for several content-defined boundaries
    val body = (1 to 60).map(i => s"tok$i xy$i").mkString(" ")
    val baseDir = tmp("graft-cdc-grow")
    // bootstrap with an unrelated doc so the base exists
    StreamingCdc.initBase(
      Seq((1L, (1 to 30).map(i => s"base$i qq$i").mkString(" ")))
        .toDF("doc_id", "text"), baseDir)

    val batches = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, String, Long)]]
    val onBatch = StreamingCdc.onBatch(baseDir, growBase = true,
      (m, id) => batches(id) = rows(m))

    // batch 0: two exact copies of each other, unrelated to the base —
    // no base match, and the increment-vs-base contract forbids pairing
    // them with each other
    onBatch(Seq((10L, body), (11L, body)).toDF("doc_id", "text"), 0L)
    assert(batches(0L).isEmpty)

    // batch 1: the same text with a PREPENDED edit. Every fixed window
    // would shift; CDC must still match all chunks after the first
    // content boundary — i.e. all but the edited doc's first chunk.
    val edited = "prepended edit tokens " + body
    onBatch(Seq((20L, edited)).toDF("doc_id", "text"), 1L)
    val editedChunks = rows(TextAnalysis.cdcChunksOf(
        Seq((20L, edited)).toDF("doc_id", "text"))
      .withColumn("base_doc", lit(-1L)))
    val bodyDigests = TextAnalysis.cdcChunksOf(
        Seq((0L, body)).toDF("doc_id", "text"))
      .select("chunk_md5").as[String].collect().toSet
    // the exact CDC prediction: matched chunks = the edited doc's chunks
    // whose digest already existed in the body (boundaries past the edit
    // re-align, so that is every chunk after the first post-edit
    // boundary), keeper = doc 10 (smallest grown id)
    val want1 = editedChunks.filter(c => bodyDigests(c._4))
      .map(c => (c._1, c._2, c._3, c._4, 10L))
    val m1 = batches(1L)
    assert(m1 == want1)
    assert(m1.nonEmpty, "edit-shifted copy must match the grown base")
    assert(!m1.exists(_._2 == 1L), "the edited first chunk cannot match")
    assert(m1.size >= editedChunks.size - 2,
      "at most the chunks overlapping the edit may miss")
    val editedCount = editedChunks.size.toLong

    // ledger: replaying batch id 1 neither re-delivers nor re-grows
    batches.remove(1L)
    onBatch(Seq((20L, edited)).toDF("doc_id", "text"), 1L)
    assert(!batches.contains(1L))
    // the replay must not have added doc 20's first chunk twice: a full
    // resend of `edited` as doc 30 matches ALL its chunks exactly once
    onBatch(Seq((30L, edited)).toDF("doc_id", "text"), 2L)
    assert(batches(2L).size == editedCount)
  }

  test("marker-deleted replay: identical re-delivery, identical base") {
    val body = (1 to 60).map(i => s"rep$i ab$i").mkString(" ")
    val baseDir = tmp("graft-cdc-replay")
    StreamingCdc.initBase(
      Seq((1L, (1 to 30).map(i => s"base$i qq$i").mkString(" ")))
        .toDF("doc_id", "text"), baseDir)
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, String, Long)]]
    val onBatch = StreamingCdc.onBatch(baseDir, growBase = true,
      (m, id) => got(id) = rows(m))
    onBatch(Seq((10L, body)).toDF("doc_id", "text"), 0L)
    onBatch(Seq((20L, body)).toDF("doc_id", "text"), 1L) // full match vs 10
    val delivered1 = got(1L)
    assert(delivered1.nonEmpty && delivered1.forall(_._5 == 10L))
    def baseNow(): Set[(String, Long, Int)] =
      spark.read.parquet(s"$baseDir/chunks")
        .select("chunk_md5", "base_doc", "batch")
        .as[(String, Long, Int)].collect().toSet
    val before = baseNow()

    // crash: marker gone; the replay reads batch < 1 so its match set
    // cannot carry the self-hit extras the flat layout documented, and
    // the batch=1 overwrite re-lands the same (empty) fresh set
    val marker = new java.io.File(s"$baseDir/_graft_cdc_ledger/1")
    assert(marker.exists() && marker.delete())
    got.remove(1L)
    onBatch(Seq((20L, body)).toDF("doc_id", "text"), 1L)
    assert(got(1L) == delivered1,
      "re-delivery must be byte-identical (no self-hit extras)")
    assert(baseNow() == before)
  }

  test("grow-mode corpus replay reconstructs cdc_dedup's duplicate-digest set") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val baseDir = tmp("graft-cdc-replay")
    // empty bootstrap: base starts with no digests
    StreamingCdc.initBase(docs.limit(0), baseDir)

    // One doc per micro-batch is the strictest replay, but each batch is
    // a full Spark job against the grown base — the whole-corpus replay
    // is ~500 batches (18+ min, the single largest cost in `sbt test`,
    // r17 VERDICT item 1). The default replays a deterministic ascending
    // prefix; the duplicate-digest identity below is restricted to the
    // same prefix, so the property proven per doc is unchanged. Set
    // GRAFT_FULL_REPLAY=1 for the exhaustive nightly-style run against
    // the registered cdc_dedup query itself.
    val full = sys.env.contains("GRAFT_FULL_REPLAY")
    val allIds = docs.select("doc_id").as[Long].collect().sorted
    val ids = if (full) allIds else allIds.take(120)
    val idSet = ids.toSet
    val replayDocs = docs.filter(col("doc_id").isInCollection(idSet))

    val hitDigests = scala.collection.mutable.Set.empty[String]
    val onBatch = StreamingCdc.onBatch(baseDir, growBase = true,
      (m, _) => hitDigests ++=
        m.select("chunk_md5").as[String].collect())
    ids.zipWithIndex.foreach { case (id, b) =>
      onBatch(replayDocs.filter(col("doc_id") === id), b.toLong)
    }
    // a digest is corpus-duplicate iff it matched the base at least once
    // during the replay, OR some single doc carries it >= 2 times (the
    // within-first-doc repeat the increment-vs-base contract never pairs)
    val chunksS = TextAnalysis.cdcChunks(spark, dir)
      .filter(col("doc_id").isInCollection(idSet))
    val intraDoc = chunksS
      .groupBy("doc_id", "chunk_md5").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2).select("chunk_md5").as[String].collect().toSet
    // cdc_dedup == "count(*) > 1 over cdcChunks" (its definition, oracle-
    // pinned); restricted to the replayed prefix it is exactly this:
    val want =
      if (full) TextAnalysis.cdcDedup(spark, dir)
        .select("chunk_md5").as[String].collect().toSet
      else chunksS.groupBy("chunk_md5").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1L)
        .select("chunk_md5").as[String].collect().toSet
    assert(want.nonEmpty, "replayed prefix must contain duplicate chunks")
    assert((hitDigests.toSet ++ intraDoc) == want)
  }
}
