package graft

import graft.operators.Similarity
import graft.tools.ForgetRun
import graft.streaming.{PartitionedBase, StreamingCdc, StreamingCrossmodal,
  StreamingEmbeddingDedup, StreamingIncrementalDedup, StreamingRecrawl,
  StreamingSpanDedup, StreamingUrlDedup, StreamingWinnow}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operational RTBF runner ([[ForgetRun]]), r16 verdict #3: the
  * guards must REFUSE (and rewrite nothing) while a stream looks live,
  * and a full pass over all eight base families must report the
  * before/after accounting and leave no trace of the killed keys. */
class ForgetRunSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val tB = "one two three four five six seven eight nine ten eleven"
  private val tC = "red green blue cyan magenta yellow black white gray pink"

  private def docs: DataFrame =
    Seq(1L -> tA, 2L -> tB, 3L -> tC, 5L -> tA).toDF("doc_id", "text")
  private def urls: DataFrame = Seq(
    1L -> "http://example.com/a?x=1",
    2L -> "http://example.com/b?y=2",
    5L -> "HTTP://WWW.example.com:80/a?utm_source=z&x=1#f")
    .toDF("doc_id", "url")

  /** All eight families under one root, per the ForgetRun layout. */
  private def buildRoot(): String = {
    val root = tmp("graft-forgetrun")
    StreamingIncrementalDedup.initBase(docs, s"$root/incremental")
    StreamingSpanDedup.initBase(docs, s"$root/span")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    StreamingEmbeddingDedup.initBase(spark, "/root/testdata/sf0.001",
      Similarity.normalized(emb), s"$root/embedding")
    StreamingUrlDedup.initBase(urls, s"$root/url")
    StreamingCdc.initBase(docs, s"$root/cdc")
    StreamingWinnow.initBase(docs, s"$root/winnow")
    StreamingRecrawl.initBase(
      Seq((3L, 1L, 0L, 0L), (3L, 2L, 10L, 1L), (8L, 1L, 0L, 2L))
        .toDF("page", "sig", "ts_sec", "event_id"), s"$root/recrawl")
    StreamingCrossmodal.initBase(
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
        .toDF("doc_id", "cluster_id"), s"$root/crossmodal")
    root
  }

  // kill doc 1 (keeper of tA, shared with 5; component-min of cluster 1),
  // vec 7, page 3
  private def kill: DataFrame =
    Seq((1L, 7L, 3L)).toDF("doc_id", "vec_id", "page")

  private def countAll(root: String, family: String, table: String): Long =
    PartitionedBase.all(spark, s"$root/$family/$table").count()

  test("full pass over all eight families: accounting, rewrite, lock release") {
    val root = buildRoot()
    val tables = Seq("incremental" -> "digests", "incremental" -> "shingles",
      "span" -> "spans", "embedding" -> "cells", "url" -> "canon",
      "cdc" -> "chunks", "winnow" -> "fps", "recrawl" -> "state",
      "crossmodal" -> "labels")
    val before = tables.map { case (f, t) => (f, t) -> countAll(root, f, t) }
      .toMap

    val acc = ForgetRun.run(spark, root, kill, Seq("all"),
      docs = Some(docs), urls = Some(urls),
      edges = Some(Seq(2L -> 3L, 10L -> 11L).toDF("d1", "d2")),
      quiesceSecs = 0L)

    // accounting covers every table, before matches the pre-run counts,
    // after matches the post-run state on disk
    assert(acc.map(a => (a.family, a.table)).toSet == tables.toSet)
    acc.foreach { a =>
      assert(a.before == before((a.family, a.table)),
        s"${a.family}/${a.table} before")
      assert(a.after == countAll(root, a.family, a.table),
        s"${a.family}/${a.table} after")
    }
    // the killed keys left no trace in any doc/vec/page-keyed table
    assert(spark.read.parquet(s"$root/incremental/digests")
      .filter(col("base_doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(s"$root/incremental/shingles")
      .filter(col("doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(s"$root/embedding/cells")
      .filter(col("vec_id") === 7L).count() == 0)
    assert(spark.read.parquet(s"$root/url/canon")
      .filter(col("base_doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(s"$root/cdc/chunks")
      .filter(col("base_doc") === 1L).count() == 0)
    assert(spark.read.parquet(s"$root/winnow/fps")
      .filter(col("doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(s"$root/recrawl/state")
      .filter(col("page") === 3L).count() == 0)
    assert(spark.read.parquet(s"$root/crossmodal/labels")
      .filter(col("doc_id") === 1L).count() == 0)
    // corpus access was wired through: tA re-keyed to survivor 5, and
    // the killed component-min relabeled its cluster to the min survivor
    assert(spark.read.parquet(s"$root/incremental/digests")
      .filter(col("fp") === md5(lit(tA))).select("base_doc_id")
      .as[Long].collect().toSeq == Seq(5L))
    assert(StreamingCrossmodal.labels(spark, s"$root/crossmodal")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet ==
      Set((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L)))
    // advisory lock released
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/_maintenance.lock")))
  }

  /** Synthetic checkpoint dir: numeric entries under offsets/ and
    * commits/, offsets mtimes set `ageSecs` into the past. */
  private def mkCheckpoint(offsets: Seq[Long], commits: Seq[Long],
      ageSecs: Long): String = {
    val cp = tmp("graft-forgetrun-cp")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$cp/offsets"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$cp/commits"))
    offsets.foreach { id =>
      val p = java.nio.file.Paths.get(s"$cp/offsets/$id")
      java.nio.file.Files.write(p, "v1".getBytes)
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ageSecs * 1000L))
    }
    commits.foreach(id => java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$cp/commits/$id"), "v1".getBytes))
    cp
  }

  test("refuses on an in-flight batch and touches nothing") {
    val root = buildRoot()
    val before = countAll(root, "winnow", "fps")
    // batch 1 has offsets but no commit: the stream is mid-batch
    val cp = mkCheckpoint(offsets = Seq(0L, 1L), commits = Seq(0L),
      ageSecs = 3600L)
    val e = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, kill, Seq("winnow"),
        checkpoints = Seq(cp), quiesceSecs = 0L)
    }
    assert(e.getMessage.contains("in-flight batch 1"), e.getMessage)
    assert(countAll(root, "winnow", "fps") == before, "must touch nothing")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/_maintenance.lock")),
      "refusal happens before the lock is taken")
  }

  test("refuses inside the quiesce window; proceeds once quiet") {
    val root = buildRoot()
    // clean boundary (offsets == commits) but written seconds ago: a
    // live driver may start the next batch mid-rewrite
    val fresh = mkCheckpoint(offsets = Seq(0L), commits = Seq(0L),
      ageSecs = 1L)
    val e = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, kill, Seq("winnow"),
        checkpoints = Seq(fresh), quiesceSecs = 60L)
    }
    assert(e.getMessage.contains("quiesce"), e.getMessage)
    // same shape, long quiet: the pass runs
    val quiet = mkCheckpoint(offsets = Seq(0L), commits = Seq(0L),
      ageSecs = 3600L)
    val acc = ForgetRun.run(spark, root, kill, Seq("winnow"),
      checkpoints = Seq(quiet), quiesceSecs = 60L)
    assert(acc.nonEmpty && acc.forall(a => a.after < a.before))
  }

  test("refuses while the advisory lock is held; stale-lock message") {
    val root = buildRoot()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_maintenance.lock"), Array.empty[Byte])
    val e = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, kill, Seq("winnow"), quiesceSecs = 0L)
    }
    assert(e.getMessage.contains("_maintenance.lock"), e.getMessage)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/_maintenance.lock"))
    assert(ForgetRun.run(spark, root, kill, Seq("winnow"),
      quiesceSecs = 0L).nonEmpty)
  }

  test("fails loudly: missing family dir, missing kill column, span sans docs") {
    val root = buildRoot()
    val e1 = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, kill, Seq("nonsense"), quiesceSecs = 0L)
    }
    assert(e1.getMessage.contains("unknown families"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, tmp("graft-forgetrun-empty"), kill,
        Seq("span"), docs = Some(docs), quiesceSecs = 0L)
    }
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, kill.drop("vec_id"), Seq("embedding"),
        quiesceSecs = 0L)
    }
    assert(e3.getMessage.contains("vec_id"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, kill, Seq("span"), quiesceSecs = 0L)
    }
    assert(e4.getMessage.contains("--docs"), e4.getMessage)
  }
}
