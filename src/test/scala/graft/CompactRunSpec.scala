package graft

import graft.tools.{CompactRun, ForgetRun}
import graft.streaming.{PartitionedBase, StreamingUrlDedup, StreamingWinnow}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operational compactor ([[CompactRun]]) behind the measured
  * ~50-partition cadence rule: rolls grown bases to one partition with
  * row-count invariance VERIFIED, skips already-compact tables, and
  * shares the [[graft.streaming.Maintenance]] guards with ForgetRun so
  * the two passes mutually exclude. */
class CompactRunSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private def parts(dir: String): Int =
    new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch="))

  /** url base grown by 3 batches, winnow base left at bootstrap. */
  private def buildRoot(): String = {
    val root = tmp("graft-compactrun")
    def urlsDf(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "url")
    StreamingUrlDedup.initBase(
      urlsDf(1L -> "http://example.com/a", 2L -> "http://example.com/b"),
      s"$root/url")
    (0 until 3).foreach { b =>
      PartitionedBase.write(
        Seq((s"http://example.com/g$b", 100L + b)).toDF("canon_url",
          "base_doc_id"), s"$root/url/canon", b.toLong)
    }
    StreamingWinnow.initBase(Seq(1L -> tA).toDF("doc_id", "text"),
      s"$root/winnow")
    root
  }

  test("compacts grown tables to one partition, rows invariant; skips compact ones") {
    val root = buildRoot()
    assert(parts(s"$root/url/canon") == 4)
    val rowsBefore = PartitionedBase.all(spark, s"$root/url/canon").count()

    val done = CompactRun.run(spark, root, Seq("all"), quiesceSecs = 0L)

    val url = done.find(c => c.family == "url" && c.table == "canon").get
    assert(!url.skipped && url.partsBefore == 4 &&
      url.rowsBefore == rowsBefore && url.rowsAfter == rowsBefore)
    assert(parts(s"$root/url/canon") == 1)
    assert(PartitionedBase.all(spark, s"$root/url/canon").count() ==
      rowsBefore)
    // bootstrap-only winnow base: skipped (<= min-parts), untouched
    val win = done.find(_.family == "winnow").get
    assert(win.skipped && win.partsBefore == 1)
    // lock released
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/_maintenance.lock")))
    // idempotent: a second pass skips everything
    assert(CompactRun.run(spark, root, Seq("all"), quiesceSecs = 0L)
      .forall(_.skipped))
  }

  test("shares the maintenance guards with ForgetRun: mutual exclusion + checkpoint preflight") {
    val root = buildRoot()
    // a held maintenance lock refuses BOTH runners
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_maintenance.lock"), Array.empty[Byte])
    val e1 = intercept[IllegalArgumentException] {
      CompactRun.run(spark, root, Seq("url"), quiesceSecs = 0L)
    }
    assert(e1.getMessage.contains("_maintenance.lock"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ForgetRun.run(spark, root, Seq(1L).toDF("doc_id"), Seq("url"),
        quiesceSecs = 0L)
    }
    assert(e2.getMessage.contains("_maintenance.lock"), e2.getMessage)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/_maintenance.lock"))

    // an in-flight checkpoint refuses compaction before anything moves
    val cp = tmp("graft-compactrun-cp")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$cp/offsets"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$cp/commits"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$cp/offsets/0"), "v1".getBytes)
    val e3 = intercept[IllegalArgumentException] {
      CompactRun.run(spark, root, Seq("url"), checkpoints = Seq(cp),
        quiesceSecs = 0L)
    }
    assert(e3.getMessage.contains("in-flight batch 0"), e3.getMessage)
    assert(parts(s"$root/url/canon") == 4, "must touch nothing")

    // and a missing family dir fails loudly
    val e4 = intercept[IllegalArgumentException] {
      CompactRun.run(spark, tmp("graft-compactrun-empty"), Seq("cdc"),
        quiesceSecs = 0L)
    }
    assert(e4.getMessage.contains("does not exist"), e4.getMessage)
  }
}
