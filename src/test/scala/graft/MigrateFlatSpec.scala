package graft

import graft.operators.{Corpus, Dedup, Similarity, TextAnalysis}
import graft.streaming._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Direct coverage of [[PartitionedBase.migrateFlat]] — the documented
  * upgrade path every pre-r15 FLAT base dir must run once (r15 verdict
  * #3: it was the one code path a real upgrading deployment executes
  * that no spec executed). For every streaming-base shape:
  *
  *  - flat → migrated → grown: a base written in the pre-r15 flat
  *    layout (root-level part files), migrated, then grown by the
  *    twin's own `onBatch`, must deliver the same hits and hold the
  *    same final base rows as a partitioned-from-birth control;
  *  - idempotence: migrating an already-migrated dir changes nothing;
  *  - compaction: `migrateFlat` doubles as the offline compactor
  *    (replace-with-identity) — after N grown batches it rolls history
  *    into one `batch=-1` partition and the stream RESUMES with
  *    identical behavior.
  *
  * The label table ([[StreamingCrossmodal]]) is deliberately NOT here:
  * its delta rows are last-writer-wins per doc, so flattening them
  * would tie `batch` values — its compactor is
  * [[StreamingCrossmodal.compact]], pinned by StreamingCrossmodalSpec. */
class MigrateFlatSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // ≥10 tokens (span windows) and ≥winnowK grams everywhere
  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val tB = "one two three four five six seven eight nine ten eleven twelve"
  private val tC = "red green blue cyan magenta yellow black white gray pink brown tan"

  /** One streaming-base shape: how to write its bootstrap artifacts in
    * the pre-r15 FLAT layout vs the partitioned one, and how to run its
    * grow-mode body. */
  private case class Shape(
      name: String,
      subdirs: Seq[String],
      initFlat: String => Unit,
      initPart: String => Unit,
      body: String => ((DataFrame, Long) => Unit) => (DataFrame, Long) => Unit,
      batches: Seq[DataFrame])

  private def shapes: Seq[Shape] = {
    val baseDocs = docsDf(1L -> tA, 2L -> tB)
    val incBatches = Seq(docsDf(10L -> tA, 11L -> tC), docsDf(12L -> tC))

    val urlBase = Seq(1L -> "http://example.com/a?x=1",
      2L -> "http://example.com/b?y=2").toDF("doc_id", "url")
    val urlBatches = Seq(
      Seq(10L -> "HTTP://WWW.example.com:80/a?utm_source=z&x=1#f",
        11L -> "http://example.com/c?z=3").toDF("doc_id", "url"),
      Seq(12L -> "http://EXAMPLE.com/c?z=3&gclid=q").toDF("doc_id", "url"))

    val embDir = "/root/testdata/sf0.001"
    def embVecs = Similarity.normalized(
      graft.sources.Tables.embeddings(spark, embDir)
        .select("vec_id", "embedding"))
    val embBase = embVecs.filter(col("vec_id") < 100L)
    // batch 0 re-embeds vec 7 under a new id (a guaranteed sim-1.0 hit)
    // plus novel vectors; batch 1 re-embeds one of batch 0's novel ids
    val embSrc = graft.sources.Tables.embeddings(spark, embDir)
      .select("vec_id", "embedding")
    val embBatches = Seq(
      embSrc.filter(col("vec_id") === 7L)
        .withColumn("vec_id", col("vec_id") + 1000L)
        .unionByName(embSrc.filter(col("vec_id").between(100L, 119L))),
      embSrc.filter(col("vec_id") === 105L)
        .withColumn("vec_id", col("vec_id") + 2000L))

    Seq(
      Shape("incremental", Seq("digests", "shingles"),
        d => {
          Dedup.baseDigests(baseDocs).write.parquet(s"$d/digests")
          Dedup.shingleRows(Dedup.canonicalDocs(baseDocs))
            .write.parquet(s"$d/shingles")
        },
        d => StreamingIncrementalDedup.initBase(baseDocs, d),
        d => f => StreamingIncrementalDedup.onBatch(d, growBase = true, f),
        incBatches),
      Shape("url", Seq("canon"),
        d => Corpus.urlBaseCanon(urlBase).write.parquet(s"$d/canon"),
        d => StreamingUrlDedup.initBase(urlBase, d),
        d => f => StreamingUrlDedup.onBatch(d, growBase = true, f),
        urlBatches),
      Shape("span", Seq("spans"),
        d => Dedup.baseSpanDigests(baseDocs).write.parquet(s"$d/spans"),
        d => StreamingSpanDedup.initBase(baseDocs, d),
        d => f => StreamingSpanDedup.onBatch(d, growBase = true, f),
        incBatches),
      Shape("cdc", Seq("chunks"),
        d => TextAnalysis.cdcBaseDigestsOf(TextAnalysis.cdcChunksOf(baseDocs))
          .write.parquet(s"$d/chunks"),
        d => StreamingCdc.initBase(baseDocs, d),
        d => f => StreamingCdc.onBatch(d, growBase = true, f),
        incBatches),
      Shape("winnow", Seq("fps"),
        d => TextAnalysis.winnowFps(baseDocs).select("doc_id", "fp")
          .distinct().write.parquet(s"$d/fps"),
        d => StreamingWinnow.initBase(baseDocs, d),
        d => f => StreamingWinnow.onBatch(d, growBase = true, f),
        incBatches),
      Shape("embedding", Seq("cells"),
        d => {
          Similarity.saveIndexArtifacts(spark, embDir, d)
          Similarity.cellIndex(embBase,
            spark.read.parquet(s"$d/centroids")).write.parquet(s"$d/cells")
        },
        d => StreamingEmbeddingDedup.initBase(spark, embDir, embBase, d),
        d => f => StreamingEmbeddingDedup.onBatch(d, growBase = true, f),
        embBatches))
  }

  private def rowsOf(df: DataFrame): Set[String] = df.toJSON.collect().toSet

  private def baseRows(dir: String, subdirs: Seq[String]): Map[String, Set[String]] =
    subdirs.map(s => s -> rowsOf(PartitionedBase.all(spark, s"$dir/$s"))).toMap

  /** Run `batches` through the shape's grow-mode body from `fromId`,
    * returning the delivered rows per batchId. */
  private def run(sh: Shape, dir: String, fromId: Long = 0L,
      only: Option[Seq[DataFrame]] = None): Map[Long, Set[String]] = {
    val out = scala.collection.mutable.Map.empty[Long, Set[String]]
    val body = sh.body(dir)((df, id) => out(id) = rowsOf(df))
    only.getOrElse(sh.batches).zipWithIndex.foreach { case (b, i) =>
      body(b, fromId + i)
    }
    out.toMap
  }

  test("flat base migrates, then grows identically to partitioned-from-birth") {
    shapes.foreach { sh =>
      val flatDir = tmp(s"graft-migrate-${sh.name}")
      val ctrlDir = tmp(s"graft-migctrl-${sh.name}")
      sh.initFlat(flatDir)
      sh.initPart(ctrlDir)
      // migrate each artifact dir once (stream stopped), per the scaladoc
      sh.subdirs.foreach(s => PartitionedBase.migrateFlat(spark, s"$flatDir/$s"))
      // the migrated read must equal the flat content exactly
      assert(baseRows(flatDir, sh.subdirs) == baseRows(ctrlDir, sh.subdirs),
        s"${sh.name}: migrated bootstrap must equal partitioned bootstrap")
      val gotFlat = run(sh, flatDir)
      val gotCtrl = run(sh, ctrlDir)
      assert(gotFlat == gotCtrl, s"${sh.name}: hits after migration diverged")
      assert(baseRows(flatDir, sh.subdirs) == baseRows(ctrlDir, sh.subdirs),
        s"${sh.name}: grown base after migration diverged")
    }
  }

  test("migrateFlat is idempotent on an already-migrated dir") {
    val sh = shapes.head // incremental: the two-artifact shape
    val dir = tmp("graft-migrate-idem")
    sh.initFlat(dir)
    sh.subdirs.foreach(s => PartitionedBase.migrateFlat(spark, s"$dir/$s"))
    val once = baseRows(dir, sh.subdirs)
    sh.subdirs.foreach(s => PartitionedBase.migrateFlat(spark, s"$dir/$s"))
    assert(baseRows(dir, sh.subdirs) == once, "second migrate changed rows")
    // and the layout is a single bootstrap partition
    sh.subdirs.foreach { s =>
      val parts = new java.io.File(s"$dir/$s").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
      assert(parts == Set("batch=-1"), s"$s layout after re-migrate: $parts")
    }
  }

  test("compaction: migrateFlat after N grown batches; stream resumes identically") {
    val sh = shapes.head
    val cDir = tmp("graft-migrate-compact")
    val ctrl = tmp("graft-migrate-compctrl")
    sh.initPart(cDir); sh.initPart(ctrl)
    // grow both with batch 0, compact ONE, then run batch 1 on both
    val h0c = run(sh, cDir, only = Some(sh.batches.take(1)))
    val h0u = run(sh, ctrl, only = Some(sh.batches.take(1)))
    assert(h0c == h0u)
    sh.subdirs.foreach(s => PartitionedBase.migrateFlat(spark, s"$cDir/$s"))
    assert(baseRows(cDir, sh.subdirs) == baseRows(ctrl, sh.subdirs),
      "compaction must not change the visible base")
    sh.subdirs.foreach { s =>
      val parts = new java.io.File(s"$cDir/$s").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
      assert(parts == Set("batch=-1"), s"$s not compacted: $parts")
    }
    val h1c = run(sh, cDir, fromId = 1L, only = Some(sh.batches.drop(1)))
    val h1u = run(sh, ctrl, fromId = 1L, only = Some(sh.batches.drop(1)))
    assert(h1c == h1u, "post-compaction batch diverged")
    assert(baseRows(cDir, sh.subdirs) == baseRows(ctrl, sh.subdirs),
      "post-compaction growth diverged")
  }
}
