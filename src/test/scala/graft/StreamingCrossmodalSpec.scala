package graft

import graft.operators.Corpus
import graft.streaming.StreamingCrossmodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity + idempotency theorems for the streaming cross-modal label
  * table ([[StreamingCrossmodal]]):
  *  - ANY micro-batch split of the batch-incident edge set merges to
  *    labels identical to [[Corpus.crossmodalIncremental]]'s single
  *    merged batch (which is itself hash-exact against the full-closure
  *    oracle) — union-find merging composes;
  *  - a crash-and-replay of a batch (ledger marker removed) re-delivers
  *    the identical delta and leaves the label table byte-identical —
  *    the per-batchId overwrite makes growth idempotent;
  *  - with the marker present the body is a no-op. */
class StreamingCrossmodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def labelRows(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet

  test("3-batch edge replay == crossmodal_incremental; replay is idempotent") {
    val baseDir = tmp("graft-crossmodal")
    val isBatch1 = col("d1") % 10L === 1L
    val isBatch2 = col("d2") % 10L === 1L
    val edges = Corpus.crossmodalEdges(spark, dir).cache()
    try {
      val docs = graft.sources.Tables.documents(spark, dir).select("doc_id")
      // the same persisted-artifact stand-in crossmodalIncremental uses:
      // the base corpus closed alone, singletons defaulted
      val baseLabels = docs.filter(col("doc_id") % 10L =!= 1L)
        .join(Corpus.components(edges.filter(!isBatch1 && !isBatch2)),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      StreamingCrossmodal.initBase(baseLabels, baseDir)

      // the batch-incident edges arrive as 3 uneven micro-batches
      val incident = edges.filter(isBatch1 || isBatch2)
      assert(incident.count() > 0, "fixture must produce incident edges")
      val deltas = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
      val body = StreamingCrossmodal.onBatch(baseDir,
        (d, id) => deltas(id) = labelRows(d))
      (0 until 3).foreach { b =>
        body(incident.filter(
          pmod(hash(col("d1"), col("d2")), lit(3)) === b), b.toLong)
      }
      assert(deltas.values.exists(_.nonEmpty),
        "at least one batch must relabel something — dead test otherwise")

      // final labels (absent docs default to singleton-self) must equal
      // the registered query's merged labels exactly
      val got = labelRows(docs
        .join(StreamingCrossmodal.labels(spark, baseDir), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id"))))
      val want = labelRows(Corpus.crossmodalIncremental(spark, dir))
      assert(got == want)

      // crash-and-replay batch 1: identical re-delivery, identical table
      def tableNow(): Set[(Long, Long, Int)] =
        spark.read.parquet(s"$baseDir/labels")
          .select("doc_id", "cluster_id", "batch")
          .as[(Long, Long, Int)].collect().toSet
      val before = tableNow()
      val delivered1 = deltas(1L)
      val marker = new java.io.File(s"$baseDir/_graft_crossmodal_ledger/1")
      assert(marker.exists() && marker.delete())
      deltas.remove(1L)
      body(incident.filter(
        pmod(hash(col("d1"), col("d2")), lit(3)) === 1), 1L)
      assert(deltas(1L) == delivered1)
      assert(tableNow() == before)

      // ledger short-circuit: marker present -> no delivery, no write
      deltas.remove(1L)
      body(incident.filter(
        pmod(hash(col("d1"), col("d2")), lit(3)) === 1), 1L)
      assert(!deltas.contains(1L))
      assert(tableNow() == before)
    } finally edges.unpersist(blocking = false)
  }
}
