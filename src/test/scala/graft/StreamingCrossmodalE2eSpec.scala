package graft

import graft.operators.{Corpus, Dedup, Multimodal}
import graft.sources.Tables
import graft.streaming.{PartitionedBase, StreamingCrossmodal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** END-TO-END multi-channel [[StreamingCrossmodal]] (r15 verdict #5):
  * unlike StreamingCrossmodalSpec (which feeds pre-filtered edge
  * slices), here the REAL per-channel incremental generators produce
  * every incident edge the stream consumes —
  * [[Dedup.hitsAgainstBase]] (exact + verified-Jaccard text),
  * [[Corpus.urlHitsAgainstBase]] (canonical-URL), and
  * [[Multimodal.phashPairsAgainstBase]] (banded pHash) — each run per
  * micro-batch against its own persisted [[PartitionedBase]] channel
  * artifact, grown batch-over-batch. The label artifact must converge
  * to the batch pipeline's `crossmodal_incremental` (itself hash-exact
  * against the full-closure oracle) on the same corpus.
  *
  * Channel-base growth uses ATTRIBUTION semantics (every novel text /
  * URL / signature enters its base, hit or not — near-dup docs
  * included), not the dedup twins' survivor-only growth: connectivity
  * through a chain of near-dups (A~B~C where A~C is below threshold)
  * only reconstructs if B's shingles are probe-able by C.
  *
  * Micro-batches are a conflict-free split of the batch slice: no two
  * docs sharing an incident edge land in the same micro-batch, so every
  * edge has a strict arrival order and is produced by a batch-vs-base
  * generator probe (the production contract: same-increment duplicates
  * surface on the next increment once the base has grown).
  *
  * Ends with the label-table compaction case: [[StreamingCrossmodal
  * .compact]] (the `max_by(batch)` read is what grows with partition
  * count) must preserve labels exactly, collapse the layout to one
  * bootstrap partition, and leave the stream able to continue. */
class StreamingCrossmodalE2eSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def labelRows(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet

  test("generator-fed channels converge to crossmodal_incremental; compaction preserves labels") {
    val docs = Tables.documents(spark, dir)
    val isB1 = col("d1") % 10L === 1L
    val isB2 = col("d2") % 10L === 1L
    val baseDocs = docs.filter(col("doc_id") % 10L =!= 1L).cache()
    val edges = Corpus.crossmodalEdges(spark, dir).cache()
    val phAll = Multimodal.phashDocs(spark, dir).cache()
    try {
      // ---- conflict-free micro-batch split of the batch slice --------
      val conflicts = edges.filter(isB1 && isB2)
        .select("d1", "d2").as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val batchIds = docs.filter(col("doc_id") % 10L === 1L)
        .select("doc_id").as[Long].collect().sorted
      val groups = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      batchIds.foreach { d =>
        groups.find(g => !g.exists(o =>
            conflicts((math.min(d, o), math.max(d, o))))) match {
          case Some(g) => g += d
          case None => groups += scala.collection.mutable.ArrayBuffer(d)
        }
      }
      // the verdict asks for 3+ batches; pad by splitting if the
      // fixture's conflict graph needed fewer
      while (groups.size < 3) {
        val big = groups.maxBy(_.size)
        val (a, b) = big.splitAt(big.size / 2)
        groups -= big; groups += a.to(scala.collection.mutable.ArrayBuffer)
        groups += b.to(scala.collection.mutable.ArrayBuffer)
      }

      // ---- bootstrap the four channel bases + the label artifact -----
      val base = tmp("graft-xm-e2e")
      PartitionedBase.init(Dedup.baseDigests(baseDocs), s"$base/digests")
      PartitionedBase.init(Dedup.shingleRows(Dedup.canonicalDocs(baseDocs)),
        s"$base/shingles")
      PartitionedBase.init(Corpus.urlBaseCanon(Corpus.rawUrls(baseDocs)),
        s"$base/canon")
      PartitionedBase.init(
        phAll.join(baseDocs.select("doc_id"), Seq("doc_id")), s"$base/phash")
      val baseLabels = baseDocs.select("doc_id")
        .join(Corpus.components(edges.filter(!isB1 && !isB2)),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      StreamingCrossmodal.initBase(baseLabels, base)

      // ---- the stream: per batch, generators -> edges -> merge -------
      var edgeTotal = 0L
      var lastEdges: DataFrame = null
      val body = StreamingCrossmodal.onBatch(base, (_, _) => ())
      groups.zipWithIndex.foreach { case (g, i) =>
        val bid = i.toLong
        val d = docs.filter(col("doc_id").isin(g.toSeq: _*)).cache()
        val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val tHits = Dedup.hitsAgainstBase(d,
          PartitionedBase.before(spark, s"$base/digests", bid),
          PartitionedBase.before(spark, s"$base/shingles", bid), caches += _)
        tHits.cache(); caches += tHits
        val uHits = Corpus.urlHitsAgainstBase(Corpus.rawUrls(d),
          PartitionedBase.before(spark, s"$base/canon", bid))
        val dPh = phAll.join(d.select("doc_id"), Seq("doc_id"))
        val pHits = Multimodal.phashPairsAgainstBase(dPh,
          PartitionedBase.before(spark, s"$base/phash", bid))
        def asEdges(h: DataFrame): DataFrame = h.select(
          col("base_doc_id").as("d1"), col("doc_id").as("d2"))
        val batchEdges = asEdges(tHits).unionByName(asEdges(uHits))
          .unionByName(asEdges(pHits)).cache()
        caches += batchEdges
        edgeTotal += batchEdges.count()
        body(batchEdges, bid)
        lastEdges = batchEdges.localCheckpoint()
        // grow the channel bases with ATTRIBUTION semantics
        val novel = d.join(
          tHits.filter(col("kind") === "exact").select("doc_id"),
          Seq("doc_id"), "left_anti")
        val (keepers, kRdd) =
          graft.util.Ckpt.materialize(Dedup.canonicalDocs(novel))
        try {
          PartitionedBase.write(Dedup.baseDigests(keepers),
            s"$base/digests", bid)
          PartitionedBase.write(Dedup.shingleRows(keepers),
            s"$base/shingles", bid)
        } finally kRdd.unpersist(blocking = false)
        val (novelCanon, cRdd) = graft.util.Ckpt.materialize(
          Corpus.urlBaseCanon(Corpus.rawUrls(d))
            .join(PartitionedBase.before(spark, s"$base/canon", bid)
                .select("canon_url"),
              Seq("canon_url"), "left_anti"))
        try PartitionedBase.write(novelCanon, s"$base/canon", bid)
        finally cRdd.unpersist(blocking = false)
        PartitionedBase.write(dPh, s"$base/phash", bid)
        caches.foreach(_.unpersist()); d.unpersist()
      }
      assert(groups.size >= 3, s"need 3+ micro-batches, got ${groups.size}")
      assert(edgeTotal > 0, "generators must produce incident edges")

      // ---- parity against the batch pipeline --------------------------
      val got = labelRows(docs.select("doc_id")
        .join(StreamingCrossmodal.labels(spark, base), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id"))))
      val want = labelRows(Corpus.crossmodalIncremental(spark, dir))
      assert(got == want, {
        val d1 = (got -- want).take(5); val d2 = (want -- got).take(5)
        s"labels diverged: extra=$d1 missing=$d2"
      })

      // ---- compaction: labels preserved, layout collapsed, stream on --
      val before = labelRows(StreamingCrossmodal.labels(spark, base))
      StreamingCrossmodal.compact(spark, base)
      assert(labelRows(StreamingCrossmodal.labels(spark, base)) == before,
        "compaction changed the visible labels")
      val parts = new java.io.File(s"$base/labels").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
      assert(parts == Set("batch=-1"), s"labels not compacted: $parts")
      // re-merging already-merged edges after compaction is a no-op
      body(lastEdges, groups.size.toLong)
      assert(labelRows(StreamingCrossmodal.labels(spark, base)) == before,
        "post-compaction re-merge must be a no-op")
    } finally {
      baseDocs.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      phAll.unpersist(blocking = false)
    }
  }
}
