package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `BINARY` columns with typed
  * metadata, processed in batched per-partition loops.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[stubDecode]]); everything around
  * it — the binary column representation, the metadata struct, the
  * partition-batched processing shape (the Scala analog of `mapInPandas`:
  * one tight loop per partition over primitive arrays, no per-row
  * interpretation), frame sampling and feature extraction — is real,
  * deterministic, and tested.
  *
  * Output is ALL-SCALAR so it is oracle-checkable end to end: the byte
  * histogram is a fixed-order CSV string and the sampled frame digests are
  * rolled into one md5. Frame digests are md5 over the frame's lowercase
  * hex (not the raw bytes) because the cross-engine oracle can only md5
  * text — the indirection is deterministic and keeps every column
  * SQL-expressible; a production build would digest the raw bytes.
  *
  * Scale posture: payload bytes never shuffle — every derived column is
  * computed in the scan stage's partition; only the small feature/metadata
  * projection flows downstream. At 100 TB the media blobs stay in object
  * storage and this operator maps over them split-by-split.
  */
object Multimodal {

  val frameBytes = 256 // stand-in "frame" granularity
  val sampleEvery = 4 // keep every 4th frame
  val histBuckets = 16

  /** STUB decode (the real build would call an image/audio codec here):
    * interprets the payload bytes themselves as the decoded sample
    * stream. Deterministic by construction. */
  @inline private def stubDecode(payload: Array[Byte]): Array[Byte] = payload

  final case class MediaFeature(
      doc_id: Long, mime: String, n_bytes: Long, n_frames: Long,
      n_sampled: Long, hist_csv: String, frames_digest: String)

  /** The fixture has no binary table, so media payloads are synthesized
    * deterministically from `documents.text` (UTF-8 bytes). A real
    * deployment replaces this one line with the parquet/av-container scan
    * of an actual binary column — everything downstream is unchanged. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("application/x-graft-demo").as("mime"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder((until - from) * 2)
    var i = from
    while (i < until) {
      val b = bytes(i) & 0xff
      sb.append(hexChars(b >>> 4)).append(hexChars(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** decode -> frame-sample -> feature-extract, one partition at a time. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          digest.reset()
          digest.update(s.getBytes("UTF-8"))
          toHex(digest.digest(), 0, 16)
        }
        it.map { case (docId, payload, mime) =>
          val decoded = stubDecode(payload)
          // byte-value histogram (the "feature vector"), fixed-order CSV
          val hist = new Array[Long](histBuckets)
          var i = 0
          while (i < decoded.length) {
            hist((decoded(i) & 0xff) % histBuckets) += 1
            i += 1
          }
          // frame split + every-kth sampling ("resize"/"frame-sample");
          // per-frame md5 over the frame's lowercase hex, rolled into one
          // digest so the feature row stays scalar
          val nFrames = (decoded.length + frameBytes - 1) / frameBytes
          val frameMd5s = new java.lang.StringBuilder
          var nSampled = 0L
          var f = 0
          while (f < nFrames) {
            val from = f * frameBytes
            val until = math.min(from + frameBytes, decoded.length)
            frameMd5s.append(md5hex(toHex(decoded, from, until)))
            nSampled += 1
            f += sampleEvery
          }
          MediaFeature(docId, mime, decoded.length.toLong, nFrames.toLong,
            nSampled, hist.mkString(","), md5hex(frameMd5s.toString))
        }
      }.toDF()
  }

  final case class FrameRow(
      doc_id: Long, frame_id: Long, f_offset: Long, frame_len: Long,
      frame_md5: String)

  /** Frame-SAMPLE as an exploded TABLE: one row per sampled frame — the
    * "video -> frames" shape a training pipeline feeds to a per-frame
    * model (captioner, encoder). Unlike [[features]] (one scalar feature
    * row per doc) this multiplies rows, which is the plan-shape that
    * matters: the explosion happens INSIDE the scan stage's partition
    * loop (payload bytes still never shuffle; only the small
    * per-frame projection rows flow downstream), and the every-kth
    * sampling bound means output is n_frames/k rows, not n_frames.
    * frame_id is the frame's index in the UNSAMPLED stream, so the
    * sampling stride is recoverable downstream. */
  def frames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          digest.reset()
          digest.update(s.getBytes("UTF-8"))
          toHex(digest.digest(), 0, 16)
        }
        it.flatMap { case (docId, payload) =>
          val decoded = stubDecode(payload)
          val nFrames = (decoded.length + frameBytes - 1) / frameBytes
          Iterator.range(0, nFrames, sampleEvery).map { f =>
            val from = f * frameBytes
            val until = math.min(from + frameBytes, decoded.length)
            FrameRow(docId, f.toLong, from.toLong, (until - from).toLong,
              md5hex(toHex(decoded, from, until)))
          }
        }
      }.toDF()
  }

  /** DuckDB twin of [[frames]] (same hex-space indirection as
    * [[featuresSql]]). */
  val framesSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, hx, n_bytes,
       |    (n_bytes + ${frameBytes - 1}) // $frameBytes AS n_frames
       |  FROM m
       |)
       |SELECT doc_id, CAST(fr AS BIGINT) AS frame_id,
       |  CAST(fr * $frameBytes AS BIGINT) AS f_offset,
       |  CAST(least(CAST((fr + 1) * $frameBytes AS BIGINT), n_bytes)
       |    - fr * $frameBytes AS BIGINT) AS frame_len,
       |  md5(substr(hx, fr * ${frameBytes * 2} + 1, ${frameBytes * 2})) AS frame_md5
       |FROM f CROSS JOIN
       |  unnest(generate_series(0, CAST(n_frames AS INT) - 1, $sampleEvery)) AS t(fr)""".stripMargin

  val resizeBlock = 64 // bytes averaged into one output sample

  final case class Thumb(
      doc_id: Long, n_bytes: Long, n_blocks: Long, thumb_csv: String,
      thumb_md5: String)

  /** RESIZE/downsample: block-average the decoded stream ([[resizeBlock]]
    * bytes -> one sample, integer floor mean) — the thumbnail shape. The
    * thumbnail itself is emitted as a fixed-order CSV plus its md5 so the
    * operator stays oracle-checkable; the real build would emit the
    * resized binary. Same partition-loop posture: payloads never leave
    * the scan stage. */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, payload) =>
          val decoded = stubDecode(payload)
          val nBlocks = (decoded.length + resizeBlock - 1) / resizeBlock
          val sb = new java.lang.StringBuilder
          var b = 0
          while (b < nBlocks) {
            val from = b * resizeBlock
            val until = math.min(from + resizeBlock, decoded.length)
            var sum = 0L
            var i = from
            while (i < until) { sum += (decoded(i) & 0xff); i += 1 }
            if (b > 0) sb.append(',')
            sb.append(sum / (until - from))
            b += 1
          }
          val csv = sb.toString
          digest.reset()
          digest.update(csv.getBytes("UTF-8"))
          Thumb(docId, decoded.length.toLong, nBlocks.toLong, csv,
            toHex(digest.digest(), 0, 16))
        }
      }.toDF()
  }

  /** DuckDB twin of [[resize]]: identical integer block means in
    * hex-space. */
  val resizeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, n_bytes,
       |    (n_bytes + ${resizeBlock - 1}) // $resizeBlock AS n_blocks,
       |    list_transform(generate_series(1, CAST(n_bytes AS INT)),
       |      i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS BIGINT)) AS byts
       |  FROM m
       |), t AS (
       |  SELECT doc_id, n_bytes, n_blocks,
       |    array_to_string(list_transform(
       |      generate_series(0, CAST(n_blocks AS INT) - 1),
       |      bk -> CAST(CAST(list_sum(list_slice(byts, bk * $resizeBlock + 1,
       |        least((bk + 1) * $resizeBlock, CAST(n_bytes AS INT)))) AS BIGINT)
       |        // (least(CAST((bk + 1) * $resizeBlock AS BIGINT), n_bytes)
       |          - bk * $resizeBlock) AS VARCHAR)), ',') AS thumb_csv
       |  FROM b
       |)
       |SELECT doc_id, n_bytes, n_blocks, thumb_csv, md5(thumb_csv) AS thumb_md5
       |FROM t""".stripMargin

  // ------------------------------------------- perceptual-hash dedup

  val phashBits = 60 // 60 not 64: keeps the packed hash positive in BIGINT
  val phashChunkBits = 5 // 12 bands of 5 bits (see recall note below)
  val phashHammingMax = 10 // pigeonhole-exact: 10 < 12 bands

  // Band-width note: real imagery clusters near-dups at hamming <= ~5
  // of 64, where 8-bit bands (256-value buckets) are the standard
  // multi-index-hashing trade. These fixtures synthesize media from
  // TEXT, whose small edits shift every downstream byte — measured
  // near-dup pairs sit at hamming 8-12 — so the bands widen to 5 bits
  // to keep the guarantee (hamming <= hammingMax always shares a band
  // iff hammingMax < band count). Coarser bands mean fuller buckets;
  // the DISTINCT-signature join below bounds that exactly like simhash
  // (cost O(distinct_sigs per bucket), never O(docs)).

  /** Per-doc perceptual hash (aHash family) over the stub-decoded media
    * stream: the stream is cut into [[phashBits]] contiguous regions
    * (`[b*n/60, (b+1)*n/60)` — the 1-D analog of resizing an image to an
    * 8x8 grid), and bit b is set iff region b's mean exceeds the global
    * mean. The compare is INTEGER cross-multiplication
    * (`region_sum * n > total_sum * region_len`) so both engines decide
    * every bit exactly — no float mean ever materializes. Docs shorter
    * than [[phashBits]] bytes have under-defined regions and are
    * excluded, identically in both engines. Overflow bound:
    * `sum * n <= 255 * n^2` stays in Long for payloads < ~190 MB; media
    * larger than that would hash per-tile anyway. */
  def phashDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, payload) =>
          val d = stubDecode(payload)
          val n = d.length
          if (n < phashBits) Iterator.empty
          else {
            var total = 0L
            var i = 0
            while (i < n) { total += (d(i) & 0xff); i += 1 }
            var hash = 0L
            var b = 0
            while (b < phashBits) {
              val from = (b.toLong * n / phashBits).toInt
              val until = ((b + 1).toLong * n / phashBits).toInt
              var s = 0L
              var j = from
              while (j < until) { s += (d(j) & 0xff); j += 1 }
              if (s * n > total * (until - from)) hash |= (1L << b)
              b += 1
            }
            Iterator.single((docId, hash))
          }
        }
      }.toDF("doc_id", "phash")
  }

  /** Perceptual near-dup IMAGE pairs: ties the multimodal and dedup
    * families together — [[phashDocs]] signatures, then the exact
    * [[Dedup.simhashPairs]] candidate shape: distinct signatures band
    * into 4 x 15-bit chunks, candidates share a chunk at the same index
    * (pigeonhole: hamming <= [[phashHammingMax]] always shares one, so
    * recall is exact), verified by popcount. Same hot-bucket posture as
    * simhash: a flood of byte-identical media collapses to ONE distinct
    * signature before the banded join; doc fan-in only happens on
    * verified signature pairs and on the equal-signature equi-join.
    * Payload bytes never shuffle — only (doc_id, 8-byte hash) leaves the
    * scan. */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    val ph = Dedup.eager(phashDocs(spark, dir))
    val hs = ph.select("phash").distinct()
    val chunks = spark.range(phashBits / phashChunkBits).toDF("c")
    val keyed = hs.crossJoin(broadcast(chunks))
      .withColumn("chunk_val",
        expr(s"shiftright(phash, CAST(c * $phashChunkBits AS INT))" +
          s" & ${(1L << phashChunkBits) - 1}"))
    val hp = keyed.as("x").join(keyed.as("y"),
        col("x.c") === col("y.c") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.phash") < col("y.phash"))
      .select(col("x.phash").as("h1"), col("y.phash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= phashHammingMax)
    val cross = ph.as("a")
      .join(hp, col("a.phash") === col("h1"))
      .join(ph.as("b"), col("b.phash") === col("h2"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"), col("hamming"))
    val same = ph.as("a").join(ph.as("b"),
        col("a.phash") === col("b.phash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit(0).cast("int").as("hamming"))
    cross.union(same)
  }

  /** The batch-vs-base INCREMENTAL form of [[phashDedup]] — the pHash
    * channel's analog of [[Dedup.hitsAgainstBase]]: every batch doc
    * paired against base docs whose signatures sit within
    * [[phashHammingMax]] (equal signatures included — they share every
    * band), via the SAME banded candidate join over distinct signatures.
    * Unlike the self-join form no `<` ordering is needed, so the one
    * banded join carries both the near and the equal case. Feeds the
    * image channel's incident edges to the streaming cross-modal merge
    * ([[graft.streaming.StreamingCrossmodal]]). Scale shape: batch-side
    * signatures are distinct + tiny (broadcastable); the base is probed
    * per band, never self-joined; only (doc_id, 8-byte hash) shuffles. */
  def phashPairsAgainstBase(newPh: DataFrame, basePh: DataFrame): DataFrame = {
    val spark = newPh.sparkSession
    val chunks = spark.range(phashBits / phashChunkBits).toDF("c")
    def keyed(df: DataFrame) = df.select("phash").distinct()
      .crossJoin(broadcast(chunks))
      .withColumn("chunk_val",
        expr(s"shiftright(phash, CAST(c * $phashChunkBits AS INT))" +
          s" & ${(1L << phashChunkBits) - 1}"))
    val hp = keyed(newPh).as("x").join(keyed(basePh).as("y"),
        col("x.c") === col("y.c") && col("x.chunk_val") === col("y.chunk_val"))
      .select(col("x.phash").as("hn"), col("y.phash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("hn").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= phashHammingMax)
    newPh.as("a").join(hp, col("a.phash") === col("hn"))
      .join(basePh.as("b"), col("b.phash") === col("hb"))
      .select(col("a.doc_id"), col("b.doc_id").as("base_doc_id"),
        col("hamming"))
  }

  /** DuckDB twin of [[phashDedup]]: identical integer cross-multiplied
    * bits in hex-space, doc-level banded self-join (output-identical to
    * the Spark side's distinct-signature form). */
  def phashDedupSql: String = {
    val packed = (0 until phashBits).map { b =>
      s"(CASE WHEN list_sum(list_slice(byts, ($b * n) // $phashBits + 1," +
        s" (${b + 1} * n) // $phashBits)) * n > total *" +
        s" ((${b + 1} * n) // $phashBits - ($b * n) // $phashBits)" +
        s" THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents
       |), bb AS (
       |  SELECT doc_id, n,
       |    list_transform(generate_series(1, CAST(n AS INT)),
       |      i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS BIGINT)) AS byts
       |  FROM m WHERE n >= $phashBits
       |), r AS (SELECT doc_id, n, byts, list_sum(byts) AS total FROM bb),
       |ph AS (SELECT doc_id, CAST($packed AS BIGINT) AS phash FROM r),
       |k AS (
       |  SELECT doc_id, phash, c,
       |    (phash >> (c * $phashChunkBits)) & ${(1L << phashChunkBits) - 1} AS chunk_val
       |  FROM ph CROSS JOIN (SELECT unnest(generate_series(0, ${phashBits / phashChunkBits - 1})) AS c)
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS d1, x.phash AS h1, y.doc_id AS d2, y.phash AS h2
       |  FROM k x JOIN k y ON x.c = y.c AND x.chunk_val = y.chunk_val
       |    AND x.doc_id < y.doc_id
       |)
       |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(h1, h2)) <= $phashHammingMax""".stripMargin
  }

  /** DuckDB twin of [[features]]: identical math in hex-string space
    * (DuckDB 1.0 has no BLOB md5/substring, hence the hex indirection on
    * both sides). */
  val featuresSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, hx, n_bytes,
       |    (n_bytes + ${frameBytes - 1}) // $frameBytes AS n_frames
       |  FROM m
       |), s AS (
       |  SELECT doc_id, n_bytes, n_frames,
       |    list_transform(generate_series(0, CAST(n_frames AS INT) - 1, $sampleEvery),
       |      fr -> md5(substr(hx, fr * ${frameBytes * 2} + 1, ${frameBytes * 2}))) AS fr_md5s,
       |    list_transform(generate_series(1, CAST(n_bytes AS INT)),
       |      i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS INT)) AS byts
       |  FROM f
       |)
       |SELECT doc_id, 'application/x-graft-demo' AS mime, n_bytes, n_frames,
       |  CAST(len(fr_md5s) AS BIGINT) AS n_sampled,
       |  array_to_string(list_transform(generate_series(0, ${histBuckets - 1}),
       |    b -> CAST(len(list_filter(byts, x -> x % $histBuckets = b)) AS VARCHAR)), ',') AS hist_csv,
       |  md5(array_to_string(fr_md5s, '')) AS frames_digest
       |FROM s""".stripMargin

  /** Image duplicate CLUSTERS — [[phashDedup]]'s pairs closed into
    * connected components, the same pairs→keeper step the TEXT family
    * runs ([[Corpus.dedupClusters]]): a media item re-encoded or resized
    * k times forms one k-clique of near-identical perceptual hashes, and
    * deduping keeps one member per COMPONENT, not per pair. Output is
    * the per-cluster profile a dedup pass is judged by: member count,
    * edge count, and the worst intra-cluster Hamming distance
    * (max_hamming near the [[phashHammingMax]] threshold flags chains —
    * A~B~C where A,C are NOT near — exactly the transitive-closure
    * artifact to audit before deleting members).
    *
    * Scale shape: min-label propagation over the banded candidate
    * pairs ([[Corpus.components]]: id-keyed joins + localCheckpoint per
    * round, O(log diameter) rounds); the profile is two tiny aggregates
    * on cluster_id. Only pair endpoints enter the loop — singleton
    * media never shuffles. */
  def phashClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.eager(phashDedup(spark, dir))
    val labels = Corpus.components(pairs.select("d1", "d2"))
    val prof = labels.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    val es = pairs.join(labels, pairs("d1") === labels("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_edges"), max("hamming").as("max_hamming"))
    prof.join(es, "cluster_id")
  }

  def phashClustersSql: String =
    s"""WITH RECURSIVE pp AS MATERIALIZED (
       |  SELECT * FROM ($phashDedupSql)
       |), edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM pp
       |  UNION SELECT d2, d1 FROM pp
       |), reach(doc_id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
       |), cl AS (
       |  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1
       |), prof AS (
       |  SELECT cluster_id, count(*) AS n_members FROM cl GROUP BY 1
       |), es AS (
       |  SELECT cl.cluster_id, count(*) AS n_edges, max(pp.hamming) AS max_hamming
       |  FROM pp JOIN cl ON pp.d1 = cl.doc_id GROUP BY 1
       |)
       |SELECT cluster_id, n_members, n_edges, max_hamming
       |FROM prof JOIN es USING (cluster_id)""".stripMargin

  private val radiusCurve = Seq(0, 4, 8, 10)

  /** Hamming-radius sensitivity curve for the perceptual-hash family —
    * the image-side twin of [[Dedup.dedupThresholdCurve]]: pairs (and
    * docs touched) that each dHash radius would declare near-dups, at
    * r = 0 / 4 / 8 / 10. Radii stop at [[phashHammingMax]] because the
    * banded candidate join is pigeonhole-complete only below the band
    * count — a curve past the guarantee would silently undercount, the
    * exact failure mode this engine never ships. One pass over the
    * already-banded pair set; each radius is a conditional count. */
  def phashRadiusCurve(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.eager(phashDedup(spark, dir))
    radiusCurve.map { r =>
      val q = pairs.filter(col("hamming") <= r)
      q.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(q.select(explode(array(col("d1"), col("d2"))).as("d"))
          .agg(countDistinct(col("d")).as("n_docs")))
        .select(lit(r.toLong).as("radius"), col("n_pairs"), col("n_docs"))
    }.reduce(_ unionAll _)
  }

  def phashRadiusCurveSql: String = {
    val legs = radiusCurve.map { r =>
      s"""SELECT $r AS radius, count(*) AS n_pairs,
         |  (SELECT count(DISTINCT d) FROM (
         |    SELECT d1 AS d FROM pp WHERE hamming <= $r
         |    UNION ALL SELECT d2 FROM pp WHERE hamming <= $r)) AS n_docs
         |FROM pp WHERE hamming <= $r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH pp AS MATERIALIZED (
       |  SELECT * FROM ($phashDedupSql)
       |)
       |$legs""".stripMargin
  }
}
