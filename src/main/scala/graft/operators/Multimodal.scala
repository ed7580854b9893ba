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
}
