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
      n_sampled: Long, histogram: Array[Long], frame_md5s: Array[String])

  /** The fixture has no binary table, so media payloads are synthesized
    * deterministically from `documents.text` (UTF-8 bytes). A real
    * deployment replaces this one line with the parquet/av-container scan
    * of an actual binary column — everything downstream is unchanged. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("application/x-graft-demo").as("mime"))

  /** decode -> frame-sample -> feature-extract, one partition at a time. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, payload, mime) =>
          val decoded = stubDecode(payload)
          // byte-value histogram (the "feature vector")
          val hist = new Array[Long](histBuckets)
          var i = 0
          while (i < decoded.length) {
            hist((decoded(i) & 0xff) % histBuckets) += 1
            i += 1
          }
          // frame split + every-kth sampling ("resize"/"frame-sample")
          val nFrames = (decoded.length + frameBytes - 1) / frameBytes
          val sampled = (0 until nFrames by sampleEvery).map { f =>
            val from = f * frameBytes
            val until = math.min(from + frameBytes, decoded.length)
            digest.reset()
            digest.update(decoded, from, until - from)
            digest.digest().map("%02x".format(_)).mkString
          }
          MediaFeature(docId, mime, decoded.length.toLong, nFrames.toLong,
            sampled.size.toLong, hist, sampled.toArray)
        }
      }.toDF()
  }
}
