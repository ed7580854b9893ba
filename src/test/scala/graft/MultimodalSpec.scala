package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("binary pipeline: schema, frame math, and feature shape") {
    val df = Multimodal.features(spark, dir)
    assert(df.columns.toSeq == Seq("doc_id", "mime", "n_bytes", "n_frames",
      "n_sampled", "hist_csv", "frames_digest"))
    val row = df.filter($"doc_id" === 0L)
      .as[Multimodal.MediaFeature].head()
    val hist = row.hist_csv.split(",").map(_.toLong)
    assert(hist.length == Multimodal.histBuckets)
    assert(hist.sum == row.n_bytes) // every byte lands in a bucket
    val expFrames = (row.n_bytes + Multimodal.frameBytes - 1) / Multimodal.frameBytes
    assert(row.n_frames == expFrames)
    assert(row.n_sampled == (row.n_frames + Multimodal.sampleEvery - 1) / Multimodal.sampleEvery)
    assert(row.frames_digest.length == 32)
  }

  test("deterministic across runs (stubbed decode is stable)") {
    val a = Multimodal.features(spark, dir).orderBy("doc_id")
      .select("doc_id", "n_bytes", "frames_digest").collect().toSeq.map(_.toString)
    val b = Multimodal.features(spark, dir).orderBy("doc_id")
      .select("doc_id", "n_bytes", "frames_digest").collect().toSeq.map(_.toString)
    assert(a == b)
  }

  test("frames: exploded rows cover the sampled stride; digests agree with features") {
    val fr = Multimodal.frames(spark, dir).as[Multimodal.FrameRow].collect()
    val feat = Multimodal.features(spark, dir)
      .select("doc_id", "n_bytes", "n_frames", "n_sampled")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(fr.nonEmpty)
    fr.groupBy(_.doc_id).foreach { case (id, rows) =>
      val (_, nBytes, nFrames, nSampled) = feat(id)
      // one row per every-kth frame, ids are the unsampled indices
      assert(rows.length == nSampled, s"doc $id")
      val sorted = rows.sortBy(_.frame_id)
      assert(sorted.map(_.frame_id).toSeq ==
        (0L until nFrames by Multimodal.sampleEvery.toLong).toSeq)
      sorted.foreach { r =>
        assert(r.f_offset == r.frame_id * Multimodal.frameBytes)
        val expLen = math.min(Multimodal.frameBytes.toLong, nBytes - r.f_offset)
        assert(r.frame_len == expLen, s"doc $id frame ${r.frame_id}")
        assert(r.frame_md5.length == 32)
      }
    }
  }

  test("resize: block means bounded and reproduce from the raw text bytes") {
    val th = Multimodal.resize(spark, dir).as[Multimodal.Thumb].collect()
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(th.length == texts.size)
    th.foreach { t =>
      val bytes = texts(t.doc_id).getBytes("UTF-8")
      assert(t.n_bytes == bytes.length)
      assert(t.n_blocks == (bytes.length + Multimodal.resizeBlock - 1) / Multimodal.resizeBlock)
      val vals = t.thumb_csv.split(",").map(_.toLong)
      assert(vals.length == t.n_blocks)
      // independent replay of the integer block means
      val exp = bytes.grouped(Multimodal.resizeBlock)
        .map(b => b.map(_ & 0xff).map(_.toLong).sum / b.length).toArray
      assert(vals.sameElements(exp), s"doc ${t.doc_id}")
      assert(t.thumb_md5.length == 32)
    }
  }

  test("observe() counters flow through a batch run") {
    import org.apache.spark.sql.Observation
    val obs = Observation("stream_sentinel_events_test")
    val df = graft.sources.Tables.events(spark, dir).observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("events_processed_total"))
    val n = df.count()
    assert(obs.get("events_processed_total") == n)
  }
}
