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
