package graft

import graft.operators.TextAnalysis
import graft.streaming.StreamingQualityGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class GateDoc(doc_id: Long, text: String)

/** The streaming fluency gate: (1) scoring the training corpus through
  * the artifact path reproduces the batch lm_perplexity bits EXACTLY;
  * (2) in a live stream, fluent batches pass and injected word salad is
  * rejected in the batch that carries it. */
class StreamingQualityGateSpec extends SparkSpec {
  import spark.implicits._

  test("artifact scoring == batch lm_perplexity on the training corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val (model, fallback) = StreamingQualityGate.lmArtifacts(docs)
    val scored = StreamingQualityGate.scoreBatch(
        docs, model.localCheckpoint(), fallback.localCheckpoint(),
        oov = 99L, maxBitsFp = Long.MaxValue / (1L << 32))
      .select("doc_id", "n_bigrams", "total_bits")
      .as[(Long, Long, Long)].collect().toSet
    val batch = TextAnalysis.lmPerplexity(spark, dir)
      .select("doc_id", "n_bigrams", "total_bits")
      .as[(Long, Long, Long)].collect().toSet
    assert(scored == batch && batch.nonEmpty)
  }

  test("live stream: fluent batch passes, word-salad batch is rejected") {
    implicit val sqlCtx = spark.sqlContext
    val fluent = "the cat sat on the mat and the dog sat on the rug " * 3
    val base = (0L until 50L).map(i => GateDoc(i, fluent)).toDF()
    val (m0, f0) = StreamingQualityGate.lmArtifacts(base)
    val (model, fallback) = (m0.localCheckpoint(), f0.localCheckpoint())
    val oov = StreamingQualityGate.oovBits(base)
    assert(oov >= 1L)

    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Map[Long, Boolean]]()
    val ms = MemoryStream[GateDoc]
    val q = ms.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val out = StreamingQualityGate
          .scoreBatch(b.toDF(), model, fallback, oov, maxBitsFp = 2500000L)
          .select("doc_id", "pass")
          .as[(Long, Boolean)](org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaBoolean))
          .collect().toMap
        perBatch.put(id, out)
        ()
      }.start()
    try {
      ms.addData((100L until 105L).map(i => GateDoc(i, fluent)))
      q.processAllAvailable()
      ms.addData(Seq(GateDoc(200L, fluent),
        GateDoc(201L, "zq xv qjk wpf vnb zzk qqy xxr wwt uup iiv oop")))
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val batches = perBatch.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(batches.length == 2)
    assert(batches(0).values.forall(identity), s"fluent batch rejected: ${batches(0)}")
    assert(batches(1)(200L), "fluent doc rejected in mixed batch")
    assert(!batches(1)(201L), "word salad passed the gate")
  }
}
