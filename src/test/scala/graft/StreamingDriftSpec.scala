package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DriftDoc(doc_id: Long, text: String)

/** The streaming ingest-drift gate: a clean batch passes silently, a
  * template-flooded batch trips the alarm on exactly the flood term, in
  * the batch that carried it. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta"

  test("flooded micro-batch flags the flood term; clean batches stay silent") {
    implicit val sqlCtx = spark.sqlContext
    val baseDocs = (0L until 60L).map(i => DriftDoc(i, base)).toDF()
    val shares = StreamingDrift.baseShares(baseDocs).localCheckpoint()

    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Seq[String]]()
    val ms = MemoryStream[DriftDoc]
    val q = ms.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val flagged = StreamingDrift.scoreBatch(b.toDF(), shares, thresholdFp = 200000L)
          .select("term").as[String](org.apache.spark.sql.Encoders.STRING)
          .collect().toSeq
        perBatch.put(id, flagged)
        ()
      }.start()
    try {
      ms.addData((100L until 120L).map(i => DriftDoc(i, base)))
      q.processAllAvailable()
      ms.addData((200L until 220L).map(i =>
        DriftDoc(i, base + (" floodterm" * 10))))
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val batches = perBatch.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(batches.length == 2)
    assert(batches(0).isEmpty, s"clean batch flagged: ${batches(0)}")
    assert(batches(1).contains("floodterm"), s"flood missed: ${batches(1)}")
    // the flood also dilutes every base term's share (~10% drift each —
    // genuine drift, visible at lower thresholds); at the 20% threshold
    // only the flood itself crosses
    assert(batches(1) == Seq("floodterm"), s"over-flagging: ${batches(1)}")
  }

  test("batch scoring matches the batch drift operator's arithmetic") {
    // same quantized integer-division share math as Corpus.corpusDrift:
    // score one frame both ways and compare exactly
    val docs = (0L until 30L).map { i =>
      DriftDoc(i, if (i % 2 == 0) base else base + " extra extra")
    }.toDF()
    val shares = StreamingDrift.baseShares(docs)
    val scored = StreamingDrift.scoreBatch(docs, shares, thresholdFp = -1L, minCount = 1L)
      .as[(String, Long, Long, Long, Long)].collect()
    // scoring a frame against its own shares: drift is identically zero
    assert(scored.forall(s => s._3 == s._4 && s._5 == 0L),
      s"self-drift nonzero: ${scored.filter(_._5 != 0L).toSeq}")
  }
}
