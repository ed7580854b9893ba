package graft

import scala.collection.mutable.ListBuffer

import graft.streaming.{AlertSink, SAlert}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once alert delivery (VERDICT r5 §missing 3): a query that dies
  * AFTER its sink delivered a batch but BEFORE Spark wrote the batch's
  * commit-log entry replays that batch on restart — the reference (and a
  * naive Spark Kafka sink) re-publishes the alerts; the ledgered
  * foreachBatch sink must not. */
class StreamingExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  private def alert(rule: String, key: String, ts: Long, id: Long): SAlert =
    SAlert(rule, key, ts, id, 1.0, s"d$id", "{}")

  test("kill after delivery, restart: batch replays, zero duplicate alerts") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SAlert]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eos-ckpt").toString
    val ledger = s"$ckpt/_graft_delivery_ledger"

    val delivered = ListBuffer.empty[(Long, String, String, Long, Long)]
    val sink = AlertSink.idempotent(ledger, (df, batchId) =>
      delivered ++= df.select("rule_name", "key", "ts_sec", "event_id")
        .as[(String, String, Long, Long)].collect()
        .map(t => (batchId, t._1, t._2, t._3, t._4)))

    // crash exactly once, after the sink fully delivered batch 0 (ledger
    // marker written) but before Spark records the batch as committed —
    // the precise window that duplicates alerts with an unledgered sink
    @volatile var crashOnce = true
    def start() = ms.toDS().toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        sink(df, id)
        if (crashOnce && id == 0) {
          crashOnce = false
          throw new RuntimeException("simulated crash before epoch commit")
        }
      }
      .start()

    // batch 0 carries a within-batch identity duplicate: same
    // (rule, key, ts_sec), different event_id -> one delivery, min id
    ms.addData(alert("r1", "u1", 100, 1), alert("r1", "u1", 100, 7),
      alert("r1", "u2", 100, 2))
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    assert(!q1.isActive)
    assert(delivered.size == 2, "batch 0 delivered once, identity-deduped")

    // restart from the same checkpoint: Spark replays batch 0 (offsets
    // logged, commit missing); the ledger must swallow the re-delivery
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(delivered.size == 2, "replayed batch must not re-deliver")

      // and the stream keeps flowing after recovery
      ms.addData(alert("r1", "u1", 200, 9))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(delivered.map(t => (t._2, t._3, t._4)).distinct.size == delivered.size,
      "no duplicate alert identity was ever delivered")
    assert(delivered.toList.map(t => (t._2, t._3, t._4, t._5)).toSet ==
      Set(("r1", "u1", 100L, 1L), ("r1", "u2", 100L, 2L), ("r1", "u1", 200L, 9L)))
  }

  test("dedupIdentity keeps the smallest event_id per identity, schema intact") {
    val in = Seq(alert("r", "k", 1, 5), alert("r", "k", 1, 3), alert("r", "k2", 1, 9))
      .toDS().toDF()
    val out = AlertSink.dedupIdentity(in)
    // min_by widens nullability; names/types/order must be unchanged
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      in.schema.map(f => (f.name, f.dataType)))
    assert(out.select("rule_name", "key", "ts_sec", "event_id")
      .as[(String, String, Long, Long)].collect().toSet ==
      Set(("r", "k", 1L, 3L), ("r", "k2", 1L, 9L)))
  }
}
