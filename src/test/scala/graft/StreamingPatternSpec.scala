package graft

import graft.streaming.{PatAlert, PatEvent, StreamingPattern}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The CEP pin: in-order replay of the tiny fixture through three
  * micro-batches must produce the batch pattern query's alerts exactly —
  * same closing events, same spans. */
class StreamingPatternSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDBProvider(body: => Unit): Unit = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streaming error-burst state == batch pattern query on ordered replay") {
    withRocksDBProvider {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    val batch = graft.operators.Detectors.patternAlerts(spark, dir)
      .select("key", "event_id", "ts_sec", "span_sec").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val evs = graft.sources.Tables.events(spark, dir)
      .select(
        coalesce(col("user_id").cast("string"), lit("__unknown__")).as("key"),
        col("event_id"), col("ts_ns"), col("ts_sec"), col("event_type"))
      .as[PatEvent].collect().sortBy(e => (e.ts_ns, e.event_id))
    val n = evs.length
    val chunks = Seq(evs.slice(0, n / 3), evs.slice(n / 3, 2 * n / 3),
      evs.slice(2 * n / 3, n))

    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Long, Long, Long)]()
    val ms = MemoryStream[PatEvent]
    val q = StreamingPattern.alerts(ms.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[PatAlert], _: Long) =>
        b.collect().foreach { a =>
          assert(a.rule_name == "error_burst")
          got.add((a.key, a.event_id, a.ts_sec, a.span_sec)); ()
        }
        ()
      }.start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == batch,
      s"streaming ${got.size} != batch ${batch.size}")
    assert(batch.nonEmpty)
    }
  }
}
