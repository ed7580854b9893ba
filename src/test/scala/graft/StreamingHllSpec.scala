package graft

import graft.streaming.{HllEvent, StreamingHll}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The mergeability pin: streaming HLL registers folded across THREE
  * micro-batches must land on the bit-identical estimate the batch
  * audit computes over the same rows — max is order-free, so batch,
  * streaming, and partial-merge all commute to the same registers. */
class StreamingHllSpec extends SparkSpec {
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

  test("streaming register state after 3 batches == batch audit, bit-exact") {
    withRocksDBProvider {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batchRows = graft.operators.Analytics.hllDistinctAudit(spark, dir)
      .select("event_type", "v_zero", "est_raw")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(batchRows.nonEmpty)

    val evs = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"),
        coalesce(col("user_id").cast("string"), lit("__unknown__")).as("user_key"))
      .as[HllEvent].collect()
    val chunks = evs.grouped(math.max(evs.length / 3, 1)).toSeq

    val last = new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()
    val ms = MemoryStream[HllEvent]
    val q = StreamingHll.estimates(ms.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.HllEstimate], _: Long) =>
        b.collect().foreach(e => last.put(e.event_type, (e.v_zero, e.est_raw)))
        ()
      }.start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    assert(last.asScala.toMap == batchRows,
      s"streaming ${last.asScala.toMap} != batch $batchRows")
    }
  }
}
