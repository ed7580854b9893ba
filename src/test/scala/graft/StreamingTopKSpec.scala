package graft

import graft.streaming.{SEvent, StreamingDetectors, StreamingTopK, TopKRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming bounded-heap top-k: final snapshots must equal the
  * batch top-k over the same prefix, state must round-trip through
  * RocksDB across batches, and unchanged keys must stay silent. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val k = 3

  test("converges to the batch top-k; silent when nothing changes") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val events = StreamingDetectors
        .toSEvents(graft.sources.Tables.events(spark, dir))
        .collect().toSeq.sortBy(_.eventId)
      val ms = MemoryStream[SEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-topk-ckpt").toString
      val q = StreamingTopK.topK(ms.toDS(), k)
        .writeStream.format("memory").queryName("topk_stream")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        // several micro-batches so state crosses RocksDB round-trips
        events.grouped(97).foreach { g => ms.addData(g); q.processAllAvailable() }
        val beforeReplay = spark.table("topk_stream").count()
        // strictly-dominated events for keys whose top-k is already FULL
        // change nothing: zero new snapshot rows. (A key with < k valued
        // events would admit even a terrible value, so only full keys
        // qualify for this probe.)
        val valued = events.filter(_.fields.contains("value"))
        val fullKeys = valued.groupBy(_.key).collect {
          case (key, rs) if rs.size >= k => key
        }.toSeq.sorted.take(20)
        assert(fullKeys.nonEmpty)
        val dominated = fullKeys.zipWithIndex.map { case (key, i) =>
          SEvent(key, 1000000L + i, 0L, Some(-10000.0))
        }
        ms.addData(dominated)
        q.processAllAvailable()
        assert(spark.table("topk_stream").count() == beforeReplay)

        // latest snapshot per key == batch top-k of everything ingested
        val snaps = spark.table("topk_stream").as[TopKRow].collect()
        // memory sink appends; the last full snapshot per key wins — group
        // by key, keep rows from that key's final emission. Emissions for a
        // key are totally ordered by the sink's arrival order; reconstruct
        // with a per-key fold keyed on sequence.
        val latest = snaps.zipWithIndex.groupBy(_._1.key).map { case (key, rs) =>
          // final emission = rows after the key's last rank-1 row
          val lastStart = rs.filter(_._1.rank == 1).map(_._2).max
          key -> rs.filter(_._2 >= lastStart).map(_._1)
            .sortBy(_.rank).map(r => (r.event_id, r.value)).toSeq
        }
        val want = events.filter(_.fields.contains("value"))
          .map(e => (e.key, e.fields("value"), e.eventId))
          .groupBy(_._1).map { case (key, rs) =>
            key -> rs.sortBy { case (_, v, id) => (-v, id) }.take(k)
              .map { case (_, v, id) => (id, v) }.toSeq
          }
        assert(latest == want)
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
