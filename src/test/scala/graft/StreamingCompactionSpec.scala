package graft

import graft.operators.Warehouse
import graft.sources.Tables
import graft.streaming.{ChangeRecord, CompactedState, StreamingCompaction}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming compactor, after replaying the fixture changelog in
  * micro-batches — including an OUT-OF-ORDER replay — must converge to
  * exactly the batch compaction: latest-wins is an associative max under
  * the (ts_ns, event_id) total order, so arrival order cannot matter. */
class StreamingCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

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

  private def fixtureChangelog(): Seq[ChangeRecord] =
    graft.operators.Detectors.prepareEvents(Tables.events(spark, dir))
      .select(col("key"), col("event_id"), col("event_type"),
        col("value"), col("ts_ns"))
      .as[ChangeRecord].collect().toSeq

  private def replay(records: Seq[ChangeRecord], batch: Int,
      name: String): Map[String, CompactedState] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ChangeRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = StreamingCompaction.compact(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      records.grouped(batch).foreach { g => ms.addData(g); q.processAllAvailable() }
      // the view's current row per key = the newest emission
      spark.table(name).as[CompactedState].collect()
        .groupBy(_.key)
        .map { case (k, es) => k -> es.maxBy(e => (e.ts_ns, e.event_id)) }
    } finally q.stop()
  }

  test("in-order and shuffled replays both converge to the batch compaction") {
    withRocksDBProvider {
      val log = fixtureChangelog()
      val want = Warehouse.changelogCompact(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getString(2), r.getLong(4))).toMap

      val inOrder = replay(log.sortBy(r => (r.ts_ns, r.event_id)), 211, "cdc_in_order")
      // deterministic disorder: reverse-interleaved halves across batches
      val (a, b) = log.sortBy(r => (r.ts_ns, r.event_id)).splitAt(log.size / 2)
      val shuffled = replay(b.reverse ++ a, 157, "cdc_shuffled")

      for ((name, got) <- Seq("in-order" -> inOrder, "shuffled" -> shuffled)) {
        val live = got.collect { case (k, s) if s.is_live =>
          // batch emits floor-to-second clocks; the state keeps raw ns
          k -> (s.event_id, s.event_type, Math.floorDiv(s.ts_ns, 1000000000L)) }
        assert(live == want, s"$name replay diverged from batch compaction")
        // tombstoned keys: emitted as retractions, absent from batch
        got.collect { case (k, s) if !s.is_live => k }.foreach { k =>
          assert(!want.contains(k), s"$name: retracted key $k still in batch")
        }
        // every key of the changelog has a verdict
        assert(got.keySet == log.map(_.key).toSet, s"$name key coverage")
      }
    }
  }
}
