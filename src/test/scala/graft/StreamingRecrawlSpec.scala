package graft

import graft.operators.Crawl
import graft.streaming.StreamingRecrawl
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Parity + idempotency theorems for the streaming recrawl state table:
  *  - any in-order micro-batch split of the fetch log yields the batch
  *    operator's schedule byte-for-byte;
  *  - a crash-and-replay of a batch (ledger marker removed, partial
  *    state re-written) changes NOTHING — the per-batchId overwrite
  *    makes growth idempotent, not merely at-least-once. */
class StreamingRecrawlSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("3-batch replay == batch recrawl_schedule; replay is idempotent") {
    val base = Files.createTempDirectory("recrawl_state").toString
    val log = Crawl.fetchLog(spark, dir).cache()
    try {
      val Seq(t40, t80) = log.stat
        .approxQuantile("ts_sec", Array(0.4, 0.8), 0.0).toSeq.map(_.toLong)
      val chunk0 = log.filter(col("ts_sec") <= t40)
      val chunk1 = log.filter(col("ts_sec") > t40 && col("ts_sec") <= t80)
      val chunk2 = log.filter(col("ts_sec") > t80)
      assert(chunk0.count() > 0 && chunk1.count() > 0 && chunk2.count() > 0)

      StreamingRecrawl.initBase(chunk0, base)
      var delivered = 0
      val body = StreamingRecrawl.onBatch(base, (_, _) => delivered += 1)
      body(chunk1, 0L)
      body(chunk2, 1L)
      assert(delivered == 2)

      val want = Crawl.recrawlSchedule(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val got = StreamingRecrawl.schedule(spark, base)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want)

      // crash-and-replay batch 1: remove the ledger marker, run again —
      // the batch=1 partition is overwritten in place, counts unchanged
      val marker = new java.io.File(s"$base/_graft_recrawl_ledger/1")
      assert(marker.exists())
      assert(marker.delete())
      body(chunk2, 1L)
      val replayed = StreamingRecrawl.schedule(spark, base)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(replayed == want)

      // ledger short-circuit: with the marker present the body is a no-op
      body(chunk2, 1L)
      assert(delivered == 3) // replay delivered once more; no-op did not

      // offline compaction: roll batch <= 0 into one partition; the
      // schedule and the partition layout both come out right
      StreamingRecrawl.compact(spark, base, 0L)
      val partitions = new java.io.File(s"$base/state").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(partitions.toSeq == Seq("batch=0", "batch=1"), partitions.toSeq)
      val compacted = StreamingRecrawl.schedule(spark, base)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(compacted == want)

      // and a batch fed AFTER compaction still merges correctly: rebuild
      // from scratch with compaction between batches
      val base2 = Files.createTempDirectory("recrawl_state2").toString
      try {
        StreamingRecrawl.initBase(chunk0, base2)
        val body2 = StreamingRecrawl.onBatch(base2, (_, _) => ())
        body2(chunk1, 0L)
        StreamingRecrawl.compact(spark, base2, 0L)
        body2(chunk2, 1L)
        val got2 = StreamingRecrawl.schedule(spark, base2)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        assert(got2 == want)
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base2))
    } finally {
      log.unpersist(blocking = false)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
