package graft.tools

import graft.streaming.{AbsAlert, AbsEvent, StreamingAbsence}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev probe: the dead-man switch at state scale — 500k keys, each holding
  * one armed event-time timer (the risk surface of [[StreamingAbsence]] at
  * 10^8 keys is timer storage and mass expiry, not the one-long value
  * state).
  *
  * Script: b0 arms 500k timers (one event per key); b1 re-arms the first
  * 100k (deleteTimer + registerTimer at scale); then the query is STOPPED
  * and restarted from the checkpoint (RocksDB restore must bring back
  * 500k armed timers); b2 is a watermark-flush sentinel that expires ALL
  * of them in one micro-batch (mass-expiry stress). Continuity oracle: an
  * uninterrupted control run of the same batches must produce the
  * IDENTICAL alert multiset (count + order-free hash) — if restore
  * dropped or duplicated a timer, the multisets diverge.
  *
  * Usage: runMain graft.tools.AbsenceScaleBench [nKeys]
  */
object AbsenceScaleBench {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.nonEmpty) args(0).toInt else 500000
    val rearm = nKeys / 5
    val gapSec = 1000L
    val base = 1000000L
    val spark = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def runSeq(label: String, stopAfter: Option[Int]): (Long, Long) = {
      val ms = MemoryStream[AbsEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-absb").toString
      val n = new java.util.concurrent.atomic.AtomicLong
      val h = new java.util.concurrent.atomic.AtomicLong
      def startQ() = StreamingAbsence.alerts(ms.toDS(), gapSec,
          java.time.Duration.ofSeconds(60))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AbsAlert], _: Long) =>
          import org.apache.spark.sql.functions._
          val r = b.toDF().agg(count(lit(1)),
            sum(hash(col("key"), col("silent_from")).cast("long"))).collect()(0)
          n.addAndGet(r.getLong(0))
          h.addAndGet(if (r.isNullAt(1)) 0L else r.getLong(1))
          ()
        }.start()
      var q = startQ()
      try {
        val batches: Seq[Seq[AbsEvent]] = Seq(
          (0 until nKeys).map(i => AbsEvent(s"k$i", base + i % 50)),
          (0 until rearm).map(i => AbsEvent(s"k$i", base + 200)),
          Seq(AbsEvent("zz", base + 200 + gapSec + 1000)))
        batches.zipWithIndex.foreach { case (b, i) =>
          ms.addData(b)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          println(f"[absb] $label%-9s b$i n=${b.size}%7d " +
            f"t=${(System.nanoTime() - t0) / 1e9}%6.2f s alerts=${n.get()}%d")
          if (stopAfter.contains(i)) {
            q.stop()
            val t1 = System.nanoTime()
            q = startQ()
            println(f"[absb] $label%-9s restarted after b$i " +
              f"(${(System.nanoTime() - t1) / 1e9}%5.2f s)")
          }
        }
      } finally q.stop()
      (n.get(), h.get())
    }

    val control = runSeq("ctrl", None)
    val restarted = runSeq("kill", Some(1))
    println(s"[absb] parity control=$control restarted=$restarted " +
      (if (control == restarted) "MATCH" else "*** MISMATCH ***"))
    // every key fires EXACTLY once: a re-arm deletes the first deadline,
    // so the re-armed 100k fire at the new one (the sentinel key's own
    // deadline is never crossed)
    println(s"[absb] expected-alerts check: got ${control._1}, want $nKeys " +
      (if (control._1 == nKeys.toLong) "MATCH" else "*** MISMATCH ***"))
    spark.stop()
  }
}
