package graft

import graft.streaming.{AbsAlert, AbsEvent, StreamingAbsence}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Checkpoint-restart continuity for the timer-based dead-man switch: the
  * query is stopped while a per-key deadline timer is ARMED (a's 400 s
  * deadline), and the restarted query must restore state + timer and fire
  * it when the watermark crosses — plus never fire a deadline that a
  * re-arming event deleted. The expected alert set is hand-scripted, so
  * this pins the restore path independently of the batch twin
  * (StreamingAbsenceSpec pins batch equivalence for uninterrupted runs). */
class StreamingAbsenceRestartSpec extends SparkSpec {
  import spark.implicits._

  test("armed timers survive a checkpoint restart") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val gapSec = 100L
      val disorder = java.time.Duration.ofSeconds(10)
      // base offset: a ts of epoch 0 sits AT the initial watermark and is
      // dropped as late before the processor ever sees it (observed)
      val base = 1000000L
      def e(k: String, t: Long) = AbsEvent(k, base + t)
      // chunk structure (wm = max ts seen - 10):
      //  1: arm a@50->150, b@0->100, c@99->199
      //  2: wm 240 crosses b:100, a:150 -> (b,0), (a,50); c re-arms to 350
      //  3: a resumes (arms 400), c re-arms to 480; wm 370 crosses nothing
      //     >>> STOP + RESTART here: a's 400 timer is armed <<<
      //  4: wm 520 crosses a:400 -> (a,300)  [proves the restored timer]
      //  5: sentinel wm 990 crosses c:630 -> (c,530)
      val chunks = Seq(
        Seq(e("a", 0), e("a", 50), e("b", 0), e("c", 0), e("c", 50), e("c", 99)),
        Seq(e("c", 150), e("c", 250)),
        Seq(e("a", 300), e("c", 300), e("c", 380)),
        Seq(e("c", 450), e("c", 530)),
        Seq(e("zz", 1000)))
      val expect = Set(("b", base), ("a", base + 50L), ("a", base + 300L),
        ("c", base + 530L))

      val ms = MemoryStream[AbsEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-absrst").toString
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
      def startQ() = StreamingAbsence.alerts(ms.toDS(), gapSec, disorder)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AbsAlert], _: Long) =>
          b.collect().foreach(a => got.add((a.key, a.silent_from)))
          ()
        }.start()
      var q = startQ()
      try {
        chunks.zipWithIndex.foreach { case (c, i) =>
          ms.addData(c)
          q.processAllAvailable()
          if (i == 2) { q.stop(); q = startQ() }
        }
      } finally q.stop()
      import scala.jdk.CollectionConverters._
      val real = got.asScala.toSet.filter(_._1 != "zz")
      assert(real == expect, s"got $real, want $expect")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
