package graft

import graft.streaming.{AbsAlert, AbsEvent, StreamingAbsence}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The dead-man-switch pin: replay the tiny fixture through three
  * micro-batches plus a watermark-flush sentinel; every batch silence
  * report row (resumed AND trailing) must fire exactly one streaming
  * alert at its deadline, keyed by (key, silent_from) — and nothing
  * else may fire. */
class StreamingAbsenceSpec extends SparkSpec {
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

  test("streaming timer alerts match the batch silence report (day replay)") {
    withRocksDBProvider {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val gapSec = 24L * 3600
    val day = 24L * 3600

    val batch = graft.operators.Detectors.absenceAlerts(spark, dir)
      .select("key", "silent_from", "resumed_at").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(batch.nonEmpty)

    val evs = graft.sources.Tables.events(spark, dir)
      .select(
        coalesce(col("user_id").cast("string"), lit("__unknown__")).as("key"),
        col("ts_sec")).as[AbsEvent].collect().sortBy(_.ts_sec)
    val horizon = evs.map(_.ts_sec).max
    val disorder = java.time.Duration.ofSeconds(60)
    // day-granularity replay: the watermark advances once per day, so a
    // deadline is observed while its key is still silent — the live
    // condition a 3-batch replay compresses away. The sentinel pushes the
    // final watermark past every remaining deadline (own key excluded).
    val sentinel = AbsEvent("__wmflush__", horizon + disorder.getSeconds + 10)
    val chunks = (evs.groupBy(_.ts_sec / day).toSeq.sortBy(_._1).map(_._2)
      :+ Array(sentinel))

    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    val ms = MemoryStream[AbsEvent]
    val q = StreamingAbsence.alerts(ms.toDS(), gapSec, disorder).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AbsAlert], _: Long) =>
        b.collect().foreach { a =>
          assert(a.deadline_sec == a.silent_from + gapSec)
          got.add((a.key, a.silent_from)); ()
        }
        ()
      }.start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val gotReal = got.asScala.toSet.filter(_._1 != "__wmflush__")
    val batchSet = batch.map(b => (b._1, b._2)).toSet

    // EXACT equality: every batch silence report row (resumed AND
    // trailing) fires exactly once, and nothing else fires. Resumed
    // silences no longer depend on the watermark observing the old
    // deadline before the resume arrives — candidates stay buffered until
    // the watermark confirms them — so no completeness margin is needed.
    // (The fixture has no sec-vs-ns boundary gap in (24h, 24h+1s), checked
    // offline, so second-floored streaming matches the ns-compared batch.)
    val trailing = batch.filter(_._3.isEmpty).map(b => (b._1, b._2)).toSet
    assert(gotReal == batchSet,
      s"false alerts: ${(gotReal -- batchSet).take(5)}; " +
        s"missed: ${(batchSet -- gotReal).take(5)}")
    assert(trailing.nonEmpty && trailing.size < batchSet.size,
      "fixture must exercise both trailing and resumed silences")
    }
  }

  test("heartbeat keeps trailing dead-man alerts firing through total silence") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      val now = System.currentTimeMillis() / 1000L
      val gap = 5L
      val ms = MemoryStream[AbsEvent]
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
      // wall-clock live mode: the ONLY real event is 30 s in the past and
      // nothing else ever arrives — without the heartbeat the watermark
      // would stall forever and the dead-man alert could never fire
      val q = StreamingAbsence
        .alertsWithHeartbeat(ms.toDS(), gap, java.time.Duration.ofSeconds(1))
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AbsAlert], _: Long) =>
          b.collect().foreach(a => got.add((a.key, a.silent_from))); ()
        }.start()
      try {
        ms.addData(Seq(AbsEvent("k1", now - 30)))
        val deadline = System.currentTimeMillis() + 90000
        while (!got.contains(("k1", now - 30)) &&
            System.currentTimeMillis() < deadline) Thread.sleep(500)
        assert(got.contains(("k1", now - 30)),
          s"trailing alert never fired; got=$got")
        import scala.jdk.CollectionConverters._
        assert(!got.asScala.exists(_._1 == StreamingAbsence.heartbeatKey),
          "heartbeat alerts must be filtered out")
      } finally q.stop()
    }
  }
}
