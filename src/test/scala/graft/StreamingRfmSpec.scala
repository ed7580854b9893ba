package graft

import graft.operators.Analytics
import graft.sources.Tables
import graft.streaming.{RfmEvent, RfmFeatures, StreamingRfm}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming feature accumulator, after replaying the fixture event
  * stream, must hold exactly the batch profile — the associativity of
  * every feature is what makes the equivalence exact, not approximate. */
class StreamingRfmSpec extends SparkSpec {
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

  test("full replay converges to the batch profile; updates emitted per touched user") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts_sec"), col("value"))
        .as[RfmEvent].collect().toSeq.sortBy(_.ts_sec)
      val ms = MemoryStream[RfmEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rfm-ckpt").toString
      val q = StreamingRfm.features(ms.toDS())
        .writeStream.format("memory").queryName("rfm_stream")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        events.grouped(173).foreach { g => ms.addData(g); q.processAllAvailable() }
        // final state per user = the row with the highest n_events
        val got = spark.table("rfm_stream").as[RfmFeatures].collect()
          .groupBy(_.user_id).map { case (u, fs) => u -> fs.maxBy(_.n_events) }
        // batch twin, reshaped to the streaming emission's columns
        val want = Analytics.userRfmFeatures(spark, dir)
          .as[(Long, Long, Option[Double], Long, Long, Option[Double], Long)]
          .collect().map(r => r._1 -> r).toMap
        assert(got.keySet == want.keySet)
        got.foreach { case (u, f) =>
          val w = want(u)
          assert(f.n_events == w._2, s"user $u n")
          assert(f.total_value == w._3, s"user $u total")
          assert(f.last_sec - f.first_sec == w._5, s"user $u span")
          assert(f.active_days == w._7, s"user $u days")
        }
        // intermediate emissions are monotone in n_events per user
        spark.table("rfm_stream").as[RfmFeatures].collect()
          .groupBy(_.user_id).foreach { case (u, fs) =>
            val ns = fs.map(_.n_events).sorted
            assert(ns.distinct.length == ns.length, s"user $u duplicate emission level")
          }
      } finally q.stop()
    }
  }

  test("checkpoint restart mid-replay converges to the identical batch profile") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts_sec"), col("value"))
        .as[RfmEvent].collect().toSeq.sortBy(_.ts_sec)
      val ms = MemoryStream[RfmEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rfm-rst").toString
      val got = new java.util.concurrent.ConcurrentHashMap[Long, RfmFeatures]()
      def startQ() = StreamingRfm.features(ms.toDS())
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RfmFeatures], _: Long) =>
          b.collect().foreach { f =>
            // keep the latest (highest-n) emission per user
            got.merge(f.user_id, f,
              (a, x) => if (x.n_events > a.n_events) x else a)
          }
          ()
        }.start()
      var q = startQ()
      try {
        val groups = events.grouped(211).toSeq
        groups.zipWithIndex.foreach { case (g, i) =>
          ms.addData(g)
          q.processAllAvailable()
          if (i == 1) {
            // kill with per-user value state AND day-map entries live —
            // the restart must restore both stores coherently
            q.stop()
            q = startQ()
          }
        }
      } finally q.stop()
      val want = Analytics.userRfmFeatures(spark, dir)
        .as[(Long, Long, Option[Double], Long, Long, Option[Double], Long)]
        .collect().map(r => r._1 -> r).toMap
      import scala.jdk.CollectionConverters._
      val gotMap = got.asScala
      assert(gotMap.keySet == want.keySet)
      gotMap.foreach { case (u, f) =>
        val w = want(u)
        assert(f.n_events == w._2 && f.total_value == w._3 &&
          f.last_sec - f.first_sec == w._5 && f.active_days == w._7,
          s"user $u diverged after restart")
      }
    }
  }

  test("day counting is exact across batch boundaries (same day split over batches)") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[RfmEvent]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rfm2-ckpt").toString
      val q = StreamingRfm.features(ms.toDS())
        .writeStream.format("memory").queryName("rfm_days")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        val day = 86400L
        ms.addData(Seq(RfmEvent(1L, 10L, Some(1.0)), RfmEvent(1L, 20L, None)))
        q.processAllAvailable()
        ms.addData(Seq(RfmEvent(1L, 30L, Some(2.0)), RfmEvent(1L, day + 5L, Some(3.0))))
        q.processAllAvailable()
        val last = spark.table("rfm_days").as[RfmFeatures].collect()
          .filter(_.user_id == 1L).maxBy(_.n_events)
        assert(last.n_events == 4L && last.active_days == 2L)
        assert(last.total_value.contains(6.0))
        assert(last.first_sec == 10L && last.last_sec == day + 5L)
      } finally q.stop()
    }
  }
}
