package graft

import graft.model._
import graft.operators.Detectors
import graft.streaming.{DetState, SEvent, StreamingDetectors}
/** Property: the batch (window-function) and streaming (stateful fold)
  * formulations are the SAME engine — for arbitrary event sequences with
  * per-key-distinct second timestamps, the fired (rule, key, event_id)
  * sets are identical. This pins the subtle frame semantics
  * (check-before-insert, strict inequalities, eviction bounds) across
  * both implementations at once. Seeded generator: deterministic runs. */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("thr", "value", 50.0),
    RateRule("rate", "user_id", 30, 2.0),
    StatisticalRule("stat", "value", 4, 1.5))

  test("batch == transformWithState engine for 5 random event sequences") {
    // the full Spark 4 stateful-processor path (RocksDB state, real
    // micro-batches), not just the extracted fold — 5 trials because
    // each runs a streaming query; the 30-trial fold test below covers
    // the state-transition space densely
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val rnd = new scala.util.Random(99)
      (1 to 5).foreach { trial =>
        val n = 5 + rnd.nextInt(40)
        val evs = (0 until n).map { i =>
          SEvent(rnd.nextInt(3).toString, i.toLong, 1000L + i * 7L,
            Some(rnd.nextInt(10000) / 100.0))
        }
        val df = evs.map(e => (e.eventId, e.tsSec, e.key.toLong, e.fields("value")))
          .toDF("event_id", "ts_sec", "user_id", "value")
        val batch = Detectors.allAlerts(df, rules)
          .select("rule_name", "key", "event_id")
          .as[(String, String, Long)].collect().toSet
        implicit val sqlCtx = spark.sqlContext
        val ms = MemoryStream[SEvent]
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-eqtws$trial").toString
        val q = StreamingDetectors.alertsTws(ms.toDS(), rules)
          .writeStream.format("memory").queryName(s"eq_tws_$trial")
          .outputMode("append").option("checkpointLocation", ckpt).start()
        val streamed =
          try {
            evs.grouped(11).foreach { g => ms.addData(g); q.processAllAvailable() }
            spark.table(s"eq_tws_$trial")
              .select("rule_name", "key", "event_id")
              .as[(String, String, Long)].collect().toSet
          } finally q.stop()
        assert(streamed == batch, s"trial $trial")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("batch == streaming fold for 30 random event sequences") {
    val rnd = new scala.util.Random(42)
    (1 to 30).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val rows = List.fill(n)((rnd.nextInt(4).toLong,
        rnd.nextInt(10000) / 100.0))
      // per-key strictly increasing, globally distinct seconds: ties are
      // the one place batch RANGE peers and stream arrival order diverge
      // by design (documented in Detectors.rateAlerts)
      val evs = rows.zipWithIndex.map { case ((k, v), i) =>
        (i.toLong, 1000L + i * 7L, k, v)
      }
      // batch
      val df = evs.toDF("event_id", "ts_sec", "user_id", "value")
      val batch = Detectors.allAlerts(df, rules)
        .select("rule_name", "key", "event_id")
        .as[(String, String, Long)].collect().toSet
      // streaming fold (exactly what flatMapGroupsWithState executes)
      val streamed = evs.groupBy(_._3).toSeq.flatMap { case (_, keyEvs) =>
        var st = DetState(Map.empty, Map.empty)
        keyEvs.sortBy(_._1).flatMap { case (id, ts, k, v) =>
          val (alerts, next) = StreamingDetectors.processEvent(rules,
            SEvent(k.toString, id, ts, Some(v)), st)
          st = next
          alerts.map(a => (a.rule_name, a.key, a.event_id))
        }
      }.toSet
      assert(batch == streamed, s"(trial $trial, events=$evs)")
    }
  }

  test("batch == streaming on >2-decimal values (quantScale contract)") {
    // Pins the ADVICE-flagged divergence: with raw-double streaming
    // moments, a 3-decimal domain could fire in one path and not the
    // other (e.g. sigma==0 history + a 0.004 deviation). Both paths now
    // share the quantized integer-moment sequence, so they must agree at
    // the default scale (where quantization is lossy) AND at quantScale=3
    // (where it is lossless for this domain).
    for (qs <- Seq(2, 3)) {
      val rs: Seq[DetectionRule] = Seq(
        ThresholdRule("thr", "value", 50.0),
        RateRule("rate", "user_id", 30, 2.0),
        StatisticalRule("stat", "value", 4, 1.5, quantScale = qs))
      val rnd = new scala.util.Random(7 + qs)
      (1 to 15).foreach { trial =>
        val n = 1 + rnd.nextInt(40)
        // 3-decimal values, plus sigma==0-prone tiny deviations
        val rows = List.fill(n)((rnd.nextInt(3).toLong,
          if (rnd.nextBoolean()) 10.0 + rnd.nextInt(9) / 1000.0
          else rnd.nextInt(100000) / 1000.0))
        val evs = rows.zipWithIndex.map { case ((k, v), i) =>
          (i.toLong, 1000L + i * 7L, k, v)
        }
        val df = evs.toDF("event_id", "ts_sec", "user_id", "value")
        val batch = Detectors.allAlerts(df, rs)
          .select("rule_name", "key", "event_id")
          .as[(String, String, Long)].collect().toSet
        val streamed = evs.groupBy(_._3).toSeq.flatMap { case (_, keyEvs) =>
          var st = DetState(Map.empty, Map.empty)
          keyEvs.sortBy(_._1).flatMap { case (id, ts, k, v) =>
            val (alerts, next) = StreamingDetectors.processEvent(rs,
              SEvent(k.toString, id, ts, Some(v)), st)
            st = next
            alerts.map(a => (a.rule_name, a.key, a.event_id))
          }
        }.toSet
        assert(batch == streamed, s"(quantScale=$qs trial $trial, events=$evs)")
      }
    }
  }

  test("batch == EVENT-TIME streaming for out-of-order replay (3 trials)") {
    // The event-time mode's whole point (VERDICT r5 #8): arrival order is
    // shuffled with bounded disorder, yet the watermark-driven drain must
    // reproduce the batch (event-time-ordered) alerts exactly. The
    // arrival-order engines would NOT pass this replay.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val rnd = new scala.util.Random(2026)
      (1 to 3).foreach { trial =>
        val n = 20 + rnd.nextInt(25)
        val evs = (0 until n).map { i =>
          SEvent(rnd.nextInt(3).toString, i.toLong, 1000L + i * 7L,
            Some(rnd.nextInt(10000) / 100.0))
        }
        val df = evs.map(e => (e.eventId, e.tsSec, e.key.toLong, e.fields("value")))
          .toDF("event_id", "ts_sec", "user_id", "value")
        val batch = Detectors.allAlerts(df, rules)
          .select("rule_name", "key", "event_id")
          .as[(String, String, Long)].collect().toSet
        // bounded disorder: shuffle arrival inside blocks of 6 events
        // (max displacement 5*7=35 s) < the 60 s watermark delay
        val arrival = evs.grouped(6).flatMap(b => rnd.shuffle(b)).toSeq
        val maxTs = evs.map(_.tsSec).max
        implicit val sqlCtx = spark.sqlContext
        val ms = MemoryStream[SEvent]
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-eqet$trial").toString
        val q = StreamingDetectors.alertsEventTime(ms.toDS(), rules,
            java.time.Duration.ofSeconds(60))
          .writeStream.format("memory").queryName(s"eq_et_$trial")
          .outputMode("append").option("checkpointLocation", ckpt).start()
        val streamed =
          try {
            arrival.grouped(7).foreach { g => ms.addData(g); q.processAllAvailable() }
            // fieldless sentinels on an unused key push the watermark
            // past every real event so the buffers fully drain
            ms.addData(SEvent("zz_flush", n.toLong, maxTs + 1000L))
            q.processAllAvailable()
            ms.addData(SEvent("zz_flush", n.toLong + 1, maxTs + 2000L))
            q.processAllAvailable()
            spark.table(s"eq_et_$trial")
              .select("rule_name", "key", "event_id")
              .as[(String, String, Long)].collect().toSet
          } finally q.stop()
        assert(streamed == batch, s"trial $trial")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("strictness properties: boundary values never fire") {
    // exactly-at-threshold (strict >, ThresholdDetector.java:59)
    val df = Seq((0L, 0L, 1L, 50.0)).toDF("event_id", "ts_sec", "user_id", "value")
    assert(Detectors.thresholdAlerts(df, ThresholdRule("t", "value", 50.0))
      .count() == 0)
    // count exactly == rate threshold (strict >, RateSpikeDetector.java:94)
    val df2 = Seq((0L, 0L, 1L, 1.0), (1L, 1L, 1L, 1.0))
      .toDF("event_id", "ts_sec", "user_id", "value")
    assert(Detectors.rateAlerts(df2, RateRule("r", "user_id", 10, 2.0))
      .count() == 0)
  }
}
