package graft

import graft.operators.{Detectors, Warehouse}

/** Randomized pins for the alert-throttle and MAD-profile operators:
  * 20 seeded trials each against a straightforward Scala brute force —
  * the same style as EquivalenceSpec (deterministic generator, exact
  * set equality; no floating-point tolerance anywhere because both
  * operators are exact-integer by construction). */
class ThrottleMadPropSpec extends SparkSpec {
  import spark.implicits._

  test("throttle == brute-force first-per-bucket for 20 random alert streams") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      val period = Seq(10L, 60L, 600L)(rnd.nextInt(3))
      val rows = (0 until n).map { i =>
        (Seq("r1", "r2")(rnd.nextInt(2)), rnd.nextInt(3).toString,
          1000L + rnd.nextInt(5000).toLong, i.toLong)
      }
      val df = rows.toDF("rule_name", "key", "ts_sec", "event_id")
      val got = Detectors.throttle(df, period)
        .select("rule_name", "key", "ts_sec", "event_id", "n_suppressed")
        .as[(String, String, Long, Long, Long)].collect().toSet
      val expected = rows.groupBy(r => (r._1, r._2, r._3 / period))
        .map { case (_, g) =>
          val first = g.minBy(r => (r._3, r._4))
          (first._1, first._2, first._3, first._4, g.size.toLong - 1)
        }.toSet
      assert(got == expected)
    }
  }

  test("streaming fold: emitted buckets strictly increase across random batch splits") {
    import graft.streaming.{SAlert, StreamingThrottle}
    val rnd = new scala.util.Random(13)
    def mk(ts: Long, id: Long) = SAlert("r", "k", ts, id, 0.0, "", "{}")
    (1 to 20).foreach { _ =>
      val period = Seq(10L, 600L)(rnd.nextInt(2))
      // arbitrary arrival order INCLUDING negative timestamps
      val alerts = (0 until 1 + rnd.nextInt(80)).map { i =>
        mk(rnd.nextInt(4000).toLong - 2000L, i.toLong)
      }
      // random batch split; fold batches through the pure function
      var last = Long.MinValue
      val emitted = scala.collection.mutable.Buffer.empty[SAlert]
      var rest = alerts
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(rest.length)
        val (batch, tail) = rest.splitAt(n)
        val (out, nl) = StreamingThrottle.survivors(last, batch.iterator, period)
        // contract: strictly increasing buckets within and across batches
        val buckets = out.map(_.ts_sec / period)
        assert(buckets == buckets.sorted && buckets.distinct == buckets)
        assert(buckets.forall(_ > last))
        assert(nl == (if (buckets.isEmpty) last else buckets.max))
        emitted ++= out; last = nl; rest = tail
      }
      // across the whole run: at most one emission per bucket, and each
      // emitted alert is the (ts, id)-min of its bucket among the rows
      // seen up to and including its own batch (weaker global property:
      // per-bucket uniqueness is exact; minimality holds per batch)
      val perBucket = emitted.groupBy(_.ts_sec / period)
      assert(perBucket.values.forall(_.size == 1))
    }
  }

  test("madProfile == brute force for 20 random value sets (with nulls)") {
    val rnd = new scala.util.Random(11)
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val k = (s.length - 1) / 2
      if (s.length % 2 == 1) s(k) * 2 else s(k) + s(k + 1)
    }
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(50)
      val rows = (0 until n).map { i =>
        val v = if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(50000) / 100.0 - 50.0)
        (rnd.nextInt(4).toLong, i.toLong, v)
      }
      val df = rows.toDF("user_id", "event_id", "value")
      val got = Warehouse.madProfile(df)
        .as[(Long, Long, Double, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
      val byUser = rows.filter(_._3.isDefined).groupBy(_._1)
      assert(got.keySet == byUser.keySet)
      byUser.foreach { case (u, es) =>
        val cs = es.map(e => math.floor(e._3.get * 100.0 + 0.5).toLong)
        val m2 = med2(cs)
        val devs = cs.map(c => math.abs(c * 2 - m2))
        val mad2 = med2(devs)
        val (_, gn, gmed, gmad, gout) = got(u)
        assert(gn == cs.length)
        assert(gmed == m2.toDouble / 200.0 && gmad == mad2.toDouble / 400.0)
        assert(gout == devs.count(d => d * 2 > mad2 * 3))
      }
    }
  }
}
