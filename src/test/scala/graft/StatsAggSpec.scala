package graft

import graft.functions.{MomentBuf, StatsAgg}

/** Pins the typed Aggregator's math against brute force and its
  * merge-order independence (Spark gives no merge-order guarantee). */
class StatsAggSpec extends SparkSpec {

  private val agg = new StatsAgg(2)

  test("matches brute-force mean/population-sigma on a 2-decimal domain") {
    val vs = Seq(12.34, 56.78, 90.12, 3.45, 67.89, 12.34)
    val buf = vs.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    assert(out.n == vs.length)
    val mean = vs.sum / vs.length
    assert(math.abs(out.mean - mean) < 1e-9)
    val sigma = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.length)
    assert(math.abs(out.sigma - sigma) < 1e-9)
  }

  test("merge is associative and commutative (any partition split agrees)") {
    val vs = (1 to 100).map(i => i * 0.37)
    val whole = agg.finish(vs.foldLeft(agg.zero)(agg.reduce))
    (1 until 100 by 13).foreach { cut =>
      val (a, b) = vs.splitAt(cut)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufA, bufB)) == whole)
      assert(agg.finish(agg.merge(bufB, bufA)) == whole)
    }
  }

  test("udaf wiring: groupBy agg over a DataFrame matches direct folds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udaf}
    val rows = Seq((1L, 10.0), (1L, 12.0), (1L, 14.0), (2L, 5.0), (2L, 5.0))
    val stats = udaf(agg)
    val got = rows.toDF("k", "v")
      .groupBy("k").agg(stats(col("v")).as("s"))
      .select(col("k"), col("s.n"), col("s.mean"), col("s.sigma"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, vs) =>
      val o = agg.finish(vs.map(_._2).foldLeft(agg.zero)(agg.reduce))
      (k, o.n, o.mean, o.sigma)
    }
    assert(got.toSeq == want)
  }

  test("finish survives int64-overflowing moment products (BigInt path)") {
    // n=10^6 copies of 30000.00: n*S2 = 9e24 wraps a Long; true sigma = 0
    val buf = MomentBuf(1000000L, 3000000L * 1000000L, 9000000000000L * 1000000L)
    val out = agg.finish(buf)
    assert(out.sigma == 0.0 && !out.sigma.isNaN)
    assert(out.mean == 30000.0)
  }

  test("empty group yields zeros, single value yields sigma 0") {
    assert(agg.finish(agg.zero) == graft.functions.GroupStats(0L, 0.0, 0.0))
    val one = agg.finish(agg.reduce(MomentBuf(0L, 0L, 0L), 41.5))
    assert(one.n == 1 && one.mean == 41.5 && one.sigma == 0.0)
  }
}
