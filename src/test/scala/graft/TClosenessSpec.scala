package graft

import graft.operators.Warehouse

/** Pins [[Warehouse.tClosenessAudit]] against a sequential BigInt
  * recompute of the total-variation distance, including the
  * absent-value contribution (a sensitive value missing from a class
  * must add its full global mass — the error a naive inner join makes).
  */
class TClosenessSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val rows = graft.sources.Tables.customer(spark, dir)
    .select("c_nationkey", "c_mktsegment").collect()
    .map(r => (r.getAs[Number](0).longValue, r.getString(1)))

  test("tvd matches the sequential recompute, absent values included") {
    val byCs = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nC = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cntS = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nTotal = rows.length.toLong
    val expected = nC.map { case (nation, nc) =>
      val num = cntS.map { case (seg, cs) =>
        val ccs = byCs.getOrElse((nation, seg), 0L)
        (BigInt(ccs) * nTotal - BigInt(cs) * nc).abs
      }.sum
      nation -> ((nc, num.toLong,
        (num * 1000000 / (BigInt(2) * nc * nTotal)).toLong))
    }
    val got = Warehouse.tClosenessAudit(spark, dir).collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (nation, (size, num, fp, ok)) =>
      val (esize, enum0, efp) = expected(nation)
      assert(size == esize && num == enum0 && fp == efp, s"nation $nation")
      assert(ok == (fp <= 200000L))
    }
    // the audit must discriminate: not all classes at the same distance
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("a class mirroring the global distribution would score zero") {
    // synthetic sanity on the formula itself: cnt_cs/n_c == cnt_s/N for
    // every value implies every |cnt_cs*N - cnt_s*n_c| term is zero
    val cntS = Map("A" -> 60L, "B" -> 40L)
    val nTotal = 100L
    val (nc, ccs) = (10L, Map("A" -> 6L, "B" -> 4L))
    val num = cntS.map { case (s, cs) => (ccs(s) * nTotal - cs * nc).abs }.sum
    assert(num == 0L)
  }
}
