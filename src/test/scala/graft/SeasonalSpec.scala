package graft

import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins for the seasonal (hour-of-day) baseline detector. */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every flagged event is >3 sigma from its (type, hour) cell; min history holds") {
    val flagged = Analytics.seasonalAlerts(spark, dir)
      .as[(Long, String, Long, Double, Long)].collect()
    assert(flagged.forall(_._5 >= 24), "cell below the 24-row min history")

    // independent local recompute of the cell moments in BigInt
    val all = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        expr("ts_sec div 3600 % 24").as("hr"),
        Analytics.cents(col("value")).as("c"))
      .as[(Long, String, Long, Long)].collect()
    val cells = all.groupBy(r => (r._2, r._3)).map { case (k, rs) =>
      val n = BigInt(rs.length)
      val s1 = rs.map(r => BigInt(r._4)).sum
      val s2 = rs.map(r => BigInt(r._4) * r._4).sum
      k -> (n, s1, s2)
    }
    val byId = all.map(r => r._1 -> r).toMap
    // flagged set == local recompute of the rule, both directions
    val expected = all.filter { r =>
      val (n, s1, s2) = cells((r._2, r._3))
      n >= 24 && {
        val lhs = (BigInt(r._4) * n - s1).abs.toDouble
        val rhs = 3.0 * math.sqrt((n * s2 - s1 * s1).toDouble)
        lhs > rhs
      }
    }.map(_._1).toSet
    assert(flagged.map(_._1).toSet == expected,
      s"flag set mismatch: got ${flagged.length}, want ${expected.size}")
    // and the reported hour really is the event's hour
    flagged.foreach { f => assert(byId(f._1)._3 == f._3) }
  }

  test("plan: baseline broadcast back, no shuffle join, no global sort") {
    val df = Analytics.seasonalAlerts(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("BroadcastHashJoin") >= 1, plan)
    assert(nodes("SortMergeJoin") == 0 && nodes("ShuffledHashJoin") == 0, plan)
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
  }
}
