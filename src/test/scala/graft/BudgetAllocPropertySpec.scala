package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property coverage of the Hamilton largest-remainder
  * apportionment inside `crawl_budget_alloc` — checked here as pure
  * integer algebra over random weight/cap tables, against the textbook
  * definition computed independently on the driver:
  *   - uncapped shares (base + bonus) sum EXACTLY to the budget;
  *   - every bonus is 0 or 1, and bonuses go to the largest remainders
  *     (ties by host ascending);
  *   - the cap can only lower a host's quota, never raise another's.
  * The same DataFrame shape as the operator (window over the aggregated
  * host table), so the plan under test is the production one. */
class BudgetAllocPropertySpec extends SparkSpec {
  import spark.implicits._

  private val B = 1000L

  test("random weights/caps: quota == driver-side Hamilton brute force") {
    val seed0 = Seed(1409L)
    var seed = seed0
    def next[A](g: Gen[A]): A = {
      val (v, s2) = (g.pureApply(Gen.Parameters.default, seed), seed.next)
      seed = s2; v
    }
    (0 until 5).foreach { round =>
      val nHosts = next(Gen.choose(3, 60))
      val rows = (0 until nHosts).map { k =>
        (f"h$k%03d", next(Gen.choose(1L, 1000000L)), next(Gen.choose(0L, 60L)))
      }
      // driver-side textbook Hamilton + cap
      val total = rows.map(_._2).sum
      val base = rows.map(r => B * r._2 / total)
      val rem = rows.map(r => B * r._2 % total)
      val leftover = (B - base.sum).toInt
      val bonusIdx = rows.indices
        .sortBy(i => (-rem(i), rows(i)._1)).take(leftover).toSet
      val want = rows.indices.map { i =>
        rows(i)._1 ->
          math.min(base(i) + (if (bonusIdx(i)) 1L else 0L), rows(i)._3)
      }.toMap

      // the operator's plan shape over the same aggregated table
      val df = rows.toDF("host", "rank_fp", "allowed_n")
      val tot = df.agg(sum("rank_fp").as("r_total"))
      val based = df.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"($B * rank_fp) div r_total"))
        .withColumn("rem", expr(s"($B * rank_fp) % r_total"))
      val spent = based.agg(sum("base").as("b_spent"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("rem").desc, col("host").asc)
      val got = based.crossJoin(broadcast(spent))
        .withColumn("rn", row_number().over(w))
        .select(col("host"),
          least(col("base") +
              when(col("rn") <= lit(B) - col("b_spent"), 1L).otherwise(0L),
            col("allowed_n")).as("quota"))
        .as[(String, Long)].collect().toMap

      assert(got == want, s"round $round, n=$nHosts")
      // conservation on the uncapped reconstruction
      assert(base.sum + leftover == B)
      assert(leftover >= 0 && leftover < nHosts)
    }
  }
}
