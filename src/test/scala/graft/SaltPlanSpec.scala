package graft

import graft.operators.Warehouse
import org.apache.spark.sql.functions._

/** Pins [[Warehouse.saltPlan]]: the map must contain exactly the keys
  * over the per-task target, factors must be the exact ceil-division, and
  * the post-salt bound must actually bound (max_task_rows <= target) —
  * the property a salted aggregation relies on for memory safety.
  */
class SaltPlanSpec extends SparkSpec {

  // sf0.01: the sf0.001 slice's per-key counts sit under the target
  private val dir = "/root/testdata/sf0.01"

  private lazy val plan =
    Warehouse.saltPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("exactly the over-target keys, with exact counts") {
    val t = Warehouse.saltTargetRows
    val counts = graft.sources.Tables.events(spark, dir)
      .select(coalesce(col("user_id").cast("string"), lit("__unknown__")).as("k"))
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hot = counts.filter(_._2 > t)
    assert(plan.map(_._1).toSet == hot.keySet)
    plan.foreach { case (k, n, _, _) => assert(n == hot(k)) }
    assert(plan.nonEmpty, "fixture must have over-target keys")
  }

  test("factor is exact ceil-division and the post-salt bound holds") {
    val t = Warehouse.saltTargetRows
    plan.foreach { case (k, n, factor, maxRows) =>
      assert(factor == (n + t - 1) / t, s"key $k")
      assert(factor >= 2L)
      assert(maxRows == (n + factor - 1) / factor)
      assert(maxRows <= t, s"key $k: post-salt $maxRows exceeds target $t")
    }
  }
}
