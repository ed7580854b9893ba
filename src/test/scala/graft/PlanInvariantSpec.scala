package graft

/** Whole-surface plan invariants — the two classic scale killers must
  * never appear in ANY registered query's physical plan:
  *
  *  - `rangepartitioning` (a global sort: one skewed range spills or
  *    straggles at 100 TB; every ordered result in this engine is
  *    TakeOrdered or an in-partition window sort), and
  *  - `CartesianProduct` (the deliberate all-pairs operators must plan
  *    as broadcast nested-loop over a pruned broadcast side).
  *
  * This is the SCALE_NOTES "full-plan sweep" as a permanent gate: a new
  * query (or a Catalyst behavior change) that sneaks either shape in
  * fails here, not in a production straggler. Note the iteration itself
  * executes the eager pipelines (dedup clusters materialize during
  * query construction) — that is fine; the assertion is on plan text. */
class PlanInvariantSpec extends SparkSpec {

  test("no registered query plans a global sort or a cartesian product") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("rangepartitioning"),
        s"$name plans a global sort:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      spark.catalog.clearCache()
    }
  }
}
