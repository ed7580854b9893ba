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

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q6: every predicate reaches the scan; only 4 columns read") {
    val plan = formatted("q6_forecast_revenue")
    // all three filter families in PushedFilters on the parquet scan
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_discount"), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
    // pruned read schema: exactly the 4 referenced columns
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(read.contains), read)
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"), read)
  }

  test("q5: every dimension joins as broadcast; at most the agg + fact exchanges") {
    val plan = formatted("q5_local_supplier")
    // count operator DETAIL sections ("(n) OpName") — formatted explain
    // prints each node twice (tree + details), so a raw substring count
    // would double and mask a demotion to a shuffle join
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("BroadcastHashJoin") >= 4, plan) // all 4 dims broadcast
    assert(nodes("SortMergeJoin") == 0 && nodes("ShuffledHashJoin") == 0, plan)
    assert(nodes("Exchange") <= 2, plan) // agg exchange (+ fact join at scale)
  }

  test("q15: the revenue subtree's exchange is reused, not recomputed") {
    // The two legs (scalar max and equality filter) share the revenue
    // definition; making their subtrees canonically identical (mirrored
    // suppkey isNotNull) is what lets exchange reuse fire. AQE decides
    // at runtime, so assert on the executed plan after an action.
    val df = SparkEntry.queries("q15_top_supplier")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"q15 executed plan recomputes the revenue subtree:\n$plan")
  }

  test("q7: both fact legs are pruned by broadcast dim joins before the one shuffle") {
    val plan = formatted("q7_nation_volume")
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    // nation IN-superset pushed: both nation scans carry an In/Or filter
    assert(plan.contains("In(n_name") || plan.contains("Or(EqualTo(n_name"), plan)
    // all dim joins broadcast; exactly the orderkey join + agg may shuffle
    assert(nodes("SortMergeJoin") + nodes("ShuffledHashJoin") <= 1, plan)
    assert(nodes("BroadcastHashJoin") >= 4, plan)
  }

  test("token_rarity: no full-token shuffle — vocab collapses map-side and broadcasts") {
    // The deliberate shape (see tokenRarity's scaladoc): two cheap
    // scans/explodes, vocab partial-agg exchange (near-empty), broadcast
    // probe join. A REPARTITION_BY_COL of the token explode appearing
    // here would mean someone "optimized" it back into shuffling every
    // token row.
    val df = SparkEntry.queries("token_rarity")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("REPARTITION_BY_COL"),
      s"token_rarity shuffles full token rows:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab side did not broadcast at test scale:\n$plan")
  }

  test("corpus_domain_cap: bounded-heap pair, no window, no sort") {
    // The anti-domination gate must stay on TopKPerKey (partial heap ->
    // key exchange -> final heap). A Window/rank regression buffers the
    // hottest domain's whole partition — exactly what the op exists to
    // avoid.
    val plan = formatted("corpus_domain_cap")
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("TopKPerKey") == 2, plan) // partial + final
    assert(nodes("Window") == 0 && nodes("Sort") == 0, plan)
  }

  test("rate_alerts_sliced: one window over (key, slice), never key alone") {
    // The whole point of the sliced form is that no single window
    // partition holds a key's full timeline: the hash exchange and the
    // window spec must both carry (key, slice). A regression to
    // partitioning by key alone silently restores the hot-key straggler
    // while producing identical results — only the plan shows it.
    val plan = formatted("rate_alerts_sliced")
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("Window") == 1, plan)
    val spec = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).mkString("\n")
    assert(spec.contains("key") && spec.contains("slice"),
      s"window spec lost the slice dimension:\n$spec")
  }

  test("q13: orders pre-aggregate below the join (one join row per customer)") {
    // The join must consume count-per-custkey, not raw orders: an
    // aggregate on o_custkey has to sit INSIDE a join child. A regression
    // to join-then-count still returns identical rows but shuffles one
    // row per order into the join — only the plan shows it.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = SparkEntry.queries("q13_custdist")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.size == 1, plan.treeString)
    val preAgg = joins.head.children.exists(_.collectFirst {
      case a: Aggregate if a.groupingExpressions.exists(
        _.references.exists(_.name == "o_custkey")) => a
    }.nonEmpty)
    assert(preAgg, s"orders are not pre-aggregated below the join:\n${plan.treeString}")
  }

  test("gopher_rules: one fused codegen stage — zero exchanges, zero joins") {
    val plan = formatted("gopher_rules")
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("Exchange") == 0, plan)
    assert(!plan.contains("Join"), plan)
    // scan reads only the two referenced columns
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang") && !read.contains("source"), read)
  }

  test("dsir_select: the 1024-row model broadcasts; the corpus never joins big") {
    val plan = formatted("dsir_select")
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("BroadcastHashJoin") >= 1, plan)
    assert(nodes("SortMergeJoin") == 0 && nodes("ShuffledHashJoin") == 0, plan)
  }

  test("lm_perplexity: model joins are term-keyed hash joins, never nested loops") {
    val plan = formatted("lm_perplexity")
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      // the 1-row V aggregate legitimately broadcasts as NLJ
      """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(plan).length <= 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hll_distinct_audit: register aggregation is map-side combined (partial max)") {
    val plan = formatted("hll_distinct_audit")
    // two-phase agg: partial HashAggregate before the exchange means only
    // (type, bkt, max) rows — never raw events — cross the wire
    assert("partial_max|PartialMerge|partial".r.findFirstIn(plan.toLowerCase).isDefined, plan)
  }

  test("bloom_prune_audit: probe is broadcast semi-joins over a pruned fact scan") {
    val probe = graft.operators.Warehouse.bloomProbe(spark, "/root/testdata/sf0.001")
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    // all three position probes broadcast; the fact side never shuffles
    assert(nodes("BroadcastHashJoin") >= 3, plan)
    assert(nodes("SortMergeJoin") == 0 && nodes("ShuffledHashJoin") == 0, plan)
    val read = plan.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("o_orderkey")).get
    assert(read.contains("o_custkey") && !read.contains("o_totalprice"), read)
  }

  test("copurchase_triangles: pair fan-out is an equi-join, never a nested loop") {
    // plan BEFORE the localCheckpoint materializes (checkpoint erases lineage)
    val items = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey")).distinct()
    val pairs = items.as("a").join(items.as("b"), "l_orderkey")
      .filter(org.apache.spark.sql.functions.col("a.l_partkey") <
        org.apache.spark.sql.functions.col("b.l_partkey"))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"pair fan-out lost its equi-join key:\n$plan")
  }

  test("sample_quantile_audit / column_profile / hybrid_rrf run on the bounded heap") {
    Seq("sample_quantile_audit", "column_profile", "hybrid_rrf").foreach { n =>
      val plan = formatted(n)
      assert(plan.contains("TopKPerKey"),
        s"$n lost its bounded-heap ranking:\n$plan")
    }
  }

  test("cusum/holt: one corpus exchange + one series exchange, nothing more") {
    Seq("cusum_alerts", "holt_forecast").foreach { n =>
      val plan = formatted(n)
      def nodes(op: String): Int =
        s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
      // daily agg + per-type series agg; the fold itself must add no
      // exchange (it runs inside the projection over the series array)
      assert(nodes("Exchange") <= 2, s"$n grew an extra exchange:\n$plan")
    }
  }

  test("url_dedup: scan reads ONLY doc_id; one exchange; incremental broadcasts the batch") {
    // the whole URL channel derives from doc_id on the fixture (a real
    // deployment reads its url column instead) — canonicalization is
    // scan-side, so the only exchange is the canon_url window partition
    val plan = formatted("url_dedup")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && !read.contains("text"), read)
    def nodes(p: String, op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(p).length
    assert(nodes(plan, "Exchange") <= 1, plan)
    // the daily shape: batch side small -> broadcast, base aggregated
    // once, NO sort-merge join anywhere
    val inc = formatted("url_dedup_incremental")
    assert(nodes(inc, "BroadcastHashJoin") >= 1, inc)
    assert(nodes(inc, "SortMergeJoin") == 0, inc)
  }

  test("crawl family: broadcast rules, bounded-heap top-k, doc_id-only scans") {
    def nodes(p: String, op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(p).length
    // robots_filter: frontier synthesizes from a doc_id-only scan, the
    // rule table BROADCASTS (never a shuffle join against the frontier),
    // and the only exchange is the per-URL verdict agg
    val rf = formatted("robots_filter")
    val rfRead = rf.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rfRead.contains("doc_id") && !rfRead.contains("text"), rfRead)
    assert(nodes(rf, "BroadcastHashJoin") >= 1, rf)
    assert(nodes(rf, "SortMergeJoin") == 0 && nodes(rf, "ShuffledHashJoin") == 0, rf)
    assert(nodes(rf, "Exchange") <= 1, rf)
    // anchor_topk: the bounded-heap operator plans as partial+final pair
    // around ONE exchange; scan reads only (doc_id, text)
    val at = formatted("anchor_topk")
    assert(nodes(at, "TopKPerKey") == 2, at)
    val atRead = at.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(atRead.contains("doc_id") && atRead.contains("text") &&
      !atRead.contains("lang"), atRead)
    // trap detect: no joins at all — scan-side template + two-level agg
    val td = formatted("crawl_trap_detect")
    assert(nodes(td, "BroadcastHashJoin") + nodes(td, "SortMergeJoin") +
      nodes(td, "ShuffledHashJoin") == 0, td)
    // recrawl_schedule: the one data-scale shape is the page window —
    // a hash exchange, never a global sort
    val rs = formatted("recrawl_schedule")
    assert(nodes(rs, "Window") >= 1 && !rs.contains("rangepartitioning"), rs)
  }

  test("state_forget: kill is a predicate, closure legs read checkpointed RDDs") {
    // The pinned contract (PLANS.md r17): the kill rule evaluates as
    // CASE arms inside each leg's aggregate — so the plan may contain
    // NO join keyed on a kill set (no nested loop anywhere, and the one
    // equi-join is the full-vs-survivor label compare); the dual
    // closure's outputs enter as checkpointed RDD scans (computed once,
    // during construction), never as a re-derivation subtree; and the
    // recrawl leg's events scan reads ONLY the page key column.
    val df = SparkEntry.queries("state_forget")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"state_forget must not plan a nested loop:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"closure legs must read the checkpointed label RDDs:\n$plan")
    val eventScans = plan.linesIterator
      .filter(l => l.contains("events.parquet") && l.contains("ReadSchema"))
      .toSeq
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val evRead = fmt.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains("user_id")).toSeq
    assert(eventScans.nonEmpty || evRead.nonEmpty,
      s"expected an events scan in the plan:\n$fmt")
    (eventScans ++ evRead).foreach { l =>
      assert(!l.contains("value") && !l.contains("event_type"),
        s"recrawl leg must read only the page key column: $l")
    }
    spark.catalog.clearCache()
  }

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
