package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General analytics operators over the TPC-H-ish fixture tables plus the
  * `events` table — the query surface a user of the engine composes with
  * the detection rules (aggregation, joins, top-k, ranking windows,
  * sessionization).
  *
  * Scale design notes (100 TB posture):
  *  - Dimension joins (`region`, `nation`, `supplier`, `customer`) are
  *    explicitly `broadcast()` — at production scale the fact table
  *    (lineitem/events) shuffles zero bytes for them.
  *  - Aggregations are plain `groupBy` — Catalyst plans partial (map-side)
  *    aggregation before the exchange, so the shuffle carries one row per
  *    (partition, group), not per input row.
  *  - Filters sit directly on the scan columns so they push down to
  *    parquet (`PushedFilters` in explain).
  *  - Top-k uses `orderBy.limit(k)` which Spark executes as TakeOrdered
  *    (per-partition heap + driver merge of k rows) — no global sort.
  *
  * Numeric determinism: money sums go through exact DECIMAL casts (double
  * addition is not associative, so a parallel double sum is
  * nondeterministic; decimal addition is exact and order-free). Quantities
  * are integer-valued doubles, whose sums are exact in IEEE double by
  * construction. Event values quantize to integer cents (see
  * [[Detectors.statisticalAlerts]] for the same trick).
  */
object Analytics {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Exact cents of a non-negative 2-decimal measure. Shared with specs
    * so the quantization convention has one definition. */
  private[graft] def cents(c: Column): Column =
    floor(c * 100.0 + 0.5).cast("long")

  /** TPC-H Q1-style pricing summary (reference has no SQL surface; this is
    * part of the engine's general query capability per BASELINE.json's
    * north star). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DecimalType(38, 4)).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
          .cast(DecimalType(38, 4)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order,
      |  sum(l_quantity) / count(*) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style forecast-revenue: the canonical full-pushdown
    * aggregate — every predicate lands in PushedFilters on the scan
    * (shipdate range + discount band + quantity prune via parquet
    * stats), four columns read, partial+final sum around no shuffle at
    * all (single global group). Revenue in exact DECIMAL. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(DecimalType(38, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n"))

  val q6Sql: String =
    """SELECT
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style: top 10 unshipped orders by revenue in one segment.
    * customer is broadcast; the orders≡lineitem join shuffles on the order
    * key. Ties broken by o_orderkey so LIMIT is deterministic. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
        .cast(DecimalType(38, 4)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_orderpriority,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue per nation for one region/year, with the
    * local-supplier constraint (c_nationkey = s_nationkey). All four
    * dimension tables broadcast; only the orders⋈lineitem join shuffles. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val li = Tables.lineitem(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
        .cast(DecimalType(38, 4)).cast("double").as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** Ranking window: top 3 events by value per user (deterministic
    * tie-break on event_id). */
  def topkEventsPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("value").desc, col("event_id"))
    Detectors.prepareEvents(Tables.events(spark, dir))
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("key", "rn", "event_id", "value", "ts_sec")
  }

  val topkSql: String =
    """SELECT * FROM (
      |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |    row_number() OVER (PARTITION BY coalesce(CAST(user_id AS VARCHAR), '__unknown__')
      |      ORDER BY value DESC, event_id) AS rn,
      |    event_id, value, epoch_ns(ts) // 1000000000 AS ts_sec
      |  FROM events WHERE value IS NOT NULL
      |) WHERE rn <= 3""".stripMargin

  /** [[topkEventsPerUser]] re-expressed on the custom bounded-heap
    * operator ([[graft.plans.TopKPerKey]], the tier-(c) stack): no full
    * sort, no WindowExec buffering, map-side k-row reduction before the
    * shuffle. Same rows as the window form (the ordering is total), so
    * the oracle is the window SQL minus the rank column. */
  def topkNative(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey.topK(
      Detectors.prepareEvents(Tables.events(spark, dir))
        .filter(col("value").isNotNull)
        .select("key", "event_id", "value", "ts_sec"),
      keys = Seq(col("key")),
      order = Seq(col("value").desc, col("event_id")),
      k = 3)

  val topkNativeSql: String =
    """SELECT "key", event_id, value, ts_sec FROM (
      |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |    row_number() OVER (PARTITION BY coalesce(CAST(user_id AS VARCHAR), '__unknown__')
      |      ORDER BY value DESC, event_id) AS rn,
      |    event_id, value, epoch_ns(ts) // 1000000000 AS ts_sec
      |  FROM events WHERE value IS NOT NULL
      |) WHERE rn <= 3""".stripMargin

  /** Per-user activity profile: counts, exact total (cents), min/max, and
    * distinct event types. One shuffle; partial aggregation map-side. */
  def userActivity(spark: SparkSession, dir: String): DataFrame =
    Detectors.prepareEvents(Tables.events(spark, dir))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        countDistinct("event_type").as("n_types"),
        min("ts_sec").as("first_sec"),
        max("ts_sec").as("last_sec"))

  val userActivitySql: String =
    """SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
      |  min(value) AS min_value,
      |  max(value) AS max_value,
      |  count(DISTINCT event_type) AS n_types,
      |  min(epoch_ns(ts) // 1000000000) AS first_sec,
      |  max(epoch_ns(ts) // 1000000000) AS last_sec
      |FROM events GROUP BY 1""".stripMargin

  /** Tumbling daily counts per event type — integer day arithmetic. */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day_num", expr("ts_sec div 86400"))
      .groupBy("day_num", "event_type")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("day_value"))

  val dailyCountsSql: String =
    """SELECT epoch_ns(ts) // 1000000000 // 86400 AS day_num, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS day_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Analytic running totals per user (exact integer cumulative sum) plus
    * the previous value — lag/lead surface. */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("key").orderBy("event_id")
    Detectors.prepareEvents(Tables.events(spark, dir))
      .filter(col("value").isNotNull)
      .withColumn("running_value",
        (sum(cents(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double") / 100.0))
      .withColumn("prev_value", lag("value", 1).over(w))
      .select("key", "event_id", "ts_sec", "value", "running_value", "prev_value")
  }

  val runningTotalsSql: String =
    """SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |  event_id, epoch_ns(ts) // 1000000000 AS ts_sec, value,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
      |    PARTITION BY coalesce(CAST(user_id AS VARCHAR), '__unknown__')
      |    ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
      |    AS running_value,
      |  lag(value, 1) OVER (
      |    PARTITION BY coalesce(CAST(user_id AS VARCHAR), '__unknown__')
      |    ORDER BY event_id) AS prev_value
      |FROM events WHERE value IS NOT NULL""".stripMargin

  /** Gap-based sessionization (30 min inactivity closes a session): the
    * classic lag -> boundary flag -> running sum pattern, then per-session
    * aggregates. All integer arithmetic, one shuffle on the key. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("key").orderBy("event_id")
    Detectors.prepareEvents(Tables.events(spark, dir))
      .withColumn("prev_sec", lag("ts_sec", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("key", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_sec").as("start_sec"),
        max("ts_sec").as("end_sec"))
      .withColumn("duration_sec", col("end_sec") - col("start_sec"))
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |    event_id, epoch_ns(ts) // 1000000000 AS ts_sec
      |  FROM events
      |), f AS (
      |  SELECT *, lag(ts_sec, 1) OVER (PARTITION BY "key" ORDER BY event_id) AS prev_sec
      |  FROM e
      |), g AS (
      |  SELECT *, CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 1800
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM f
      |), h AS (
      |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY "key" ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g
      |)
      |SELECT "key", session_id, count(*) AS n_events,
      |  min(ts_sec) AS start_sec, max(ts_sec) AS end_sec,
      |  max(ts_sec) - min(ts_sec) AS duration_sec
      |FROM h GROUP BY 1, 2""".stripMargin

  /** Hierarchical aggregation: ROLLUP over (day, event_type) — the
    * subtotal/grand-total lattice in one pass. */
  def dailyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day_num", expr("ts_sec div 86400"))
      .rollup("day_num", "event_type")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"))

  val dailyRollupSql: String =
    """SELECT epoch_ns(ts) // 1000000000 // 86400 AS day_num, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      |FROM events GROUP BY ROLLUP(1, 2)""".stripMargin

  /** Set operation surface: customers ordering in BOTH 1996 and 1997
    * (INTERSECT distinct semantics). */
  def repeatCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val y96 = o.filter(col("o_orderdate") >= lit("1996-01-01") &&
      col("o_orderdate") < lit("1997-01-01")).select("o_custkey")
    val y97 = o.filter(col("o_orderdate") >= lit("1997-01-01") &&
      col("o_orderdate") < lit("1998-01-01")).select("o_custkey")
    y96.intersect(y97)
  }

  val repeatCustomersSql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |INTERSECT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  /** Anti-join surface: customers with no orders in 1995 (the unscoped
    * variant is vacuously empty on the fixture — every customer orders
    * eventually). */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  val customersNoOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')""".stripMargin

  private val eventTypes = Seq("click", "purchase", "error", "signup", "view")

  /** Pivot surface: per-user event-type count matrix (explicit type list —
    * value discovery would be a nondeterministic extra pass). */
  def userTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val aggs = eventTypes.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    Detectors.prepareEvents(Tables.events(spark, dir))
      .groupBy("key")
      .agg(aggs.head, aggs.tail: _*)
  }

  val userTypePivotSql: String = {
    val cols = eventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n  ")
    s"""SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
       |  $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Skew-tolerant two-phase aggregation: the classic salting rewrite —
    * pre-aggregate on (key, salt) so one hot key spreads over `nSalts`
    * reducers, then combine the partials. Result-identical to the direct
    * groupBy (all aggregates here are algebraic), which the shared oracle
    * proves. At 100 TB this is the pattern for power-law keys; AQE's
    * skew-join handling covers joins, salting covers aggregations. */
  def userActivitySalted(spark: SparkSession, dir: String): DataFrame = {
    val nSalts = 8
    val partial = Detectors.prepareEvents(Tables.events(spark, dir))
      .withColumn("salt", pmod(col("event_id"), lit(nSalts)))
      .groupBy("key", "salt")
      .agg(
        count(lit(1)).as("pn"),
        sum(cents(col("value"))).as("pc"),
        min("value").as("pmin"), max("value").as("pmax"),
        min("ts_sec").as("pfirst"), max("ts_sec").as("plast"))
    partial.groupBy("key")
      .agg(
        sum("pn").as("n_events"),
        (sum("pc").cast("double") / 100.0).as("total_value"),
        min("pmin").as("min_value"), max("pmax").as("max_value"),
        min("pfirst").as("first_sec"), max("plast").as("last_sec"))
  }

  val userActivitySaltedSql: String =
    """SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
      |  min(value) AS min_value,
      |  max(value) AS max_value,
      |  min(epoch_ns(ts) // 1000000000) AS first_sec,
      |  max(epoch_ns(ts) // 1000000000) AS last_sec
      |FROM events GROUP BY 1""".stripMargin

  /** Interpolated p50/p90 per event type over exact cents, computed with
    * an explicit rank/fraction formula rather than the engines' built-in
    * percentile aggregates (whose interpolation op ORDER differs at the
    * ulp level across engines): idx = (n-1)*p decomposed into an integer
    * rank and an exact rational fraction, then a + (b-a)*frac — the same
    * IEEE sequence everywhere. */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy("c", "event_id")
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .withColumn("c", cents(col("value")))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("k50", expr("(n - 1) div 2"))
      .withColumn("f50", (expr("(n - 1) % 2")).cast("double") / 2.0)
      .withColumn("k90", expr("((n - 1) * 9) div 10"))
      .withColumn("f90", (expr("((n - 1) * 9) % 10")).cast("double") / 10.0)
    e.groupBy("event_type")
      .agg(
        max("n").as("n"),
        max(when(col("rn") === col("k50") + 1, col("c"))).as("a50"),
        max(when(col("rn") === col("k50") + 2, col("c"))).as("b50"),
        max(when(col("rn") === col("k90") + 1, col("c"))).as("a90"),
        max(when(col("rn") === col("k90") + 2, col("c"))).as("b90"),
        max("f50").as("f50"), max("f90").as("f90"))
      .withColumn("p50", (col("a50") +
        (coalesce(col("b50"), col("a50")) - col("a50")) * col("f50")) / 100.0)
      .withColumn("p90", (col("a90") +
        (coalesce(col("b90"), col("a90")) - col("a90")) * col("f90")) / 100.0)
      .select("event_type", "n", "p50", "p90")
  }

  val valueQuantilesSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL
      |), r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM e
      |), k AS (
      |  SELECT *,
      |    (n - 1) // 2 AS k50, CAST((n - 1) % 2 AS DOUBLE) / 2.0 AS f50,
      |    ((n - 1) * 9) // 10 AS k90, CAST(((n - 1) * 9) % 10 AS DOUBLE) / 10.0 AS f90
      |  FROM r
      |), g AS (
      |  SELECT event_type, max(n) AS n,
      |    max(CASE WHEN rn = k50 + 1 THEN c END) AS a50,
      |    max(CASE WHEN rn = k50 + 2 THEN c END) AS b50,
      |    max(CASE WHEN rn = k90 + 1 THEN c END) AS a90,
      |    max(CASE WHEN rn = k90 + 2 THEN c END) AS b90,
      |    max(f50) AS f50, max(f90) AS f90
      |  FROM k GROUP BY 1
      |)
      |SELECT event_type, n,
      |  (a50 + (coalesce(b50, a50) - a50) * f50) / 100.0 AS p50,
      |  (a90 + (coalesce(b90, a90) - a90) * f90) / 100.0 AS p90
      |FROM g""".stripMargin

  /** AS-OF join, composed from built-ins (SURVEY custom-operator ladder
    * step (a)): for every `purchase` event, the most recent `click` by
    * the same user at-or-before the purchase time. The classic
    * union-and-carry formulation: tag both streams, sort per user by
    * (time, tag, id) with clicks before purchases at ties, and carry the
    * last click forward with `last(_, ignoreNulls)` over an unbounded
    * preceding frame — one shuffle on the user key, no per-row probing,
    * scales like any window. The oracle states the same semantics as a
    * correlated lookup; only results must match, and the deterministic
    * tie-break (max click ts, then max event_id) makes them identical. */
  def asofClickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Detectors.prepareEvents(Tables.events(spark, dir))
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("tag", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window.partitionBy("key")
      .orderBy("ts_sec", "tag", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("click_event_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts_sec",
        last(when(col("tag") === 0, col("ts_sec")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("click_event_id").isNotNull)
      .select(col("event_id").as("purchase_event_id"), col("key"),
        col("ts_sec").as("purchase_ts_sec"),
        col("click_event_id"), col("click_ts_sec"),
        (col("ts_sec") - col("click_ts_sec")).as("gap_sec"))
  }

  val asofClickAttributionSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |    epoch_ns(ts) // 1000000000 AS ts_sec
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM e WHERE event_type = 'click'),
      |m AS (
      |  SELECT p.event_id AS purchase_event_id, p."key",
      |    p.ts_sec AS purchase_ts_sec,
      |    (SELECT max(c.event_id) FROM c
      |      WHERE c."key" = p."key" AND c.ts_sec = (
      |        SELECT max(c2.ts_sec) FROM c c2
      |        WHERE c2."key" = p."key" AND c2.ts_sec <= p.ts_sec))
      |      AS click_event_id,
      |    (SELECT max(c.ts_sec) FROM c
      |      WHERE c."key" = p."key" AND c.ts_sec <= p.ts_sec) AS click_ts_sec
      |  FROM p
      |)
      |SELECT purchase_event_id, "key", purchase_ts_sec, click_event_id,
      |  click_ts_sec, purchase_ts_sec - click_ts_sec AS gap_sec
      |FROM m WHERE click_event_id IS NOT NULL""".stripMargin

  /** Full grouping lattice: CUBE over (event_type, user bucket) — all four
    * grouping sets in one pass (rollup's superset; Catalyst expands to a
    * single Expand + hash aggregate, so it's one shuffle however many
    * sets). `cents` keeps the sum exact cross-engine. */
  def typeBucketCube(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bucket", expr("user_id % 10"))
      .cube("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"))

  val typeBucketCubeSql: String =
    """SELECT event_type, user_id % 10 AS bucket, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      |FROM events GROUP BY CUBE(1, 2)""".stripMargin

  /** Band (range) join surface: classify each event's value into an
    * inequality-defined band dimension — a non-equi join Spark executes as
    * BroadcastNestedLoopJoin when the band table is broadcast (the only
    * sane physical plan for theta joins: big side streams once, bands stay
    * resident). Bands are half-open [lo, hi). */
  def valueBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      (0L, 0.0, 50.0), (1L, 50.0, 100.0), (2L, 100.0, 200.0),
      (3L, 200.0, 1000.0)
    ).toDF("band_id", "lo", "hi")
    Tables.events(spark, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id", "lo", "hi")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"))
  }

  val valueBandJoinSql: String =
    """WITH bands(band_id, lo, hi) AS (
      |  VALUES (CAST(0 AS BIGINT), 0.0, 50.0), (1, 50.0, 100.0),
      |    (2, 100.0, 200.0), (3, 200.0, 1000.0)
      |)
      |SELECT band_id, lo, hi, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      |FROM events JOIN bands ON value >= lo AND value < hi
      |GROUP BY 1, 2, 3""".stripMargin

  /** Analytic lead/lag surface: per-user delta between consecutive event
    * values. One hash shuffle on user_id; the frame is (lag 1), so state
    * per partition is a single row — trivially scale-safe. Order is
    * (ts, event_id) — event_id is unique, making lag deterministic under
    * equal timestamps. Deltas are exact-cent integer differences
    * re-scaled, so doubles match across engines. */
  def valueLagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_value", lag("value", 1).over(w))
      .filter(col("prev_value").isNotNull)
      .withColumn("delta",
        ((cents(col("value")) - cents(col("prev_value"))).cast("double")) / 100.0)
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        col("value"), col("prev_value"), col("delta"))
  }

  val valueLagDeltaSql: String =
    """SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
      |  value, prev_value,
      |  CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
      |    - CAST(floor(prev_value * 100.0 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS delta
      |FROM (
      |  SELECT event_id, user_id, ts, value,
      |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |  FROM events
      |)
      |WHERE prev_value IS NOT NULL""".stripMargin

  /** Set-operation surface: INTERSECT (users who both clicked and
    * purchased) and EXCEPT (users who signed up but never purchased) in
    * one result, tagged. Spark plans both as aggregate-style
    * hash-partitioned set ops over pruned single-column scans. */
  def funnelSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select("user_id")
    val both = users("click").intersect(users("purchase"))
      .withColumn("cohort", lit("click_and_purchase"))
    val lost = users("signup").except(users("purchase"))
      .withColumn("cohort", lit("signup_no_purchase"))
    both.union(lost).select("cohort", "user_id")
  }

  val funnelSetOpsSql: String =
    """SELECT 'click_and_purchase' AS cohort, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |)
      |UNION ALL
      |SELECT 'signup_no_purchase' AS cohort, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'signup'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |)""".stripMargin

  /** Ranking-bucket surface: users quartiled by exact total spend
    * WITHIN their hash cohort (user_id % 10). The window is partitioned
    * deliberately: a global ntile forces every row onto one task — the
    * classic 100 TB window mistake — while per-cohort quartiles keep the
    * sort distributed (a pipeline needing corpus-global quantile
    * boundaries uses `value_quantiles`-style cutpoints broadcast back
    * instead). ntile ordering is made deterministic by the unique
    * user_id tie-break; spend stays an exact integer-cent sum until the
    * final projection. */
  def userSpendQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(cents(col("value"))).as("spend_cents"))
      .withColumn("cohort", pmod(col("user_id"), lit(10)))
    totals
      .withColumn("quartile",
        ntile(4).over(Window.partitionBy("cohort")
          .orderBy(col("spend_cents").desc, col("user_id"))))
      .withColumn("total_spend", col("spend_cents").cast("double") / 100.0)
      .select("user_id", "cohort", "total_spend", "quartile")
  }

  val userSpendQuartilesSql: String =
    """WITH t AS (
      |  SELECT user_id, user_id % 10 AS cohort,
      |    sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS spend_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |)
      |SELECT user_id, cohort, CAST(spend_cents AS DOUBLE) / 100.0 AS total_spend,
      |  ntile(4) OVER (PARTITION BY cohort
      |    ORDER BY spend_cents DESC, user_id) AS quartile
      |FROM t""".stripMargin

  /** Custom-aggregation surface: per-user (count, mean, population
    * sigma) via the typed [[graft.functions.StatsAgg]] Aggregator,
    * registered with `udaf()` so it drops into a plain `groupBy.agg` —
    * Spark plans it partial-then-final like a built-in (the shuffle
    * carries one 3-long buffer per map-side group, not raw rows). */
  def userValueStats(spark: SparkSession, dir: String): DataFrame = {
    val stats = udaf(new graft.functions.StatsAgg(2))
    Tables.events(spark, dir)
      // primitive-Double aggregator input must be null-free (the typed
      // encoder rejects nulls); mirrored in the SQL twin's WHERE
      .filter(col("value").isNotNull)
      .groupBy("user_id").agg(stats(col("value")).as("s"))
      .select(col("user_id"), col("s.n").as("n"),
        col("s.mean").as("mean"), col("s.sigma").as("sigma"))
  }

  val userValueStatsSql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL
      |)
      |SELECT user_id, count(*) AS n,
      |  CAST(sum(c) AS DOUBLE) / count(*) / 100.0 AS mean,
      |  sqrt(CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE))
      |    / count(*) / 100.0 AS sigma
      |FROM c GROUP BY 1""".stripMargin

  /** Explicit GROUPING SETS surface — the partial lattice cube/rollup
    * can't express: per-type marginals plus (type, day) cells, WITHOUT
    * the day marginal or grand total. One Expand+aggregate pass (rows
    * duplicated once per matching set before the single hash shuffle),
    * same physical shape as the cube. */
  def typeDayGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.groupingSets(
        Seq(Seq(col("event_type")), Seq(col("event_type"), col("day"))),
        col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"))
  }

  val typeDayGroupingSetsSql: String =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (event_type, strftime(ts, '%Y-%m-%d')))""".stripMargin

  /** Per-type audience reach: exact distinct-user count next to event
    * volume. Spark plans count(DISTINCT) as the two-phase distinct-agg
    * expand — partial dedup of (event_type, user_id) map-side, then the
    * final count — so the shuffle carries distinct pairs, not events.
    * The companion HLL sketch path (`approx_count_distinct`, one pass,
    * constant memory per group, mergeable across 1000 executors — what
    * you'd actually run at 100 TB) can't be oracle-hash-checked across
    * engines (different sketch algorithms), so it's pinned by
    * SketchSpec's error-bound test instead. */
  def eventTypeReach(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .withColumn("events_per_user",
        col("n_events").cast("double") / col("n_users"))

  val eventTypeReachSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events,
      |  CAST(count(*) AS DOUBLE) / count(DISTINCT user_id) AS events_per_user
      |FROM events GROUP BY 1""".stripMargin

  /** Relative-standing analytics: percent_rank and cume_dist of every
    * event's value within its type — the remaining classic ranking
    * functions next to row_number/ntile elsewhere in the suite. Both are
    * exact integer ratios ((rank-1)/(n-1), rank'/n) evaluated in double,
    * so they are bit-identical across engines given the total tie-break.
    *
    * Scale shape: one hash shuffle on event_type; within a partition the
    * rank computation is the standard single sort. (The deliberately
    * coarse 5-value key makes this the "few huge groups" stress shape —
    * at 100 TB you'd pre-aggregate or bucket by (type, value-band)
    * before ranking; documented rather than hidden.) */
  def valuePercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
  }

  val valuePercentRankSql: String =
    """SELECT event_id, event_type, value,
      |  percent_rank() OVER (PARTITION BY event_type
      |    ORDER BY value, event_id) AS pct_rank,
      |  cume_dist() OVER (PARTITION BY event_type
      |    ORDER BY value, event_id) AS cume
      |FROM events WHERE value IS NOT NULL""".stripMargin

  /** Time-series gap fill: per-type hourly counts over the COMPLETE hour
    * range — absent (type, hour) cells surface as explicit zeros, which
    * is what any downstream rate/alerting math needs (a missing row and
    * a zero row mean different things to a derivative).
    *
    * Scale shape: the only data-bound stage is the (type, hour) hash
    * aggregate (map-side partial). The dense grid is dimension-sized —
    * hours x types, built from one generator explode off a 1-row global
    * min/max aggregate, never from the raw events — and the final left
    * join is grid-vs-aggregated-counts, both tiny next to the input (AQE
    * broadcasts). All-integer hour keys (ts_ns div), no timestamp types
    * on the wire. */
  def hourlyGapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_sec div 3600 * 3600").as("hour_sec"))
    val counts = ev.groupBy("event_type", "hour_sec").agg(count(lit(1)).as("n"))
    val hours = ev.agg(min("hour_sec").as("lo"), max("hour_sec").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_sec"))
    val types = ev.select("event_type").distinct()
    hours.crossJoin(types)
      .join(counts, Seq("event_type", "hour_sec"), "left")
      .select(col("event_type"), col("hour_sec"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  val hourlyGapfillSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    epoch_ns(ts) // 1000000000 // 3600 * 3600 AS hour_sec
      |  FROM events
      |), c AS (
      |  SELECT event_type, hour_sec, count(*) AS n FROM ev GROUP BY 1, 2
      |), b AS (SELECT min(hour_sec) AS lo, max(hour_sec) AS hi FROM ev),
      |h AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_sec FROM b),
      |t AS (SELECT DISTINCT event_type FROM ev)
      |SELECT t.event_type, h.hour_sec, coalesce(c.n, 0) AS n
      |FROM h CROSS JOIN t
      |LEFT JOIN c ON c.event_type = t.event_type AND c.hour_sec = h.hour_sec""".stripMargin

  /** Ordered-step conversion funnel: signup, then a click strictly AFTER
    * the first signup, then a purchase strictly after that click — order
    * matters, unlike the set-intersection funnel ([[funnelSetOps]]).
    * Comparisons run on the exact nanosecond clock (`ts_ns`).
    *
    * Scale shape: each stage is filter -> per-user min -> equi-join on
    * user_id; every join's right side is the previous stage's aggregate
    * (one row per surviving user, monotonically shrinking), so AQE
    * broadcasts stages 2-3 while the event scans stay pruned to
    * (user_id, ts_ns) + a pushed event_type filter. */
  def funnelOrdered(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts_ns")
    // s1 feeds three subtrees of the final union (its own count, s2, and
    // transitively s3) and s2 feeds two — eager materialization keeps each
    // stage's event scan + aggregate single-execution (the
    // multiple-subtrees-of-one-action trap; the materialized frames are
    // one row per surviving user, so the cache is tiny)
    val s1 = Dedup.eager(ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_ns").as("t1")))
    val s2 = Dedup.eager(ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts_ns") > col("t1"))
      .groupBy("user_id").agg(min("ts_ns").as("t2")))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts_ns") > col("t2"))
      .groupBy("user_id").agg(min("ts_ns").as("t3"))
    def cnt(df: DataFrame, step: Int, stage: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(stage).as("stage"), col("n_users"))
    cnt(s1, 1, "signup")
      .unionAll(cnt(s2, 2, "signup>click"))
      .unionAll(cnt(s3, 3, "signup>click>purchase"))
  }

  val funnelOrderedSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, min(epoch_ns(ts)) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND epoch_ns(ts) > t1 GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, min(epoch_ns(ts)) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND epoch_ns(ts) > t2 GROUP BY 1
      |)
      |SELECT 1 AS step, 'signup' AS stage, count(*) AS n_users FROM s1
      |UNION ALL
      |SELECT 2, 'signup>click', count(*) FROM s2
      |UNION ALL
      |SELECT 3, 'signup>click>purchase', count(*) FROM s3""".stripMargin

  /** Weekly cohort retention: users grouped by first-activity day, then
    * distinct actives per (cohort day, whole weeks since) — the classic
    * retention triangle. All-integer day arithmetic on the exact clock.
    *
    * Scale shape: two hash shuffles — the per-user min (map-side partial)
    * and the (cohort, offset) distinct-count (two-phase distinct expand).
    * The cohort join fans events against a one-row-per-user aggregate on
    * the same user_id key. */
  def userRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_sec div 86400").as("day_num"))
    val cohorts = ev.groupBy("user_id").agg(min("day_num").as("cohort_day"))
    ev.join(cohorts, "user_id")
      .withColumn("week_offset", expr("(day_num - cohort_day) div 7"))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
  }

  val userRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day_num
      |  FROM events
      |), c AS (SELECT user_id, min(day_num) AS cohort_day FROM ev GROUP BY 1)
      |SELECT cohort_day, (day_num - cohort_day) // 7 AS week_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM ev JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Seasonal-baseline anomaly detection: flag events whose value sits
    * more than 3 sigma from the mean OF ITS OWN (event_type, hour-of-day)
    * cell. The diurnal companion to the reference's trailing-window
    * statistical rule ([[Detectors.statisticalAlerts]]): a $250 charge at
    * 3 am is anomalous even when the 24 h trailing window says otherwise,
    * because the right baseline is "3 am traffic", not "recent traffic".
    *
    * Exactness: cents-quantized integer moments per cell (order-free
    * exact sums), and the sigma test is cross-multiplied so no division
    * ever happens: |c*n - s1| > 3*sqrt(n*s2 - s1^2), LHS an exact long
    * cast to double, RHS a single deterministic sqrt of an exact long.
    * Documented long-range bound (same contract as the q18 cents sum):
    * cents^2 * n < 2^63 per cell — at max |value| ~ 5e4 cents that is
    * ~3.7e9 rows per (type, hour) cell; past that the moment columns
    * switch to decimal(38,0).
    *
    * Scale shape: the baseline is one map-combinable hash agg whose key
    * space (|types| x 24) cannot concentrate, broadcast back against a
    * second column-pruned scan — the same two-scan global-baseline shape
    * as `above_mean_events`, with no window function and no shuffle of
    * the event stream itself. `hr` derives from ts_sec by integer
    * arithmetic (div/mod), not timezone functions, identically in both
    * engines. */
  /** Shared prep for the batch query and its streaming twin
    * ([[graft.streaming.StreamingSeasonal]]): cell key + exact cents. */
  private[graft] def seasonalPrep(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts_sec"), col("value"))
      .withColumn("hr", (expr("ts_sec div 3600") % 24).cast("long"))
      .withColumn("c", cents(col("value")))

  /** The trained artifact: exact integer moments per (event_type, hr)
    * cell — what a production deployment persists and refreshes offline. */
  private[graft] def seasonalBaseline(prep: DataFrame): DataFrame =
    prep.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))

  /** The scoring side, shared verbatim with the streaming twin so the
    * two cannot drift: broadcast baseline join + the division-free
    * 3-sigma test. */
  private[graft] def seasonalScore(prep: DataFrame, base: DataFrame): DataFrame =
    prep.join(broadcast(base), Seq("event_type", "hr"))
      .filter(col("n") >= 24 &&
        abs(col("c") * col("n") - col("s1")).cast("double") >
          lit(3.0) * sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double")))
      .select(col("event_id"), col("event_type"), col("hr"), col("value"),
        col("n").as("n_base"))

  def seasonalAlerts(spark: SparkSession, dir: String): DataFrame = {
    val prep = seasonalPrep(Tables.events(spark, dir))
    seasonalScore(prep, seasonalBaseline(prep))
  }

  val seasonalAlertsSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, epoch_ns(ts) // 1000000000 AS ts_sec, value
      |  FROM events WHERE value IS NOT NULL
      |), c AS (
      |  SELECT *, (ts_sec // 3600) % 24 AS hr,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM e
      |), b AS (
      |  SELECT event_type, hr, count(*) AS n, CAST(sum(c) AS BIGINT) AS s1,
      |    CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM c GROUP BY 1, 2
      |)
      |SELECT c.event_id, c.event_type, c.hr, c.value, b.n AS n_base
      |FROM c JOIN b USING (event_type, hr)
      |WHERE b.n >= 24 AND
      |  CAST(abs(c.c * b.n - b.s1) AS DOUBLE) >
      |    3.0 * sqrt(CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE))""".stripMargin

  /** Per-user RFM feature table — the feature-engineering shape an ML
    * scoring pipeline materializes (recency / frequency / monetary plus
    * timeline-span statistics): events aggregated once per user, with
    * recency measured against the corpus clock (the global max ts, a
    * 1-row broadcast aggregate, same shape as `above_mean_events`).
    *
    * Exactness: counts/cents/seconds are exact integers; the two
    * emitted doubles are a /100.0 presentation and one exact-integer
    * division (span / (n-1)), both single correctly-rounded IEEE ops.
    * Scale shape: ONE map-combinable hash agg on user_id (the distinct
    * day-count folds into the same exchange via the (user, day)
    * pre-dedup Spark plans for count distinct), one broadcast of the
    * 1-row clock — no windows, no second event shuffle. */
  def userRfmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_sec"), col("value"),
        expr("ts_sec div 86400").as("day_num"))
    val clock = ev.agg(max("ts_sec").as("now_sec"))
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"),
        min("ts_sec").as("first_sec"), max("ts_sec").as("last_sec"),
        countDistinct(col("day_num")).as("active_days"))
      .crossJoin(broadcast(clock))
      .select(col("user_id"), col("n_events"), col("total_value"),
        (col("now_sec") - col("last_sec")).as("recency_sec"),
        (col("last_sec") - col("first_sec")).as("span_sec"),
        when(col("n_events") >= 2,
          (col("last_sec") - col("first_sec")).cast("double") /
            (col("n_events") - 1).cast("double")).as("mean_gap_sec"),
        col("active_days"))
  }

  val userRfmFeaturesSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec, value,
      |    epoch_ns(ts) // 1000000000 // 86400 AS day_num
      |  FROM events WHERE user_id IS NOT NULL
      |), clock AS (SELECT max(ts_sec) AS now_sec FROM e),
      |a AS (
      |  SELECT user_id, count(*) AS n_events,
      |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |      AS total_value,
      |    min(ts_sec) AS first_sec, max(ts_sec) AS last_sec,
      |    count(DISTINCT day_num) AS active_days
      |  FROM e GROUP BY 1
      |)
      |SELECT user_id, n_events, total_value,
      |  clock.now_sec - last_sec AS recency_sec,
      |  last_sec - first_sec AS span_sec,
      |  CASE WHEN n_events >= 2 THEN
      |    CAST(last_sec - first_sec AS DOUBLE) / CAST(n_events - 1 AS DOUBLE)
      |  END AS mean_gap_sec,
      |  active_days
      |FROM a CROSS JOIN clock""".stripMargin

  private val hllM = 64L // 2^6 registers; std err ~1.04/sqrt(64) = 13%
  private val hllAlpha = 0.709 // the HLL alpha_m constant for m = 64

  /** PORTABLE HyperLogLog distinct-count audit — the answer to
    * [[eventTypeReach]]'s scaladoc caveat that Spark's built-in
    * `approx_count_distinct` sketch cannot be hash-compared across
    * engines: this one can, because every register operation is exact
    * integer math over the engine-portable [[Dedup.h60]] hash. Per
    * event type: the HLL raw estimate from m=64 registers NEXT TO the
    * exact distinct count and the relative error — the sketch-accuracy
    * audit shape ([[Dedup.minhashAccuracy]] precedent) that tells a
    * 100 TB deployment whether the constant-memory path is safe per
    * group.
    *
    *  - register: bkt = h % 64, rho = leading-zero count of the
    *    remaining 54-bit window + 1 = 55 − bitlength (integer, via
    *    `bin()`); per-(type, bkt) MAX is order-free — the MERGEABLE
    *    sketch property that makes HLL the 1000-executor cardinality
    *    tool (map-side partial max, 64 longs per group crossing the
    *    wire, vs the exact path's distinct-pair shuffle).
    *  - harmonic denominator in fixed point: Σ_b 2^(50−M_b) as exact
    *    longs (empty registers contribute 2^50; 2^50 rather than 2^60
    *    keeps the 64-register sum under 2^57 — no int64 overflow — and
    *    both engines truncate the >>-beyond-50 tail identically, a
    *    <2^-44 relative perturbation), so the only float ops
    *    are the final constant multiply and ONE division — identical
    *    bits either engine; `ln`-based small-range correction is
    *    deliberately omitted (house no-transcendentals rule), which the
    *    audit itself justifies: rel_err is reported, not assumed. */
  def hllDistinctAudit(spark: SparkSession, dir: String): DataFrame = {
    val key = coalesce(col("user_id").cast("string"), lit("__unknown__"))
    val h = Dedup.h60(lit("hll"), key)
    val regs = Tables.events(spark, dir)
      // `div`, not `/`: Column./ on longs is DOUBLE division, and h
      // reaches 2^60 — the 54-bit quotient would round in the mantissa
      // and could flip a register's bit length at dyadic boundaries
      .withColumn("h", h)
      .select(col("event_type"), (col("h") % hllM).as("bkt"),
        expr(s"h div $hllM").as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w"))).cast("long")))
      .groupBy("event_type", "bkt").agg(max("rho").as("mx"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftright(1125899906842624, mx)")).as("s_present"))
      .withColumn("s",
        col("s_present") + (lit(hllM) - col("n_regs")) * 1125899906842624L)
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(coalesce(col("user_id").cast("string"),
        lit("__unknown__"))).as("n_exact"))
    regs.join(broadcast(exact), "event_type")
      .select(col("event_type"), lit(hllM).as("m"), col("n_exact"),
        (lit(hllM) - col("n_regs")).as("v_zero"),
        (lit(hllAlpha) * lit(4096.0) * lit(1.125899906842624e15)
          / col("s").cast("double")).as("est_raw"))
      .withColumn("rel_err",
        abs(col("est_raw") - col("n_exact").cast("double"))
          / col("n_exact").cast("double"))
  }

  val hllDistinctAuditSql: String =
    s"""WITH k AS (
       |  SELECT event_type,
       |    ${Dedup.h60Sql("'hll'", "coalesce(CAST(user_id AS VARCHAR), '__unknown__')")} AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h % $hllM AS bkt,
       |    CASE WHEN h // $hllM = 0 THEN 55
       |      ELSE 55 - length(bin(h // $hllM)) END AS rho
       |  FROM k
       |), mr AS (
       |  SELECT event_type, bkt, max(rho) AS mx FROM r GROUP BY 1, 2
       |), s AS (
       |  SELECT event_type, count(*) AS n_regs,
       |    CAST(sum(1125899906842624 >> mx) AS BIGINT)
       |      + ($hllM - count(*)) * 1125899906842624 AS s
       |  FROM mr GROUP BY 1
       |), x AS (
       |  SELECT event_type,
       |    count(DISTINCT coalesce(CAST(user_id AS VARCHAR), '__unknown__'))
       |      AS n_exact
       |  FROM events GROUP BY 1
       |), e AS (
       |  SELECT s.event_type, CAST($hllM AS BIGINT) AS m, x.n_exact,
       |    $hllM - n_regs AS v_zero,
       |    CAST($hllAlpha AS DOUBLE) * CAST(4096 AS DOUBLE)
       |      * CAST(1125899906842624 AS DOUBLE) / CAST(s AS DOUBLE)
       |      AS est_raw
       |  FROM s JOIN x ON s.event_type = x.event_type
       |)
       |SELECT event_type, m, n_exact, v_zero, est_raw,
       |  abs(est_raw - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
       |    AS rel_err
       |FROM e""".stripMargin

  /** EWMA smoothing horizon: weights 2^(20-j) for lag j = 1..20, i.e. a
    * half-life of one event with the geometric tail truncated at 20 lags
    * (the dropped tail mass is 2^-20 of the total — below cent
    * resolution). Truncation is what keeps the state exact AND windowable:
    * untruncated EWMA is a sequential fold, 20-lag EWMA is a fixed set of
    * `lag()` reads off one frame buffer. */
  private val ewmaLags = 20

  /** EWMA spike score: each event's value against the exponentially-
    * weighted moving average of its key's previous 20 values — the
    * classic monitoring baseline (recent behavior dominates, old behavior
    * decays geometrically), as the trailing companion of the equal-weight
    * statistical rule. All integer: values quantize to cents, the
    * weighted sum keeps the 2^(20-j) weights explicit (`ewma_num` /
    * `ewma_w` are exact longs; the baseline is their quotient), and the
    * 3×-baseline spike test cross-multiplies (`v*w > 3*num`) so no
    * division ever happens in either engine.
    *
    * Plan: ONE window (partition by key, order by time) computing twenty
    * `lag()` reads from the same frame buffer — a single sort-based
    * WindowExec after a single hash exchange, constant memory per row.
    * At 100 TB this is the same shape as `value_lag_delta`: the shuffle
    * carries (key, ts, cents) only. */
  def ewmaAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("ts_ns", "event_id")
    val lags = (1 to ewmaLags).map(j => lag(col("v_cents"), j).over(w) -> (1L << (ewmaLags - j)))
    val num = lags.map { case (c, wt) => coalesce(c, lit(0L)) * lit(wt) }.reduce(_ + _)
    val den = lags.map { case (c, wt) => when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    Detectors.prepareEvents(Tables.events(spark, dir))
      .filter(col("value").isNotNull)
      .select(col("key"), col("event_id"), col("ts_ns"), col("ts_sec"),
        cents(col("value")).as("v_cents"))
      .withColumn("ewma_num", num)
      .withColumn("ewma_w", den)
      .withColumn("is_spike",
        col("ewma_w") > 0 && col("v_cents") * col("ewma_w") > lit(3L) * col("ewma_num"))
      .drop("ts_ns")
  }

  val ewmaAnomalySql: String = {
    val num = (1 to ewmaLags)
      .map(j => s"coalesce(lag(v_cents, $j) OVER w, 0) * ${1L << (ewmaLags - j)}")
      .mkString(" + ")
    val den = (1 to ewmaLags)
      .map(j => s"CASE WHEN lag(v_cents, $j) OVER w IS NOT NULL THEN ${1L << (ewmaLags - j)} ELSE 0 END")
      .mkString(" + ")
    s"""SELECT "key", event_id, ts_sec, v_cents, ewma_num, ewma_w,
       |  (ewma_w > 0 AND v_cents * ewma_w > 3 * ewma_num) AS is_spike
       |FROM (
       |  SELECT "key", event_id, ts_sec, v_cents,
       |    $num AS ewma_num,
       |    $den AS ewma_w
       |  FROM (
       |    SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
       |      event_id, epoch_ns(ts) AS ts_ns,
       |      epoch_ns(ts) // 1000000000 AS ts_sec,
       |      CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents
       |    FROM events WHERE value IS NOT NULL)
       |  WINDOW w AS (PARTITION BY "key" ORDER BY ts_ns, event_id))""".stripMargin
  }

  // ------------------------------------------------- KMV (bottom-k) sketch

  /** KMV sketch size. 64 keeps the estimate within ~1/sqrt(62) ≈ 13%
    * and the whole audit readable; production tiers use k = 1024+. */
  private val kmvK = 64

  /** 48-bit salted hash of the event key, the KMV value space: md5-derived
    * (portable — `conv(hex,16,10)` == `('0x'||hex)::BIGINT`), uniform on
    * [0, 2^48). */
  private def kmvHash(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key)), 1, 12), 16, 10).cast("long")

  /** The per-type KMV sketch: the [[kmvK]] smallest DISTINCT key hashes.
    * Bottom-k runs on the native bounded-heap operator — each map task
    * reduces its partition to k rows before the exchange, the mergeable-
    * summary property that lets a 1000-executor job ship k rows per
    * group per task instead of its users. */
  private def kmvSketch(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey.topK(
      Detectors.prepareEvents(Tables.events(spark, dir))
        .select(col("event_type"), kmvHash(col("key")).as("h")).distinct(),
      keys = Seq(col("event_type")),
      order = Seq(col("h")),
      k = kmvK)

  private val kmvSketchSql: String =
    s"""kh AS (
       |  SELECT DISTINCT event_type,
       |    CAST(('0x' || substr(md5('kmv:' ||
       |      coalesce(CAST(user_id AS VARCHAR), '__unknown__')), 1, 12))
       |      AS BIGINT) AS h
       |  FROM events
       |), sk AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM kh)
       |  WHERE rn <= $kmvK
       |)""".stripMargin

  // (k-1) * 2^48: both factors exactly double-representable (7 sig bits)
  private val kmvNum: Long = (kmvK - 1).toLong << 48

  /** KMV (k-minimum-values / bottom-k theta) distinct-count audit — the
    * third mergeable cardinality tier next to [[hllDistinctAudit]] (HLL:
    * smaller, union-only) and exact countDistinct: a KMV sketch also
    * supports INTERSECTION estimates ([[kmvTypeOverlap]]), which HLL
    * fundamentally cannot. Estimator: (k-1) / θ with θ = h_k / 2^48
    * (Beyer et al. 2007, the unbiased form); a group with fewer than k
    * distinct keys is exact by definition. `rel_err` is REPORTED next to
    * the exact count, never assumed. All sketch math is integer; the one
    * division runs on exactly-representable doubles, bit-identical in
    * any engine. */
  def kmvDistinctAudit(spark: SparkSession, dir: String): DataFrame = {
    val sk = kmvSketch(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
    val exact = Detectors.prepareEvents(Tables.events(spark, dir))
      .groupBy("event_type").agg(countDistinct(col("key")).as("n_exact"))
    exact.join(broadcast(sk), "event_type")
      .withColumn("est",
        when(col("n_kept") < kmvK, col("n_exact").cast("double"))
          .otherwise(lit(kmvNum.toDouble) / col("kth").cast("double")))
      .withColumn("rel_err",
        abs(col("est") - col("n_exact").cast("double")) / col("n_exact").cast("double"))
  }

  val kmvDistinctAuditSql: String =
    s"""WITH $kmvSketchSql, s AS (
       |  SELECT event_type, count(*) AS n_kept, max(h) AS kth
       |  FROM sk GROUP BY 1
       |), x AS (
       |  SELECT event_type,
       |    count(DISTINCT coalesce(CAST(user_id AS VARCHAR), '__unknown__'))
       |      AS n_exact
       |  FROM events GROUP BY 1
       |), e AS (
       |  SELECT x.event_type, x.n_exact, s.n_kept, s.kth,
       |    CASE WHEN s.n_kept < $kmvK THEN CAST(x.n_exact AS DOUBLE)
       |      ELSE CAST($kmvNum AS DOUBLE) / CAST(s.kth AS DOUBLE) END AS est
       |  FROM x JOIN s ON x.event_type = s.event_type
       |)
       |SELECT event_type, n_exact, n_kept, kth, est,
       |  abs(est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
       |FROM e""".stripMargin

  /** Audience-overlap estimation from KMV sketches — "how many users did
    * BOTH click and purchase", answered per type pair WITHOUT touching
    * the raw data twice: the union sketch of two KMV sketches is the
    * bottom-k of their merged hash sets, and |A∩B| ≈ ρ/θ_u where ρ
    * counts union-sketch members present in both input sketches (the
    * theta-sketch intersection, Dasgupta et al. 2016). This is the
    * operation HLL cannot do (inclusion-exclusion on HLL explodes the
    * error on small intersections) and the reason production systems
    * keep theta/KMV sketches next to HLL counters.
    *
    * Everything after the per-type sketches touches <= k rows per pair:
    * the pair fan-out joins the 5-type sketch table (tiny, broadcast)
    * and the exact intersection audit — the expensive part, O(distinct
    * pairs) — is the AUDIT, not the estimator; at 100 TB you ship only
    * the k-row sketches. */
  def kmvTypeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sk = Dedup.eager(kmvSketch(spark, dir))
    val pairs = sk.select(col("event_type").as("type_a")).distinct()
      .crossJoin(sk.select(col("event_type").as("type_b")).distinct())
      .filter(col("type_a") < col("type_b"))
    // union multiset with membership flags, folded per distinct hash
    val u = pairs.join(sk.as("s"), col("s.event_type") === col("type_a"))
      .select(col("type_a"), col("type_b"), col("h"), lit(1L).as("fa"), lit(0L).as("fb"))
      .unionByName(pairs.join(sk.as("s"), col("s.event_type") === col("type_b"))
        .select(col("type_a"), col("type_b"), col("h"), lit(0L).as("fa"), lit(1L).as("fb")))
      .groupBy("type_a", "type_b", "h")
      .agg(max("fa").as("fa"), max("fb").as("fb"))
    val bottom = graft.plans.TopKPerKey.topK(u,
      keys = Seq(col("type_a"), col("type_b")),
      order = Seq(col("h")),
      k = kmvK)
    val est = bottom.groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth"),
        sum(col("fa") * col("fb")).as("rho"))
      .withColumn("est_inter",
        when(col("n_kept") < kmvK, col("rho").cast("double"))
          .otherwise(shiftleft(col("rho"), 48).cast("double") / col("kth").cast("double")))
    val ev = Detectors.prepareEvents(Tables.events(spark, dir))
      .select(col("event_type"), col("key")).distinct()
    val exact = ev.as("a").join(ev.as("b"),
        col("a.key") === col("b.key") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_exact_inter"))
    est.join(exact, Seq("type_a", "type_b"), "left")
      .withColumn("n_exact_inter", coalesce(col("n_exact_inter"), lit(0L)))
  }

  val kmvTypeOverlapSql: String =
    s"""WITH $kmvSketchSql, p AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b
       |  FROM (SELECT DISTINCT event_type FROM sk) a,
       |       (SELECT DISTINCT event_type FROM sk) b
       |  WHERE a.event_type < b.event_type
       |), u AS (
       |  SELECT type_a, type_b, h, max(fa) AS fa, max(fb) AS fb FROM (
       |    SELECT p.type_a, p.type_b, s.h, 1 AS fa, 0 AS fb
       |    FROM p JOIN sk s ON s.event_type = p.type_a
       |    UNION ALL
       |    SELECT p.type_a, p.type_b, s.h, 0 AS fa, 1 AS fb
       |    FROM p JOIN sk s ON s.event_type = p.type_b)
       |  GROUP BY 1, 2, 3
       |), bot AS (
       |  SELECT type_a, type_b, h, fa, fb FROM (
       |    SELECT type_a, type_b, h, fa, fb,
       |      row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
       |    FROM u)
       |  WHERE rn <= $kmvK
       |), e AS (
       |  SELECT type_a, type_b, count(*) AS n_kept, max(h) AS kth,
       |    CAST(sum(fa * fb) AS BIGINT) AS rho
       |  FROM bot GROUP BY 1, 2
       |), ev AS (
       |  SELECT DISTINCT event_type,
       |    coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key"
       |  FROM events
       |), x AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    count(*) AS n_exact_inter
       |  FROM ev a JOIN ev b
       |    ON a."key" = b."key" AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT e.type_a, e.type_b, e.n_kept, e.kth, e.rho,
       |  CASE WHEN e.n_kept < $kmvK THEN CAST(e.rho AS DOUBLE)
       |    ELSE CAST(e.rho * 281474976710656 AS DOUBLE) / CAST(e.kth AS DOUBLE)
       |  END AS est_inter,
       |  coalesce(x.n_exact_inter, 0) AS n_exact_inter
       |FROM e LEFT JOIN x
       |  ON e.type_a = x.type_a AND e.type_b = x.type_b""".stripMargin

  // ------------------------------------------------ inter-event gap profile

  /** Per-type inter-event gap quantiles (p50/p90/p99, exact integer
    * ranks) — the PLANNING input for every time-window constant in this
    * engine: the session gap ([[sessionize]]), the absence deadline
    * ([[Detectors.absenceAlerts]]), and the streaming watermark delay all
    * encode an assumption about how long a key normally stays silent;
    * this query measures that distribution instead of guessing it. Gaps
    * are per-KEY consecutive deltas (the quantity those operators
    * threshold), profiled per event type.
    *
    * Exactness/shape: the gap extraction is one key-hash window (same
    * plan as the absence scan); quantiles use the integer-rank
    * definition from [[sampleQuantileAudit]]'s exact tier — a per-type
    * in-partition sort of the GAPS (one row per event, minus firsts),
    * never a global sort. At 100 TB you'd run the sampled tier instead;
    * this is the exact audit form. */
  def gapQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("user_id").isNotNull)
      .select(col("event_type"), Detectors.keyCol("user_id").as("key"),
        col("ts_ns"), col("event_id"))
    val wk = Window.partitionBy("event_type", "key")
      .orderBy(col("ts_ns"), col("event_id"))
    val gaps = ev
      .withColumn("p", lag("ts_ns", 1).over(wk))
      .filter(col("p").isNotNull)
      .select(col("event_type"), expr("(ts_ns - p) div 1000000000").as("gap_sec"))
    val w = Window.partitionBy("event_type").orderBy("gap_sec")
    gaps
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type").agg(
        max("n").as("n_gaps"),
        max(when(col("rn") === expr("(n - 1) * 5 div 10 + 1"), col("gap_sec")))
          .as("p50_sec"),
        max(when(col("rn") === expr("(n - 1) * 9 div 10 + 1"), col("gap_sec")))
          .as("p90_sec"),
        max(when(col("rn") === expr("(n - 1) * 99 div 100 + 1"), col("gap_sec")))
          .as("p99_sec"))
  }

  val gapQuantilesSql: String =
    """WITH e AS (
      |  SELECT event_type, coalesce(CAST(user_id AS VARCHAR), '__unknown__')
      |      AS "key",
      |    epoch_ns(ts) AS tsn, event_id
      |  FROM events WHERE user_id IS NOT NULL
      |), g AS (
      |  SELECT event_type, (tsn - p) // 1000000000 AS gap_sec FROM (
      |    SELECT event_type, tsn, lag(tsn) OVER (
      |      PARTITION BY event_type, "key" ORDER BY tsn, event_id) AS p
      |    FROM e)
      |  WHERE p IS NOT NULL
      |), r AS (
      |  SELECT event_type, gap_sec,
      |    row_number() OVER (PARTITION BY event_type ORDER BY gap_sec) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM g
      |)
      |SELECT event_type, max(n) AS n_gaps,
      |  max(CASE WHEN rn = (n - 1) * 5 // 10 + 1 THEN gap_sec END) AS p50_sec,
      |  max(CASE WHEN rn = (n - 1) * 9 // 10 + 1 THEN gap_sec END) AS p90_sec,
      |  max(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN gap_sec END) AS p99_sec
      |FROM r GROUP BY 1""".stripMargin

  // ------------------------------------------- sketch join-size estimation

  /** Join-cardinality estimation from mergeable sketches, audited against
    * the exact count — the planner-side use of the KMV family: before
    * shuffling two 100 TB tables, estimate |A ⋈ B| from k-row sketches
    * (per key domain: the bottom-[[kmvK]] key hashes, each carrying its
    * row count). The estimator is the theta-sketch join form: the sampled
    * keys are a uniform sample of the UNION domain (and a union-sampled
    * key present in a side is necessarily in that side's own bottom-k —
    * hash order is global — so its count is available), hence
    * est = mean(cA·cB over sample) × est(|union|), with |union| from the
    * KMV estimator. A join that explodes (hot key × hot key) shows up in
    * the sampled products before a single fact row moves.
    *
    * Audit columns: the exact Σ cA·cB (one join of two count-per-key
    * aggregates — the audit tier), the estimate, and the relative error,
    * REPORTED not assumed. Join under audit: events.user key ⋈
    * orders.o_custkey (genuinely many-to-many, overlapping string key
    * domains). */
  def joinSizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val a = Detectors.prepareEvents(Tables.events(spark, dir))
      .groupBy(col("key").as("k")).agg(count(lit(1)).as("ca"))
    val b = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").cast("string").as("k")).agg(count(lit(1)).as("cb"))
    val exact = a.join(b, Seq("k"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
        sum(expr("coalesce(ca, 0L) * coalesce(cb, 0L)")).as("exact_join_rows"))
    def sketch(df: DataFrame, cName: String): DataFrame =
      graft.plans.TopKPerKey.topK(
        df.withColumn("h",
            conv(substring(md5(concat(lit("js:"), col("k"))), 1, 12), 16, 10)
              .cast("long"))
          .withColumn("g", lit(1)),
        keys = Seq(col("g")), order = Seq(col("h")), k = kmvK)
        .select(col("k"), col("h"), col(cName))
    val merged = sketch(a, "ca")
      .withColumn("cb", lit(0L))
      .unionByName(sketch(b, "cb").withColumn("ca", lit(0L)))
      .groupBy("k", "h").agg(max("ca").as("ca"), max("cb").as("cb"))
    val bottom = graft.plans.TopKPerKey.topK(
      merged.withColumn("g", lit(1)),
      keys = Seq(col("g")), order = Seq(col("h")), k = kmvK)
    val sk = bottom.agg(count(lit(1)).as("n_kept"), max("h").as("kth"),
      sum(expr("ca * cb")).as("sum_prod"))
    exact.crossJoin(broadcast(sk))
      .withColumn("est_union",
        when(col("n_kept") < kmvK, col("n_kept").cast("double"))
          .otherwise(lit(kmvNum.toDouble) / col("kth").cast("double")))
      .withColumn("est_join",
        when(col("n_kept") < kmvK, col("sum_prod").cast("double"))
          .otherwise(col("sum_prod").cast("double") * col("est_union")
            / col("n_kept").cast("double")))
      .withColumn("rel_err",
        abs(col("est_join") - col("exact_join_rows").cast("double"))
          / col("exact_join_rows").cast("double"))
  }

  val joinSizeAuditSql: String =
    s"""WITH a AS (
       |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS k,
       |    count(*) AS ca
       |  FROM events GROUP BY 1
       |), b AS (
       |  SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS cb
       |  FROM orders GROUP BY 1
       |), ex AS (
       |  SELECT count(*) AS n_union,
       |    CAST(sum(coalesce(a.ca, 0) * coalesce(b.cb, 0)) AS BIGINT)
       |      AS exact_join_rows
       |  FROM a FULL JOIN b USING (k)
       |), sa AS (
       |  SELECT k, h, ca FROM (
       |    SELECT k, ca, CAST(('0x' || substr(md5('js:' || k), 1, 12)) AS BIGINT)
       |      AS h,
       |      row_number() OVER (ORDER BY CAST(('0x' || substr(md5('js:' || k),
       |        1, 12)) AS BIGINT)) AS rn
       |    FROM a)
       |  WHERE rn <= $kmvK
       |), sb AS (
       |  SELECT k, h, cb FROM (
       |    SELECT k, cb, CAST(('0x' || substr(md5('js:' || k), 1, 12)) AS BIGINT)
       |      AS h,
       |      row_number() OVER (ORDER BY CAST(('0x' || substr(md5('js:' || k),
       |        1, 12)) AS BIGINT)) AS rn
       |    FROM b)
       |  WHERE rn <= $kmvK
       |), merged AS (
       |  SELECT k, h, max(ca) AS ca, max(cb) AS cb FROM (
       |    SELECT k, h, ca, 0 AS cb FROM sa
       |    UNION ALL
       |    SELECT k, h, 0 AS ca, cb FROM sb)
       |  GROUP BY 1, 2
       |), bot AS (
       |  SELECT * FROM (
       |    SELECT k, h, ca, cb, row_number() OVER (ORDER BY h) AS rn FROM merged)
       |  WHERE rn <= $kmvK
       |), sk AS (
       |  SELECT count(*) AS n_kept, max(h) AS kth,
       |    CAST(sum(ca * cb) AS BIGINT) AS sum_prod
       |  FROM bot
       |), e AS (
       |  SELECT ex.n_union, ex.exact_join_rows, sk.n_kept, sk.kth, sk.sum_prod,
       |    CASE WHEN sk.n_kept < $kmvK THEN CAST(sk.n_kept AS DOUBLE)
       |      ELSE CAST($kmvNum AS DOUBLE) / CAST(sk.kth AS DOUBLE) END AS est_union
       |  FROM ex CROSS JOIN sk
       |)
       |SELECT n_union, exact_join_rows, n_kept, kth, sum_prod, est_union,
       |  CASE WHEN n_kept < $kmvK THEN CAST(sum_prod AS DOUBLE)
       |    ELSE CAST(sum_prod AS DOUBLE) * est_union / CAST(n_kept AS DOUBLE)
       |  END AS est_join,
       |  abs(CASE WHEN n_kept < $kmvK THEN CAST(sum_prod AS DOUBLE)
       |    ELSE CAST(sum_prod AS DOUBLE) * est_union / CAST(n_kept AS DOUBLE)
       |  END - CAST(exact_join_rows AS DOUBLE))
       |    / CAST(exact_join_rows AS DOUBLE) AS rel_err
       |FROM e""".stripMargin

  // ------------------------------------------------- time-bounded funnel

  private val funnelWindowNs = 6L * 3600 * 1000000000L // 6 h per step

  /** Conversion funnel with a PER-STEP deadline — the windowed-funnel
    * semantics (each step must land within 6 h of the previous step's
    * first qualifying event), which is what product analytics actually
    * asks ("did the click happen BECAUSE of the signup?"): the unbounded
    * [[funnelOrdered]] converts every user given enough horizon (150/150
    * /150 on the fixtures), the 6 h deadline separates real conversion
    * (150/14/4). First-qualifying-event semantics (min over qualifying
    * times) keeps each stage deterministic and one aggregate deep.
    *
    * Shape: identical to [[funnelOrdered]] — per-stage scan filters die
    * scan-side, each stage is a map-combinable per-user min joined to
    * the previous stage's one-row-per-user frame; eager materialization
    * keeps the multi-consumer stages single-execution. */
  def funnelTimeBound(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts_ns")
    val s1 = Dedup.eager(ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_ns").as("t1")))
    val s2 = Dedup.eager(ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts_ns") > col("t1") &&
        col("ts_ns") <= col("t1") + funnelWindowNs)
      .groupBy("user_id").agg(min("ts_ns").as("t2")))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts_ns") > col("t2") &&
        col("ts_ns") <= col("t2") + funnelWindowNs)
      .groupBy("user_id").agg(min("ts_ns").as("t3"))
    def cnt(df: DataFrame, step: Int, stage: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(stage).as("stage"), col("n_users"))
    cnt(s1, 1, "signup")
      .unionAll(cnt(s2, 2, "click<=6h"))
      .unionAll(cnt(s3, 3, "purchase<=6h"))
  }

  val funnelTimeBoundSql: String =
    s"""WITH s1 AS (
       |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
       |  WHERE event_type = 'signup' GROUP BY 1
       |), s2 AS (
       |  SELECT e.user_id, min(epoch_ns(ts)) AS t2
       |  FROM events e JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND epoch_ns(ts) > t1
       |    AND epoch_ns(ts) <= t1 + $funnelWindowNs
       |  GROUP BY 1
       |), s3 AS (
       |  SELECT e.user_id, min(epoch_ns(ts)) AS t3
       |  FROM events e JOIN s2 USING (user_id)
       |  WHERE event_type = 'purchase' AND epoch_ns(ts) > t2
       |    AND epoch_ns(ts) <= t2 + $funnelWindowNs
       |  GROUP BY 1
       |)
       |SELECT 1 AS step, 'signup' AS stage, count(*) AS n_users FROM s1
       |UNION ALL
       |SELECT 2, 'click<=6h', count(*) FROM s2
       |UNION ALL
       |SELECT 3, 'purchase<=6h', count(*) FROM s3""".stripMargin

  // ------------------------------------------- hash-sample quantile audit

  private val sqK = 256 // sample size per group; rank error ~ 1/sqrt(k)

  /** Mergeable-sample quantile estimation next to the exact tier — the
    * third sketch family after HLL (cardinality) and KMV (set sizes):
    * the BOTTOM-[[sqK]] rows per group by a salted hash of the UNIQUE
    * event_id are a uniform random sample of the group (hashing a unique
    * key is sampling without replacement), and bottom-k-by-hash is
    * MERGEABLE — the bottom-k of a union is the bottom-k of the merged
    * bottom-k's, the distributed-reservoir property that lets every map
    * task ship k rows per group ([[graft.plans.TopKPerKey]] partial
    * heaps) while a true reservoir would need sequential state.
    *
    * Median and p90 are then read at integer rank floor((n-1)*q) from
    * the sorted sample, and the SAME rank definition runs over the full
    * data as the exact audit (a per-group sort — the expensive tier you
    * run once to validate, not per query). All integer; `err_*` columns
    * are REPORTED sample-minus-exact cents, not an assumed bound. */
  def sampleQuantileAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("v_cents"))
    val samp = graft.plans.TopKPerKey.topK(
      ev.withColumn("h",
        conv(substring(md5(concat(lit("sq:"), col("event_id"))), 1, 12), 16, 10)
          .cast("long")),
      keys = Seq(col("event_type")), order = Seq(col("h")), k = sqK)
    val sq = samp.groupBy("event_type")
      .agg(sort_array(collect_list(col("v_cents"))).as("sv"),
        count(lit(1)).as("n_kept"))
      .select(col("event_type"), col("n_kept"),
        expr("element_at(sv, CAST((n_kept - 1) * 5 div 10 AS INT) + 1)").as("samp_p50"),
        expr("element_at(sv, CAST((n_kept - 1) * 9 div 10 AS INT) + 1)").as("samp_p90"))
    val w = Window.partitionBy("event_type").orderBy("v_cents")
    val exact = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type").agg(
        max("n").as("n"),
        max(when(col("rn") === expr("(n - 1) * 5 div 10 + 1"), col("v_cents")))
          .as("exact_p50"),
        max(when(col("rn") === expr("(n - 1) * 9 div 10 + 1"), col("v_cents")))
          .as("exact_p90"))
    exact.join(broadcast(sq), "event_type")
      .withColumn("err_p50", col("samp_p50") - col("exact_p50"))
      .withColumn("err_p90", col("samp_p90") - col("exact_p90"))
  }

  val sampleQuantileAuditSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, event_id,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents,
       |    CAST(('0x' || substr(md5('sq:' || CAST(event_id AS VARCHAR)), 1, 12))
       |      AS BIGINT) AS h
       |  FROM events WHERE value IS NOT NULL
       |), samp AS (
       |  SELECT event_type, v_cents, row_number() OVER (
       |      PARTITION BY event_type ORDER BY v_cents) AS srn,
       |    count(*) OVER (PARTITION BY event_type) AS n_kept
       |  FROM (
       |    SELECT event_type, v_cents, row_number() OVER (
       |      PARTITION BY event_type ORDER BY h) AS rn
       |    FROM ev)
       |  WHERE rn <= $sqK
       |), sq AS (
       |  SELECT event_type, max(n_kept) AS n_kept,
       |    max(CASE WHEN srn = (n_kept - 1) * 5 // 10 + 1 THEN v_cents END)
       |      AS samp_p50,
       |    max(CASE WHEN srn = (n_kept - 1) * 9 // 10 + 1 THEN v_cents END)
       |      AS samp_p90
       |  FROM samp GROUP BY 1
       |), ex AS (
       |  SELECT event_type, max(n) AS n,
       |    max(CASE WHEN rn = (n - 1) * 5 // 10 + 1 THEN v_cents END) AS exact_p50,
       |    max(CASE WHEN rn = (n - 1) * 9 // 10 + 1 THEN v_cents END) AS exact_p90
       |  FROM (
       |    SELECT event_type, v_cents,
       |      row_number() OVER (PARTITION BY event_type ORDER BY v_cents) AS rn,
       |      count(*) OVER (PARTITION BY event_type) AS n
       |    FROM ev)
       |  GROUP BY 1
       |)
       |SELECT ex.event_type, ex.n, ex.exact_p50, ex.exact_p90,
       |  sq.n_kept, sq.samp_p50, sq.samp_p90,
       |  sq.samp_p50 - ex.exact_p50 AS err_p50,
       |  sq.samp_p90 - ex.exact_p90 AS err_p90
       |FROM ex JOIN sq ON ex.event_type = sq.event_type""".stripMargin

  // -------------------------------------- sequential recurrences (CUSUM / Holt)

  /** The shared per-type daily series behind [[cusumAlerts]] and
    * [[holtForecast]]: ONE map-combinable hash agg reduces the corpus to
    * (event_type, day, y) — everything sequential afterwards runs on this
    * AGGREGATED series (|types| x |days| rows, calendar-bounded), never on
    * raw events. That is the scale contract for every sequential-recurrence
    * operator here: the recurrence is inherently order-dependent (cannot be
    * a partial agg), so it must only ever see data that has already been
    * reduced to a bounded series per key. */
  private def dailySeries(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))

  private val dailySeriesSql: String =
    """d AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  /** CUSUM changepoint detection (Page 1954) over the per-type daily volume
    * — the SEQUENTIAL companion of the trailing statistical rule: where
    * [[Detectors.statisticalAlerts]] scores each event against a local
    * window, CUSUM accumulates small persistent drifts that no single-point
    * test can see (the slow-ramp adversary: a 5% volume creep alarms in
    * days, while every individual day stays inside 3 sigma).
    *
    * Exactness: the whole recurrence is 1/8 fixed point integer math —
    * y8 = 8*y, mu8 = (8*sum y) div n, slack k8 = mu8 div 64, decision
    * threshold h8 = mu8 div 4 (tuned so both alarm branches fire on the
    * driver fixtures). S_t = max(0, S_{t-1} + y8 - mu8 - k8), alarm when
    * S_t > h8, and S resets to 0 after an alarm (the standard restart).
    * Integer division truncates toward zero in BOTH engines (verified:
    * Spark `div` and DuckDB `//`), so the oracle recursion is bit-exact.
    *
    * Shape: the corpus reduces in [[dailySeries]]'s single agg; the fold
    * runs as a Catalyst `aggregate` higher-order function over each type's
    * sorted series array — interpreted per element, but the series is the
    * AGGREGATED calendar (30 rows/key here, <=366/key/year by construction),
    * so the interpreted cost is nil; the alternative (a recursive self-join
    * per day) would be |days| sequential stages. For an unbounded horizon
    * you checkpoint (key, month) folds — the recurrence state is one long. */
  /** The CUSUM in-control baseline, (event_type, mu8) — the batch-trained
    * artifact [[graft.streaming.StreamingCusum]] scores against (the same
    * train-offline / score-online split as the seasonal twin). */
  def cusumBaseline(spark: SparkSession, dir: String): DataFrame =
    dailySeries(spark, dir).groupBy("event_type")
      .agg(expr("(8 * sum(y)) div count(1)").as("mu8"))

  def cusumAlerts(spark: SparkSession, dir: String): DataFrame = {
    val ser = dailySeries(spark, dir)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("ser"),
        expr("(8 * sum(y)) div count(1)").as("mu8"))
    // news (the pre-reset statistic) is duplicated inside the lambda because
    // SQL lambdas have no let-binding; the oracle duplicates it identically.
    val news = "greatest(CAST(0 AS BIGINT), st.s + 8*x.y - mu8 - mu8 div 64)"
    ser
      .withColumn("rows", expr(
        s"""aggregate(ser,
           |  struct(CAST(0 AS BIGINT) AS s,
           |    CAST(array() AS ARRAY<STRUCT<day: STRING, y: BIGINT,
           |      s: BIGINT, alarm: BOOLEAN>>) AS acc),
           |  (st, x) -> struct(
           |    IF($news > mu8 div 4, CAST(0 AS BIGINT), $news) AS s,
           |    array_append(st.acc, struct(x.day AS day, x.y AS y,
           |      $news AS s, $news > mu8 div 4 AS alarm)) AS acc),
           |  st -> st.acc)""".stripMargin))
      .select(col("event_type"), explode(col("rows")).as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.y").as("y"),
        col("r.s").as("s"), col("r.alarm").as("alarm"))
  }

  val cusumAlertsSql: String = {
    val news = (prev: String) =>
      s"greatest(0, $prev + 8*i.y - m.mu8 - m.mu8 // 64)"
    s"""WITH RECURSIVE $dailySeriesSql, idx AS (
       |  SELECT d.*, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |  FROM d
       |), m AS (
       |  SELECT event_type, (8 * sum(y)) // count(*) AS mu8 FROM d GROUP BY 1
       |), rec(event_type, rn, day, y, s, alarm) AS (
       |  SELECT i.event_type, i.rn, i.day, i.y,
       |    ${news("0")} AS s,
       |    ${news("0")} > m.mu8 // 4 AS alarm
       |  FROM idx i JOIN m USING (event_type) WHERE i.rn = 1
       |  UNION ALL
       |  SELECT i.event_type, i.rn, i.day, i.y,
       |    ${news("(CASE WHEN r.alarm THEN 0 ELSE r.s END)")} AS s,
       |    ${news("(CASE WHEN r.alarm THEN 0 ELSE r.s END)")} > m.mu8 // 4 AS alarm
       |  FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.rn = r.rn + 1
       |  JOIN m ON m.event_type = i.event_type
       |)
       |SELECT event_type, day, y, CAST(s AS BIGINT) AS s, alarm FROM rec""".stripMargin
  }

  /** Holt double exponential smoothing (level + trend) over the per-type
    * daily volume — the FORECAST companion of [[ewmaAnomaly]] (which tracks
    * level only): a trending series is predicted ahead of the trend, so
    * capacity alarms compare tomorrow's forecast, not yesterday's mean.
    * alpha = beta = 1/4, both chosen as powers of two so every smoothing
    * step is exact integer arithmetic in 1/8 fixed point:
    *   l_t = (8*y_t + 3*(l_{t-1} + b_{t-1})) div 4
    *   b_t = (l_t - l_{t-1} + 3*b_{t-1}) div 4     (l_1 = 8*y_1, b_1 = 0)
    * Trend goes NEGATIVE on the fixtures (80/150 rows), so this leg also
    * pins the truncate-toward-zero agreement between Spark `div` and
    * DuckDB `//` on negative operands. Scale shape: identical to
    * [[cusumAlerts]] — one corpus-scale agg, then a bounded per-key fold. */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    // l_t is duplicated into the b_t expression (no let-binding in SQL
    // lambdas); IF(st.l IS NULL) is the first-element initialization.
    val newl = "IF(st.l IS NULL, 8*x.y, (8*x.y + 3*(st.l + st.b)) div 4)"
    val newb = s"IF(st.l IS NULL, CAST(0 AS BIGINT), ($newl - st.l + 3*st.b) div 4)"
    dailySeries(spark, dir)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("ser"))
      .withColumn("rows", expr(
        s"""aggregate(ser,
           |  struct(CAST(NULL AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
           |    CAST(array() AS ARRAY<STRUCT<day: STRING, y: BIGINT,
           |      level8: BIGINT, trend8: BIGINT>>) AS acc),
           |  (st, x) -> struct(
           |    $newl AS l, $newb AS b,
           |    array_append(st.acc, struct(x.day AS day, x.y AS y,
           |      $newl AS level8, $newb AS trend8)) AS acc),
           |  st -> st.acc)""".stripMargin))
      .select(col("event_type"), explode(col("rows")).as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.y").as("y"),
        col("r.level8").as("level8"), col("r.trend8").as("trend8"),
        (col("r.level8") + col("r.trend8")).as("forecast8"))
  }

  val holtForecastSql: String =
    s"""WITH RECURSIVE $dailySeriesSql, idx AS (
       |  SELECT d.*, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |  FROM d
       |), rec(event_type, rn, day, y, l, b) AS (
       |  SELECT event_type, rn, day, y, 8*y, CAST(0 AS BIGINT) FROM idx WHERE rn = 1
       |  UNION ALL
       |  SELECT i.event_type, i.rn, i.day, i.y,
       |    (8*i.y + 3*(r.l + r.b)) // 4 AS l,
       |    (((8*i.y + 3*(r.l + r.b)) // 4) - r.l + 3*r.b) // 4 AS b
       |  FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.rn = r.rn + 1
       |)
       |SELECT event_type, day, y, CAST(l AS BIGINT) AS level8,
       |  CAST(b AS BIGINT) AS trend8, CAST(l + b AS BIGINT) AS forecast8
       |FROM rec""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_quantile_audit" -> (sampleQuantileAudit _),
    "join_size_audit" -> (joinSizeAudit _),
    "gap_quantiles" -> (gapQuantiles _),
    "funnel_time_bound" -> (funnelTimeBound _),
    "cusum_alerts" -> (cusumAlerts _),
    "holt_forecast" -> (holtForecast _),
    "kmv_distinct_audit" -> (kmvDistinctAudit _),
    "kmv_type_overlap" -> (kmvTypeOverlap _),
    "ewma_anomaly" -> (ewmaAnomaly _),
    "hll_distinct_audit" -> (hllDistinctAudit _),
    "user_rfm_features" -> (userRfmFeatures _),
    "seasonal_alerts" -> (seasonalAlerts _),
    "hourly_gapfill" -> (hourlyGapfill _),
    "value_percent_rank" -> (valuePercentRank _),
    "funnel_ordered" -> (funnelOrdered _),
    "user_retention" -> (userRetention _),
    "event_type_reach" -> (eventTypeReach _),
    "user_value_stats" -> (userValueStats _),
    "type_day_grouping_sets" -> (typeDayGroupingSets _),
    "value_lag_delta" -> (valueLagDelta _),
    "funnel_set_ops" -> (funnelSetOps _),
    "user_spend_quartiles" -> (userSpendQuartiles _),
    "type_bucket_cube" -> (typeBucketCube _),
    "value_band_join" -> (valueBandJoin _),
    "asof_click_attribution" -> (asofClickAttribution _),
    "daily_rollup" -> (dailyRollup _),
    "repeat_customers" -> (repeatCustomers _),
    "customers_no_orders" -> (customersNoOrders _),
    "user_type_pivot" -> (userTypePivot _),
    "value_quantiles" -> (valueQuantiles _),
    "user_activity_salted" -> (userActivitySalted _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "topk_events_per_user" -> (topkEventsPerUser _),
    "topk_native" -> (topkNative _),
    "user_activity" -> (userActivity _),
    "daily_counts" -> (dailyCounts _),
    "running_totals" -> (runningTotals _),
    "sessionize" -> (sessionize _),
  )

  val oracles: Map[String, String] = Map(
    "sample_quantile_audit" -> sampleQuantileAuditSql,
    "join_size_audit" -> joinSizeAuditSql,
    "gap_quantiles" -> gapQuantilesSql,
    "funnel_time_bound" -> funnelTimeBoundSql,
    "cusum_alerts" -> cusumAlertsSql,
    "holt_forecast" -> holtForecastSql,
    "kmv_distinct_audit" -> kmvDistinctAuditSql,
    "kmv_type_overlap" -> kmvTypeOverlapSql,
    "ewma_anomaly" -> ewmaAnomalySql,
    "hll_distinct_audit" -> hllDistinctAuditSql,
    "user_rfm_features" -> userRfmFeaturesSql,
    "seasonal_alerts" -> seasonalAlertsSql,
    "hourly_gapfill" -> hourlyGapfillSql,
    "value_percent_rank" -> valuePercentRankSql,
    "funnel_ordered" -> funnelOrderedSql,
    "user_retention" -> userRetentionSql,
    "event_type_reach" -> eventTypeReachSql,
    "type_bucket_cube" -> typeBucketCubeSql,
    "value_band_join" -> valueBandJoinSql,
    "asof_click_attribution" -> asofClickAttributionSql,
    "daily_rollup" -> dailyRollupSql,
    "repeat_customers" -> repeatCustomersSql,
    "customers_no_orders" -> customersNoOrdersSql,
    "user_type_pivot" -> userTypePivotSql,
    "value_quantiles" -> valueQuantilesSql,
    "user_activity_salted" -> userActivitySaltedSql,
    "q1_pricing_summary" -> q1Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "topk_events_per_user" -> topkSql,
    "topk_native" -> topkNativeSql,
    "user_activity" -> userActivitySql,
    "daily_counts" -> dailyCountsSql,
    "running_totals" -> runningTotalsSql,
    "sessionize" -> sessionizeSql,
    "user_value_stats" -> userValueStatsSql,
    "type_day_grouping_sets" -> typeDayGroupingSetsSql,
    "value_lag_delta" -> valueLagDeltaSql,
    "funnel_set_ops" -> funnelSetOpsSql,
    "user_spend_quartiles" -> userSpendQuartilesSql,
  )
}
