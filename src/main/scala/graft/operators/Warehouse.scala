package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second analytics batch: correlated-subquery joins, multi-join
  * pipelines, the SQL entry surface, time-range rolling windows, and
  * reshape (pivot↔unpivot) operators.
  *
  * Same ground rules as [[Analytics]] (the reference engine has no SQL
  * surface at all — SURVEY.md §2 "categories the reference does NOT
  * have" — so this whole module is north-star query capability):
  * exact DECIMAL money math, integer-cents quantization for event
  * values, explicit `broadcast()` on dimension sides, deterministic
  * tie-breaks on every ranking/limit.
  */
object Warehouse {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private def discPrice: Column =
    dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount")))

  /** TPC-H Q4-style order-priority check: count orders, per priority
    * class, that had at least one line item shipped more than 60 days
    * after the order date. The EXISTS correlate becomes a LEFT SEMI
    * join: equi on the order key (hash-partitionable — this is the one
    * shuffle) with the `shipdate > orderdate + 60d` correlate left as a
    * residual join predicate. Semi-join stops probing an order on its
    * first match, and only `(l_orderkey, l_shipdate)` is read from the
    * probe side (column pruning reaches the scan). */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1""".stripMargin

  /** TPC-H Q10-style returned-item revenue: top 20 customers by revenue
    * lost to returns. Unlike q3/q5 (where the dimension is broadcast),
    * the customer side here scales with the user base — at 100 TB both
    * join inputs are large, so both joins are plain hash-partitioned
    * shuffle joins on their keys and the plan must NOT broadcast.
    * Top-20 is TakeOrdered (per-partition heap, driver merges 20 rows),
    * never a global sort; ties broken on c_custkey. */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(sum(discPrice).cast(DecimalType(38, 4)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q14-style promo revenue share — deliberately driven through
    * the `spark.sql` entry point (temp views + SQL text) to exercise
    * the engine's SQL surface end-to-end: parse → analyze over the view
    * catalog → the same optimized plan the DataFrame form yields (one
    * broadcast of the filtered `part` dimension, one scan of the
    * shipdate-pruned month of lineitem, single-group partial+final
    * aggregate, zero shuffles). Share arithmetic: exact DECIMAL sums
    * cast to double, then one identically-shaped double expression in
    * both engines. */
  private val q14ViewNonce = new java.util.concurrent.atomic.AtomicLong()

  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    // views exist only while the SQL text is analyzed — dropped before
    // returning so the shared session catalog carries no hidden state
    // between queries (the resolved plan keeps its relations). Names are
    // nonce-suffixed so running this query can never replace-then-drop a
    // caller's own `lineitem`/`part` temp views as a side effect.
    val n = q14ViewNonce.incrementAndGet()
    val lv = s"graft_q14_lineitem_$n"
    val pv = s"graft_q14_part_$n"
    Tables.lineitem(spark, dir).createOrReplaceTempView(lv)
    Tables.part(spark, dir).createOrReplaceTempView(pv)
    try spark.sql(
      s"""SELECT promo_revenue, total_revenue,
        |  CASE WHEN total_revenue = 0.0 OR total_revenue IS NULL THEN NULL
        |    ELSE 100.0 * promo_revenue / total_revenue END AS promo_share_pct
        |FROM (
        |  SELECT
        |    CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
        |          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS promo_revenue,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
        |  FROM $lv JOIN $pv ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')""".stripMargin)
    finally {
      spark.catalog.dropTempView(lv)
      spark.catalog.dropTempView(pv)
    }
  }

  val q14Sql: String =
    """SELECT promo_revenue, total_revenue,
      |  CASE WHEN total_revenue = 0.0 OR total_revenue IS NULL THEN NULL
      |    ELSE 100.0 * promo_revenue / total_revenue END AS promo_share_pct
      |FROM (
      |  SELECT
      |    CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
      |          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS promo_revenue,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')""".stripMargin

  /** TPC-H Q13-style customer distribution: how many customers placed
    * exactly N orders, including the zero-order long tail (the LEFT
    * OUTER join is the point — an inner join would silently drop the
    * never-ordered customers, the most interesting bucket).
    *
    * Orders are pre-aggregated to one row per `o_custkey` BEFORE the
    * join, so the join shuffle carries one row per customer instead of
    * one per order (~10x fewer at TPC-H ratios) and the per-custkey
    * count gets map-side partial aggregation on the scan side. The
    * zero-order bucket survives via LEFT JOIN + coalesce(n, 0). The
    * final histogram shuffle carries one row per distinct count — a
    * few dozen whatever the scale. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(col("o_orderkey")).as("n_cust_orders"))
    c.join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_cust_orders"), lit(0L)).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
  }

  val q13Sql: String =
    """SELECT n_orders, count(*) AS n_customers
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1)
      |GROUP BY 1""".stripMargin

  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * exceeds 300, joined back to their customer — the HAVING-then-join
    * shape where a per-key aggregate becomes the probe side of further
    * joins. The aggregate output (few rows past the HAVING gate) is
    * what AQE broadcasts; quantities are integer-valued doubles so the
    * sums are IEEE-exact. Top-10 by volume, TakeOrdered. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 300.0)
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("l_orderkey"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("l_orderkey"))
      .limit(10)
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, l_orderkey, total_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300.0) b
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q15-style top supplier: suppliers whose quarterly revenue
    * equals the maximum over all suppliers — the aggregate-of-aggregate
    * equality shape (a self-referencing scalar subquery; ties all
    * surface, no arbitrary pick). The revenue DEFINITION is shared by
    * the max (1-row broadcast) and equality legs; physically the scan +
    * partial aggregate + shuffle runs ONCE via ReuseExchange — which
    * only fires because the explicit `l_suppkey` isNotNull below makes
    * both legs' subtrees canonically identical (the join leg pushes
    * IsNotNull into its scan; without mirroring it, the max leg's scan
    * differs and each leg pays its own lineitem pass). `l_suppkey` is
    * NOT NULL in the schema, so the filter drops nothing. Exact DECIMAL
    * revenue makes the equality deterministic where a parallel double
    * sum would make "the max" ambiguous at the ulp. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01") && col("l_suppkey").isNotNull)
      .groupBy("l_suppkey")
      .agg(sum(discPrice).cast(DecimalType(38, 4)).cast("double").as("total_rev"))
    val maxRev = rev.agg(max("total_rev").as("mx"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  val q15Sql: String =
    """WITH r AS (
      |  SELECT l_suppkey,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_rev
      |FROM supplier JOIN r ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM r)""".stripMargin

  /** Trailing 1-hour moving average of event value per user — the
    * time-RANGE analog of the rate rule's count window (§2 op 8 uses
    * the identical frame; here it carries a sum). One hash shuffle on
    * user_id; the frame is bounded so window state per partition is
    * O(window), not O(partition). Exact integer cents in the frame sum;
    * the division is the only double step and is shaped identically in
    * the oracle. Null values stay out of both sum and count (the frame
    * average is over present values). */
  def valueMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("c", Analytics.cents(col("value")))
      .withColumn("sum_c", sum(col("c")).over(w))
      .withColumn("n_c", count(col("c")).over(w))
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        (col("sum_c").cast("double") / col("n_c") / 100.0).as("moving_avg"))
  }

  val valueMovingAvgSql: String =
    """SELECT event_id, user_id, ts_sec,
      |  CAST(sum(c) OVER w AS DOUBLE) / count(c) OVER w / 100.0 AS moving_avg
      |FROM (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin

  /** First/last event per user on the exact nanosecond clock (event_id
    * tie-break): two row_number ranks over one partition exchange (the
    * ascending and descending sorts share the user_id shuffle), folded
    * with conditional aggregates — no self-join. The classic
    * "session entry/exit page" shape. */
  def userFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val asc = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    val desc = Window.partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("user_id")
      .agg(
        max(when(col("rn_a") === 1, col("event_type"))).as("first_type"),
        max(when(col("rn_d") === 1, col("event_type"))).as("last_type"),
        min("ts_sec").as("first_ts_sec"),
        max("ts_sec").as("last_ts_sec"),
        count(lit(1)).as("n_events"))
  }

  val userFirstLastSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS ts_sec,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
      |  FROM events)
      |SELECT user_id,
      |  max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
      |  max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
      |  min(ts_sec) AS first_ts_sec,
      |  max(ts_sec) AS last_ts_sec,
      |  count(*) AS n_events
      |FROM r GROUP BY 1""".stripMargin

  /** Fixed-width value histogram (bin 50, top bin open-ended): the
    * bucket id is pure scan-side integer math, so the whole query is
    * one partial+final hash aggregate over ≤10 groups — the shuffle
    * carries ~10 rows per map task whatever the input size. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .withColumn("bucket", least(floor(col("value") / 50.0).cast("long"), lit(9L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (sum(Analytics.cents(col("value"))).cast("double") / 100.0).as("sum_value"))

  val valueHistogramSql: String =
    """SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |WHERE value IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** Reshape round-trip: the per-user event-type matrix (pivot) melted
    * back to long form with the `unpivot` operator. Pivot plans as one
    * hash aggregate with 5 conditional counts (no extra shuffle vs the
    * plain groupBy); unpivot is an Expand — each aggregated row fans
    * out to 5, absent combinations surface as NULL and are dropped,
    * restoring exactly the long-form groupBy result. The value columns
    * are a closed categorical set, declared explicitly — at 100 TB you
    * never let pivot infer its column set with a distinct scan. */
  def userTypeUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "purchase", "error", "signup", "view")
    Tables.events(spark, dir)
      .groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
      .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "cnt")
      .filter(col("cnt").isNotNull)
  }

  val userTypeUnpivotSql: String =
    """SELECT user_id, event_type, count(*) AS cnt
      |FROM events
      |WHERE event_type IN ('click', 'purchase', 'error', 'signup', 'view')
      |GROUP BY 1, 2""".stripMargin

  /** Per-type correlation between event value and time-of-day — the
    * covariance/correlation aggregate family, computed from exact
    * integer moments (cents × second-of-day products summed as
    * overflow-checked integers; the fixture domain keeps every moment
    * < 2^53 so the double casts are exact) and combined with one
    * identically-shaped double expression per engine, making Pearson r
    * bit-reproducible cross-engine where a builtin `corr()` (running
    * Welford in doubles, order-dependent) would not be. One hash
    * aggregate on the 5-value type key. */
  def typeDiurnalCorr(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .withColumn("x", Analytics.cents(col("value")))
      .withColumn("y", col("ts_sec") % 86400)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double")
    val syd = col("sy").cast("double")
    val sxyd = col("sxy").cast("double")
    val sxxd = col("sxx").cast("double")
    val syyd = col("syy").cast("double")
    // zero-variance guard: a single-event or all-equal group makes the
    // denominator 0.0 — ANSI mode (Spark 4 default) would throw
    // DIVIDE_BY_ZERO, and DuckDB returns NULL for x/0.0, so emit NULL
    // explicitly on both sides
    val denom = sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)
    agg.select(col("event_type"), col("n"),
      when(denom === 0.0, lit(null).cast("double"))
        .otherwise((nd * sxyd - sxd * syd) / denom)
        .as("corr_value_tod"),
      ((nd * sxyd - sxd * syd) / (nd * nd) / 100.0).as("covar_pop_vt"))
  }

  val typeDiurnalCorrSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
      |    (epoch_ns(ts) // 1000000000) % 86400 AS y
      |  FROM events WHERE value IS NOT NULL
      |), m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM c GROUP BY 1)
      |SELECT event_type, n,
      |  CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0
      |  THEN NULL ELSE
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  END AS corr_value_tod,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 100.0 AS covar_pop_vt
      |FROM m""".stripMargin

  /** Schema-free map explode: parse the dynamic `props` JSON into a
    * MAP<STRING,STRING> (the reference's `Map<String,Object>` event
    * shape, Event.java:39-59), explode to (key, value) pairs, and
    * aggregate per key — the "what fields does this corpus actually
    * carry" profiling query. Explode is a generator (no shuffle);
    * the single hash aggregate groups on the small dynamic key set.
    * The numeric profile uses try_cast so non-numeric values profile
    * as NULL rather than erroring — the reference's
    * `getNumericField` coercion contract (Event.java:101-114). */
  def propsKvStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("props").isNotNull)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("prop_key", "prop_val")))
      .groupBy("prop_key")
      .agg(count(lit(1)).as("n"),
        (sum(col("prop_val").try_cast("long")).cast("double") /
          count(col("prop_val").try_cast("long"))).as("avg_val"))

  val propsKvStatsSql: String =
    """WITH kv AS (
      |  SELECT unnest(json_keys(props)) AS prop_key, props
      |  FROM events WHERE props IS NOT NULL)
      |SELECT prop_key, count(*) AS n,
      |  CAST(sum(TRY_CAST(json_extract_string(props, '$."' || prop_key || '"') AS BIGINT)) AS DOUBLE)
      |    / count(TRY_CAST(json_extract_string(props, '$."' || prop_key || '"') AS BIGINT)) AS avg_val
      |FROM kv GROUP BY 1""".stripMargin

  /** Global-baseline comparison — "which event types run hot against
    * the corpus-wide mean": a 1-row global aggregate joined back under
    * every row (the scalar-subquery pattern; Spark broadcasts the
    * single row, the scan never reshuffles). The above-mean predicate
    * is the integer inequality `cents·N > total_cents` — algebraically
    * `value > mean` with no division, so no float comparison exists
    * anywhere. Domain bound (like [[typeDiurnalCorr]]'s moments): the
    * product needs `max_cents × N < 2^63` — ~1e6-cent values hold to
    * ~9e12 rows; beyond that, lift the moments to DECIMAL(38,0). */
  def aboveMeanEvents(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .withColumn("c", Analytics.cents(col("value")))
    val totals = e.agg(sum("c").as("tot_c"), count(lit(1)).as("n_tot"))
    e.crossJoin(broadcast(totals))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") * col("n_tot") > col("tot_c"), 1L).otherwise(0L))
          .as("n_above_mean"))
      .withColumn("share_above",
        col("n_above_mean").cast("double") / col("n"))
  }

  val aboveMeanEventsSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL
      |), t AS (SELECT CAST(sum(c) AS BIGINT) AS tot_c, count(*) AS n_tot FROM e)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN c * n_tot > tot_c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above_mean,
      |  CAST(CAST(sum(CASE WHEN c * n_tot > tot_c THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
      |    / count(*) AS share_above
      |FROM e CROSS JOIN t
      |GROUP BY 1""".stripMargin

  /** Rolling 7-day distinct active users per day — the windowed
    * COUNT(DISTINCT) that window functions cannot express (Spark
    * forbids DISTINCT in a frame; a per-day sum of daily uniques would
    * double-count): dedup to (day, user) pairs first (one exchange,
    * map-side partial dedup), then join the tiny day grid on the
    * 7-day containment range — each pair meets ≤ 7 grid days — and
    * count distinct users per grid day. Exact, no sketch; the HLL
    * variant of the same metric is `approx_count_distinct` one-lined
    * over the identical join (sketch-gated in SketchSpec, not here). */
  def rollingDau(spark: SparkSession, dir: String): DataFrame = {
    // fixed 7-day window => generator fan-out, NOT a non-equi grid join
    // (a containment join would nested-loop every pair against every
    // grid day — O(pairs × days); the explode is exactly 7 rows per
    // pair whatever the date range). The only scalar needed is the max
    // day (to stop windows hanging past the data), from a scan-only
    // min-free aggregate — the pair dedup never executes twice.
    val pairs = Tables.events(spark, dir)
      .select(expr("ts_sec div 86400").as("day_num"), col("user_id"))
      .distinct()
    val hi = Tables.events(spark, dir)
      .agg(expr("max(ts_sec div 86400)").as("hi"))
    pairs
      .withColumn("d", explode(sequence(col("day_num"), col("day_num") + 6)))
      .crossJoin(broadcast(hi))
      .filter(col("d") <= col("hi"))
      .groupBy("d")
      .agg(countDistinct("user_id").as("dau_7d"),
        count(lit(1)).as("active_pairs"))
  }

  val rollingDauSql: String =
    """WITH p AS (
      |  SELECT DISTINCT epoch_ns(ts) // 1000000000 // 86400 AS day_num, user_id
      |  FROM events
      |), b AS (SELECT max(epoch_ns(ts) // 1000000000 // 86400) AS hi FROM events),
      |f AS (
      |  SELECT user_id, unnest(generate_series(day_num, day_num + 6)) AS d
      |  FROM p
      |)
      |SELECT d, count(DISTINCT user_id) AS dau_7d,
      |  count(*) AS active_pairs
      |FROM f CROSS JOIN b
      |WHERE d <= hi
      |GROUP BY 1""".stripMargin

  /** TPC-H Q7-style cross-nation shipping volume: revenue flowing from
    * supplier nation to customer nation, for one ordered nation pair,
    * per ship year. The IN-superset of the disjunction (each side's
    * nation ∈ {NATION_1, NATION_2}) is applied to the nation dimension
    * BEFORE the fact joins — Catalyst keeps the OR-of-ANDs residual, so
    * without the manual push both fact legs shuffle in full; with it the
    * two-of-N-nations selectivity (~2/25 here) prunes lineitem (via the
    * supplier broadcast) and orders (via the customer broadcast) before
    * the one orderkey shuffle, which now carries only the surviving
    * fraction on BOTH sides. The full cross-pair constraint still
    * evaluates as a residual filter after both joins (it drops the
    * N1–N1 / N2–N2 combinations the per-side supersets admit). */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_2")
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(nations: _*))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(nations: _*))
    val sf = s.join(broadcast(n1), col("s_nationkey") === col("s_nk"))
    val cf = c.join(broadcast(n2), col("c_nationkey") === col("c_nk"))
    li.join(broadcast(sf), col("l_suppkey") === col("s_suppkey"))
      .join(o.join(broadcast(cf), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(sum(discPrice).cast(DecimalType(38, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS ship_year,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q19-style disjunctive-predicate join: revenue from three
    * OR'd (brand × size × quantity-band) channels. The per-side
    * conjuncts (brand IN (...), size range, quantity range) are pushed
    * to their scans as supersets of the disjunction, and the full
    * OR-of-ANDs evaluates as a residual join filter — the classic
    * "complex predicate still prunes both inputs" shape. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 40))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey") && cond)
      .agg(sum(discPrice).cast(DecimalType(38, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** Concurrency profile: how many user sessions were live in each hour
    * — an interval-OVERLAP join (session [start, end+gap) × hour grid),
    * the join shape none of the equi/semi/band joins cover: neither side
    * key is contained in the other; the predicate is two inequalities.
    * Sessions come from the same gap logic as `session_native`; the
    * hour grid derives from a 1-row min/max aggregate and broadcasts, so
    * the sessions side never shuffles for the join — each session
    * meets only its own covered hours (output rows ≈ total session
    * hours, not |sessions|×|hours|). */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    val sessions = sessionNative(spark, dir)
    // grid bounds need no sessionization: min session start == min event
    // second, max session end == max event second + gap — a 1-row min/max
    // over the raw scan (deriving them from `sessions` would execute the
    // session-merge aggregation twice). The inner overlap join drops
    // empty hours, so equal-or-wider bounds cannot change the result.
    val hours = Tables.events(spark, dir)
      .agg((expr("min(ts_sec) div 3600") * 3600).as("lo"),
        (expr("(max(ts_sec) + 1800) div 3600") * 3600).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_sec"))
    sessions.join(broadcast(hours),
        col("hour_sec") < col("end_sec") &&
          col("hour_sec") + 3600L > col("start_sec"))
      .groupBy("hour_sec")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_sessions"))
  }

  val concurrentSessionsSql: String =
    s"""WITH $sessionCtes, s AS (
       |  SELECT user_id, min(ts_us) // 1000000 AS start_sec,
       |    max(ts_us) // 1000000 + 1800 AS end_sec
       |  FROM h GROUP BY user_id, sid
       |), b AS (
       |  SELECT min(ts_us) // 1000000 // 3600 * 3600 AS lo,
       |    (max(ts_us) // 1000000 + 1800) // 3600 * 3600 AS hi FROM e
       |), hrs AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_sec FROM b)
       |SELECT hour_sec, count(DISTINCT user_id) AS n_users,
       |  count(*) AS n_sessions
       |FROM s JOIN hrs ON hour_sec < end_sec AND hour_sec + 3600 > start_sec
       |GROUP BY 1""".stripMargin

  /** Event-time sliding windows via the native `window()` generator:
    * hourly counts per type, sliding every 30 minutes. Each event fans
    * out to exactly windowLength/slide = 2 rows scan-side (a generator,
    * no shuffle), then one hash aggregate on (window, type). Window
    * membership is pure epoch arithmetic, so the oracle states it as an
    * explicit 2-element unnest. This is the aligned-window family the
    * reference deliberately does NOT have (its rate rule is a per-event
    * trailing window — §2 op 8); both now exist side by side. */
  def slidingWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws_sec"),
        col("event_type"), col("n"))

  val slidingWindowCountsSql: String =
    """WITH w AS (
      |  SELECT event_type,
      |    unnest([ (epoch_ns(ts) // 1000000000 // 1800) * 1800,
      |             (epoch_ns(ts) // 1000000000 // 1800) * 1800 - 1800 ]) AS ws_sec
      |  FROM events)
      |SELECT ws_sec, event_type, count(*) AS n
      |FROM w GROUP BY 1, 2""".stripMargin

  /** Gap sessions via the native `session_window` operator — the
    * built-in twin of the composed `sessionize` query (lag + running
    * sum), the same built-in-vs-composed pairing as
    * topk_native/topk_events_per_user. Native semantics: an event
    * merges into the session iff it starts strictly before session end
    * (gap >= 30 min starts a new session, at microsecond precision);
    * window.end = last event + gap, so end_sec = max(ts_sec) + 1800
    * exactly. Plans as UpdatingSessions/MergingSessions around one
    * user_id exchange — no second window sort pass like the composed
    * form. */
  def sessionNative(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("start_sec"),
        col("session_window.end").cast("long").as("end_sec"),
        col("n_events"))

  /** The gap-session CTE block shared by [[sessionNativeSql]] and
    * [[concurrentSessionsSql]] — ONE definition of the 30-min gap
    * semantics (>= boundary at microsecond precision, +1800 end pad). */
  // def, not val: referenced by concurrentSessionsSql which initializes
  // earlier in the object — a val here would still be null at that point
  private def sessionCtes: String =
    """e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), f AS (
      |  SELECT *, lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us
      |  FROM e
      |), g AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM f
      |), h AS (
      |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM g
      |)""".stripMargin

  val sessionNativeSql: String =
    s"""WITH $sessionCtes
       |SELECT user_id, min(ts_us) // 1000000 AS start_sec,
       |  max(ts_us) // 1000000 + 1800 AS end_sec, count(*) AS n_events
       |FROM h GROUP BY user_id, sid""".stripMargin

  /** Robust per-user outlier profile: median, MAD (median absolute
    * deviation), and the count of events beyond 3 MADs — the robust
    * cousin of the reference's mean/σ statistical rule
    * (StatisticalOutlierDetector.java:77-156), which a single extreme
    * value can't poison. All medians are exact rank-interpolations in
    * scaled integer space (2× for the median, 4× for the MAD), so the
    * outlier comparison `|x − med| > 3·MAD` is an exact integer
    * predicate — no floating-point tie ambiguity cross-engine.
    * Physically: one hash exchange on user_id, then window sorts +
    * final aggregate within each partition — the per-group medians
    * never leave their partition. */
  def userValueMad(spark: SparkSession, dir: String): DataFrame =
    madProfile(Tables.events(spark, dir))

  /** Core of [[userValueMad]] over any (user_id, event_id, value) frame —
    * separated so the property spec can drive it with generated data. */
  private[graft] def madProfile(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val byC = byUser.orderBy(col("c"), col("event_id"))
    val e = events
      .filter(col("value").isNotNull)
      .withColumn("c", Analytics.cents(col("value")))
      .withColumn("rn", row_number().over(byC))
      .withColumn("n", count(lit(1)).over(byUser))
      .withColumn("k", expr("(n - 1) div 2"))
      // med2 = 2×median in cents: a + b for even n (k+1, k+2 ranks), 2a odd
      .withColumn("a",
        max(when(col("rn") === col("k") + 1, col("c"))).over(byUser))
      .withColumn("b",
        max(when(col("rn") === col("k") + 2, col("c"))).over(byUser))
      .withColumn("med2",
        when(col("n") % 2 === 1, col("a") * 2).otherwise(col("a") + col("b")))
      .withColumn("dev", abs(col("c") * 2 - col("med2")))
    val byDev = byUser.orderBy(col("dev"), col("event_id"))
    val d = e
      .withColumn("rd", row_number().over(byDev))
      .withColumn("da",
        max(when(col("rd") === col("k") + 1, col("dev"))).over(byUser))
      .withColumn("db",
        max(when(col("rd") === col("k") + 2, col("dev"))).over(byUser))
      .withColumn("mad2",
        when(col("n") % 2 === 1, col("da") * 2).otherwise(col("da") + col("db")))
    d.groupBy("user_id")
      .agg(max("n").as("n"),
        (max("med2").cast("double") / 200.0).as("median_value"),
        (max("mad2").cast("double") / 400.0).as("mad_value"),
        sum(when(col("dev") * 2 > col("mad2") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  val userValueMadSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL
      |), r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id ORDER BY c, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM e
      |), m AS (
      |  SELECT *, (n - 1) // 2 AS k,
      |    max(CASE WHEN rn = (n - 1) // 2 + 1 THEN c END)
      |      OVER (PARTITION BY user_id) AS a,
      |    max(CASE WHEN rn = (n - 1) // 2 + 2 THEN c END)
      |      OVER (PARTITION BY user_id) AS b
      |  FROM r
      |), v AS (
      |  SELECT *, CASE WHEN n % 2 = 1 THEN a * 2 ELSE a + b END AS med2
      |  FROM m
      |), w AS (
      |  SELECT *, abs(c * 2 - med2) AS dev FROM v
      |), s AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rd
      |  FROM w
      |), t AS (
      |  SELECT *,
      |    max(CASE WHEN rd = k + 1 THEN dev END) OVER (PARTITION BY user_id) AS da,
      |    max(CASE WHEN rd = k + 2 THEN dev END) OVER (PARTITION BY user_id) AS db
      |  FROM s
      |), u AS (
      |  SELECT *, CASE WHEN n % 2 = 1 THEN da * 2 ELSE da + db END AS mad2
      |  FROM t
      |)
      |SELECT user_id, max(n) AS n,
      |  CAST(max(med2) AS DOUBLE) / 200.0 AS median_value,
      |  CAST(max(mad2) AS DOUBLE) / 400.0 AS mad_value,
      |  CAST(sum(CASE WHEN dev * 2 > mad2 * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM u GROUP BY 1""".stripMargin

  /** Incremental materialized-rollup maintenance (incremental view
    * maintenance): the per-user lifetime profile is maintained as
    * MERGEABLE PARTIAL AGGREGATES — count, cents sum, min/max day,
    * max cents, every one associative — so a new day of data updates the
    * stored rollup by merging partials, never by re-touching history.
    * Here the "stored base" is the aggregate of all days before the
    * newest day in the fixture and the "delta" is that newest day (a
    * deterministic, data-driven cutoff); production would read the base
    * partials from the stored rollup table and this plan's base branch
    * is exactly what that table contains.
    *
    * The oracle is the FULL recompute over raw events — equality with
    * it is precisely the IVM invariant (merge(partial(A), partial(B)) ==
    * aggregate(A ∪ B)). Quantization: exact cents; the only doubles are
    * final /100.0 presentations of exact longs.
    *
    * Scale shape: both branches are map-combinable hash aggs keyed on
    * user_id; the merge is a union of PARTIAL ROWS (one per user per
    * branch, not events) re-aggregated on the same key — at 100 TB the
    * base branch is a table scan of |users| rows and the delta branch
    * touches one day's partition only. No window functions, no sorts. */
  def rollupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .withColumn("day_num", expr("ts_sec div 86400"))
      .withColumn("c", Analytics.cents(col("value")))
      .select("user_id", "day_num", "c")
    val cutoff = ev.agg(max("day_num").as("cutoff"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    def partial(df: DataFrame): DataFrame = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        min("day_num").as("first_day"), max("day_num").as("last_day"),
        max("c").as("max_c"))
    val base = partial(tagged.filter(col("day_num") < col("cutoff")))
    val delta = partial(tagged.filter(col("day_num") >= col("cutoff")))
    base.unionByName(delta)
      .groupBy("user_id")
      .agg(sum("n").as("n"),
        (sum("s").cast("double") / 100.0).as("total_value"),
        min("first_day").as("first_day"), max("last_day").as("last_day"),
        (max("max_c").cast("double") / 100.0).as("max_value"))
  }

  val rollupIncrementalSql: String =
    """SELECT user_id, count(*) AS n,
      |  CAST(sum(c) AS DOUBLE) / 100.0 AS total_value,
      |  min(day_num) AS first_day, max(day_num) AS last_day,
      |  CAST(max(c) AS DOUBLE) / 100.0 AS max_value
      |FROM (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day_num,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE user_id IS NOT NULL
      |) GROUP BY 1""".stripMargin

  /** SCD Type-2 dimension merge — the versioned-history half of
    * warehouse maintenance beside [[rollupIncremental]]'s aggregate half.
    * A stored dimension history (simulated initial load: every customer
    * at version 1, open-ended) receives an update batch (every 5th
    * customer re-stated, with a deterministic account-balance delta that
    * is ZERO for every 15th customer — the no-op case MERGE must not
    * version): rows whose TRACKED attributes actually changed close
    * their current version (valid_to set, is_current dropped) and append
    * the next version; unchanged and untouched rows pass through — the
    * standard close-and-insert MERGE decomposition.
    *
    * Determinism: the attribute comparison and the restated balance are
    * pure IEEE add/multiply on the stored doubles, identical trees both
    * engines;
    * everything else is integers/strings/booleans.
    *
    * Scale shape: one equi-join of the update batch against the CURRENT
    * slice of the dimension (at 100 TB: update batches are small —
    * broadcast; the history scan prunes to is_current), one anti-join
    * for pass-through, and a union — no window functions, no sorts, and
    * history rows that cannot change (closed versions) are never
    * rewritten. */
  def scd2CustomerHistory(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val upd = cust.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"),
        (col("c_acctbal") + (col("c_custkey") % 3).cast("double") * lit(50.0))
          .as("u_acctbal"),
        col("c_mktsegment").as("u_mktsegment"))
    // the update batch (and the changed subset it induces) is the small
    // side by contract — a day's restatements vs the full dimension — so
    // both joins broadcast it; without the hint Catalyst sees only a
    // same-table derivation and falls back to a sort-merge anti-join
    val chg = cust.join(broadcast(upd), "c_custkey")
      .filter(col("u_acctbal") =!= col("c_acctbal") ||
        col("u_mktsegment") =!= col("c_mktsegment"))
    val untouched = cust.join(broadcast(chg.select("c_custkey")),
      Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), lit(1L).as("version"),
        col("c_acctbal"), col("c_mktsegment"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    val closed = chg
      .select(col("c_custkey"), lit(1L).as("version"),
        col("c_acctbal"), col("c_mktsegment"),
        lit(0L).as("valid_from"), lit(1L).as("valid_to"),
        lit(false).as("is_current"))
    val opened = chg
      .select(col("c_custkey"), lit(2L).as("version"),
        col("u_acctbal").as("c_acctbal"), col("u_mktsegment").as("c_mktsegment"),
        lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    untouched.unionByName(closed).unionByName(opened)
  }

  val scd2CustomerHistorySql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |), upd AS (
      |  SELECT c_custkey,
      |    c_acctbal + CAST(c_custkey % 3 AS DOUBLE) * 50.0 AS u_acctbal,
      |    c_mktsegment AS u_mktsegment
      |  FROM cust WHERE c_custkey % 5 = 0
      |), chg AS (
      |  SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, u.u_acctbal, u.u_mktsegment
      |  FROM cust c JOIN upd u USING (c_custkey)
      |  WHERE u.u_acctbal <> c.c_acctbal OR u.u_mktsegment <> c.c_mktsegment
      |)
      |SELECT c_custkey, CAST(1 AS BIGINT) AS version, c_acctbal, c_mktsegment,
      |  CAST(0 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
      |  true AS is_current
      |FROM cust WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
      |UNION ALL
      |SELECT c_custkey, 1, c_acctbal, c_mktsegment, 0, 1, false FROM chg
      |UNION ALL
      |SELECT c_custkey, 2, u_acctbal, u_mktsegment, 1, NULL, true FROM chg""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue), adapted to the fixture
    * part schema (brand + size stand in for brand + container): average
    * yearly revenue lost if small orders — below 20% of the part's own
    * average quantity — were not filled. The correlated scalar subquery
    * decorrelates to a per-part aggregate joined back (what a correct
    * optimizer does; here it is explicit and oracle-mirrored).
    *
    * Exactness: quantities are integer-valued doubles, so their sums are
    * exact in ANY summation order (< 2^53); the 20%-of-average test is
    * cross-multiplied — `5 * qty * n < sum` — with no division anywhere;
    * revenue is exact cents; the two final divisions (/100.0, /7.0) are
    * a left-associated presentation chain, identical trees both engines.
    *
    * Scale shape: the brand filter broadcasts into the lineitem scan
    * (probe rows die scan-side), per-part stats are one map-combinable
    * agg over the FILTERED slice only (a part's lineitems all carry its
    * partkey, so filtering first is semantics-preserving), and the
    * stats table — bounded by the selected part count — broadcasts back. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 10)
      .select("p_partkey")
    val lf = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val qstats = lf.groupBy("l_partkey")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("nq"))
    lf.join(broadcast(qstats), "l_partkey")
      .filter(col("l_quantity") * lit(5.0) * col("nq") < col("sq"))
      .agg(((sum(Analytics.cents(col("l_extendedprice"))).cast("double") / 100.0)
        / 7.0).as("avg_yearly"), count(lit(1)).as("n"))
  }

  val q17Sql: String =
    """WITH p AS (
      |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#23' AND p_size < 10
      |), lf AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN p ON l_partkey = p_partkey
      |), q AS (
      |  SELECT l_partkey, sum(l_quantity) AS sq, count(*) AS nq FROM lf GROUP BY 1
      |)
      |SELECT CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 100.0 / 7.0 AS avg_yearly,
      |  count(*) AS n
      |FROM lf JOIN q USING (l_partkey)
      |WHERE l_quantity * 5.0 * nq < sq""".stripMargin

  /** TPC-H Q22 (global sales opportunity), adapted to the fixture
    * customer schema (nationkey stands in for the phone country code):
    * customers richer than the average POSITIVE account balance with no
    * orders in the last two years of the clock (every fixture customer has SOME
    * order, so the faithful never-ordered form is vacuous — dormancy
    * keeps the NOT EXISTS arm meaningful), grouped by nation.
    * Scalar-subquery filter + anti join + aggregate — the classic
    * dormant-account report.
    *
    * Exactness: balances quantize to cents (`floor(x*100+0.5)` rounds
    * half-toward-+inf identically for the negative balances in the
    * fixture), the above-average test is the cross-multiplied integer
    * inequality `bal * n > total` (same pattern as `above_mean_events`),
    * and the output sums are exact cents presented via one division.
    *
    * Scale shape: the 1-row positive-balance aggregate broadcasts under
    * every customer row; the no-orders check is an anti join on the
    * customer key (at 100 TB: the one unavoidable shuffle — or a
    * broadcast of the rich-customer set, which the optimizer picks when
    * it fits); one |nations|-key agg out. */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        Analytics.cents(col("c_acctbal")).as("bal_c"))
    val tot = c.filter(col("bal_c") > 0L)
      .agg(sum("bal_c").as("s"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(tot))
      .filter(col("bal_c") * col("n") > col("s"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        (sum("bal_c").cast("double") / 100.0).as("totacctbal"))
  }

  val q22Sql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
      |  FROM customer
      |), t AS (
      |  SELECT CAST(sum(bal_c) AS BIGINT) AS s, count(*) AS n
      |  FROM c WHERE bal_c > 0
      |)
      |SELECT c_nationkey, count(*) AS numcust,
      |  CAST(sum(bal_c) AS DOUBLE) / 100.0 AS totacctbal
      |FROM c CROSS JOIN t
      |WHERE bal_c * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY 1""".stripMargin

  /** TPC-H Q8 (national market share): of the PROMO-part revenue sold
    * into ASIA-customer orders in 1996–1997, what share came from
    * NATION_2 suppliers, per order year. Completes the no-`partsupp`
    * TPC-H surface together with [[q12PriorityLateness]] and
    * [[q21WaitingSupplier]] (q2/q9/q11/q16/q20 need the `partsupp`
    * table, which the fixtures don't ship — documented delta).
    *
    * Scale shape: the part filter (PROMO ≈ 1/6 of parts) broadcasts and
    * prunes lineitem FIRST — at 100 TB that is the big win, the fact
    * table shrinks before its only shuffle. Orders prune on the 2-year
    * date range at the scan, then join customers-of-ASIA on the custkey
    * shuffle (1/5 of all customers — deliberately NOT broadcast,
    * customer scales with the fact side; q10 precedent). One orderkey
    * shuffle joins the two pruned sides; supplier⋈nation broadcasts.
    * Output is |years| rows.
    *
    * Exactness: volumes are exact DECIMAL sums; the share is ONE
    * double division of the two decimal-cast sums, identical operand
    * values and one correctly-rounded op in both engines. The
    * numerator uses a 0-decimal `otherwise` so a NATION_2-free year is
    * an exact 0, not NULL. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val zero = lit(0).cast(DecimalType(18, 4))
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
      .select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val sn = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", discPrice).otherwise(zero))
          .cast(DecimalType(38, 4)).as("nv"),
        sum(discPrice).cast(DecimalType(38, 4)).as("tv"),
        count(lit(1)).as("n_lines"))
      .select(col("o_year"),
        (col("nv").cast("double") / col("tv").cast("double")).as("mkt_share"),
        col("nv").cast("double").as("nation_volume"),
        col("tv").cast("double").as("total_volume"),
        col("n_lines"))
  }

  val q8Sql: String =
    """WITH j AS (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) *
      |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol,
      |    n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |  JOIN orders ON l_orderkey = o_orderkey
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |)
      |SELECT CAST(o_year AS INT) AS o_year,
      |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE)
      |    / CAST(CAST(sum(vol) AS DECIMAL(38,4)) AS DOUBLE) AS mkt_share,
      |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS nation_volume,
      |  CAST(CAST(sum(vol) AS DECIMAL(38,4)) AS DOUBLE) AS total_volume,
      |  count(*) AS n_lines
      |FROM j GROUP BY 1""".stripMargin

  /** TPC-H Q12 (shipping-mode priority), adapted to the fixture
    * lineitem schema: there is no `l_shipmode`/`l_commitdate`/
    * `l_receiptdate`, so the grouping dimension is the LATENESS TIER of
    * the line (shipped ≤30 / ≤90 / >90 days after the order date) and
    * "late receipt" becomes "shipped in 1997". The analytical shape is
    * the faithful one: fact⋈dim date-window join feeding a dual
    * conditional aggregation (urgent vs non-urgent order counts per
    * bucket) — the classic operational-lateness report.
    *
    * Scale: lineitem prunes to the ship-year at the scan; one orderkey
    * shuffle; 3-row output. */
  def q12PriorityLateness(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_shipdate")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "ON-TIME")
          .when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "LATE")
          .otherwise("VERY-LATE").as("lateness_tier"),
        high.as("high"))
      .groupBy("lateness_tier")
      .agg(sum(when(col("high"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("high"), 0L).otherwise(1L)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT
      |  CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'ON-TIME'
      |       WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'LATE'
      |       ELSE 'VERY-LATE' END AS lateness_tier,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" is
    * `l_shipdate > o_orderdate + 90 days` (no commit/receipt dates in
    * the fixture) and the nation filter widens to region ASIA (100
    * suppliers total, 4/nation — a single nation would leave ~4 rows).
    * Faithful correlate semantics via the standard per-order rewrite:
    * a supplier kept order o waiting iff o is 'F', o has lines from
    * MORE THAN ONE supplier (the EXISTS arm), and the supplier is the
    * ONLY one with a late line in o (the NOT EXISTS arm). Instead of
    * the textbook double self-join of lineitem, ONE orderkey-shuffle
    * aggregation computes per order the distinct-supplier count, the
    * distinct-LATE-supplier count, and (valid exactly when the latter
    * is 1) that lone late supplier — then a |suppliers|-key count and a
    * broadcast name join. At 100 TB this is one fact shuffle instead of
    * three; the correlated subqueries cost nothing extra because they
    * fold into the same per-order pass. */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val perOrder = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
      .join(Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_suppkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("nsupp"),
        countDistinct(when(late, col("l_suppkey"))).as("nlate"),
        max(when(late, col("l_suppkey"))).as("late_supp"))
      .filter(col("nsupp") > 1 && col("nlate") === 1)
    val sAsia = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
              .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    // output carries the KEY alongside the display name: replicated
    // fixtures (MakeSfN) duplicate s_name across suppkey ranges, so a
    // name-grouped result would silently merge distinct suppliers
    perOrder.groupBy("late_supp").agg(count(lit(1)).as("numwait"))
      .join(broadcast(sAsia), col("late_supp") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
  }

  val q21Sql: String =
    """WITH per_order AS (
      |  SELECT o_orderkey,
      |    count(DISTINCT l_suppkey) AS nsupp,
      |    count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |      THEN l_suppkey END) AS nlate,
      |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |      THEN l_suppkey END) AS late_supp
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, count(*) AS numwait
      |FROM per_order
      |JOIN supplier ON late_supp = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |WHERE nsupp > 1 AND nlate = 1
      |GROUP BY 1, 2""".stripMargin

  /** CDC changelog compaction (latest-wins + tombstones): collapse the
    * event changelog to the CURRENT state per key — the last record per
    * key under the changelog order wins; a key whose last record is a
    * tombstone (`event_type = 'error'` in the fixture vocabulary) is
    * dropped entirely. This is the Debezium/Delta `MERGE`-compaction
    * shape: a 100 TB table of upserts collapses to one row per live key.
    *
    * Plan shape: the latest-record pick runs on the native bounded-heap
    * operator ([[graft.plans.TopKPerKey]], k=1) — each map task reduces
    * every key to ONE row before the exchange, so a hot key (a
    * high-churn entity with millions of updates) crosses the shuffle as
    * one row per map partition instead of its full history, and nothing
    * sorts. The tombstone filter runs AFTER the pick (a tombstone must
    * suppress older non-tombstone versions, so it cannot be pushed below
    * the max). */
  def changelogCompact(spark: SparkSession, dir: String): DataFrame = {
    val log = Detectors.prepareEvents(Tables.events(spark, dir))
      .select(col("key"), col("event_id"), col("event_type"), col("value"),
        col("ts_sec"), col("ts_ns"))
    graft.plans.TopKPerKey.topK(log,
        keys = Seq(col("key")),
        order = Seq(col("ts_ns").desc, col("event_id").desc),
        k = 1)
      .filter(col("event_type") =!= "error")
      .drop("ts_ns")
  }

  val changelogCompactSql: String =
    """SELECT "key", event_id, event_type, value, ts_sec FROM (
      |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
      |    event_id, event_type, value,
      |    epoch_ns(ts) // 1000000000 AS ts_sec,
      |    row_number() OVER (
      |      PARTITION BY coalesce(CAST(user_id AS VARCHAR), '__unknown__')
      |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  /** Z-order layout audit: interleave the bits of two predicate
    * dimensions (key bucket × value bucket) into one Morton code, bucket
    * rows by the code's high byte (= the file a Z-ordered writer would
    * put them in), and report each file's min/max envelope in BOTH
    * dimensions. A linear layout is clustered on at most one dimension;
    * the Z-curve bounds the envelope in both (each 256-code file spans a
    * 16×16 tile of the 256×256 grid), which is what lets min/max
    * zonemaps skip files for predicates on EITHER column — the
    * Delta/Iceberg `OPTIMIZE ZORDER BY` rationale, measured rather than
    * asserted (`ZOrderSpec` pins the envelope bound; `tools/LayoutProbe`
    * measures the row-group skipping it buys).
    *
    * Scale shape: the Morton code is a scan-side projection (16 shifted
    * AND terms, whole-stage codegen'd — no UDF), and the audit is one
    * map-combinable groupBy on the code's high byte. The full rewrite at
    * 100 TB is `repartitionByRange(z)` + sorted write; the audit costs
    * one shuffle of 6 small columns. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    // bit k of bx lands at Morton bit 2k+1, bit k of by at 2k; all moves
    // are shifts/masks on longs — no division, nothing leaves integer space
    val bx = coalesce(pmod(col("user_id"), lit(256L)), lit(255L))
    val by = least(shiftright(Analytics.cents(coalesce(col("value"), lit(0.0))), 9), lit(255L))
    val z = (0 until 8).map { k =>
      (shiftright(col("bx"), k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1))) +
        (shiftright(col("by"), k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)))
    }.reduce(_ + _)
    Tables.events(spark, dir)
      .select(bx.as("bx"), by.cast("long").as("by"))
      .withColumn("file_id", shiftright(z, 8))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("bx").as("bx_min"), max("bx").as("bx_max"),
        min("by").as("by_min"), max("by").as("by_max"))
  }

  val zorderLayoutSql: String = {
    val inter = (0 until 8).map { k =>
      s"((bx >> $k) & 1) * ${1L << (2 * k + 1)} + ((by >> $k) & 1) * ${1L << (2 * k)}"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT coalesce(user_id % 256, 255) AS bx,
       |    least(CAST(floor(coalesce(value, 0.0) * 100.0 + 0.5) AS BIGINT) // 512,
       |          255) AS by
       |  FROM events)
       |SELECT ($inter) // 256 AS file_id, count(*) AS n_rows,
       |  min(bx) AS bx_min, max(bx) AS bx_max,
       |  min(by) AS by_min, max(by) AS by_max
       |FROM b GROUP BY 1""".stripMargin
  }

  /** k-anonymity audit over the customer quasi-identifiers
    * `(c_nationkey, c_mktsegment)`: for each level of the generalization
    * lattice — full QI, segment suppressed, fully suppressed — report
    * the equivalence-class profile (class count, smallest class, rows
    * and classes below k=10). The release decision a privacy review
    * makes before training data ships: which generalization level first
    * satisfies k-anonymity, and how many records the finer levels
    * expose.
    *
    * One pass: `ROLLUP(nation, segment)` computes all three lattice
    * levels in a single map-combinable aggregate (partial aggregation
    * handles the fan-out before the one exchange); the per-level re-agg
    * touches only class-count rows. `lvl` is the engine grouping-id
    * (0 = full QI, 1 = segment suppressed, 3 = all suppressed) — the
    * same bit semantics in Spark (`grouping_id`) and DuckDB
    * (`GROUPING(a, b)`). */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame = {
    val k = lit(10L)
    Tables.customer(spark, dir)
      .rollup(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), grouping_id().as("lvl"))
      .groupBy("lvl")
      .agg(count(lit(1)).as("n_classes"),
        min("cnt").as("min_class"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(lit(0L))).as("rows_below_k"),
        sum(when(col("cnt") < k, lit(1L)).otherwise(lit(0L))).as("classes_below_k"))
  }

  val kAnonymityAuditSql: String =
    """WITH classes AS (
      |  SELECT GROUPING(c_nationkey, c_mktsegment) AS lvl, count(*) AS cnt
      |  FROM customer
      |  GROUP BY ROLLUP(c_nationkey, c_mktsegment))
      |SELECT lvl, count(*) AS n_classes, min(cnt) AS min_class,
      |  CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END) AS BIGINT) AS rows_below_k,
      |  CAST(sum(CASE WHEN cnt < 10 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_k
      |FROM classes GROUP BY 1""".stripMargin

  /** l-diversity audit — [[kAnonymityAudit]]'s necessary companion: a
    * class can satisfy k-anonymity and still leak its sensitive
    * attribute when every member SHARES one value (the homogeneity
    * attack k-anonymity does not see). Quasi-identifier `c_nationkey`,
    * sensitive attribute `c_mktsegment`: per equivalence class report
    * size, distinct sensitive values (the diversity l), the dominant
    * value's share in exact fixed point, and the l>=3 release flag.
    *
    * One (nation, segment) count, then a per-nation re-agg over
    * class-count rows only — the distinct-count never runs as a
    * count(DISTINCT) over raw rows, so both shuffles carry aggregated
    * rows and the plan is two map-combinable exchanges regardless of
    * corpus size. Dominant share = max(cnt)*1e6 / sum(cnt) in integer
    * floor division, exact cross-engine. */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("c_nationkey")
      .agg(sum("cnt").cast("long").as("class_size"),
        count(lit(1)).as("l_distinct"),
        max("cnt").cast("long").as("top_sensitive_cnt"))
      .select(col("c_nationkey"), col("class_size"), col("l_distinct"),
        expr("top_sensitive_cnt * 1000000L div class_size")
          .as("dominant_share_fp"),
        (col("l_distinct") >= 3L).as("l3_ok"))
  }

  val lDiversityAuditSql: String =
    """WITH sv AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS cnt
      |  FROM customer GROUP BY 1, 2)
      |SELECT c_nationkey,
      |  CAST(sum(cnt) AS BIGINT) AS class_size,
      |  count(*) AS l_distinct,
      |  CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT) AS dominant_share_fp,
      |  count(*) >= 3 AS l3_ok
      |FROM sv GROUP BY 1""".stripMargin

  /** t-closeness audit (Li-Li-Venkatasubramanian 2007) — the triad's
    * third gate: a class can be k-anonymous AND l-diverse while its
    * sensitive-value DISTRIBUTION still diverges from the table's (the
    * skewness attack: 90% of one class is the rare segment even though
    * all five appear). For the categorical sensitive attribute the
    * distance is total variation,
    * t = ½ Σ_s |P_class(s) − P_global(s)|, kept in exact integer space
    * by clearing denominators: Σ_s |cnt_cs·N − cnt_s·n_c| over
    * 2·n_c·N, reported as 1e-6 fixed point with the t ≤ 0.2 release
    * flag (the paper's running example threshold).
    *
    * The sum must run over every GLOBAL sensitive value — a value absent
    * from the class contributes its full global mass — so the frame is
    * the (class × sensitive-domain) grid: a broadcast cross of the class
    * totals against the sensitive-value margin (the sensitive domain is
    * enumerable by definition of the audit — 5 segments here), left-join
    * the observed class-value counts, zero-fill. Every input to the grid
    * is an already-aggregated count table, so nothing row-scale ever
    * joins or shuffles twice. */
  def tClosenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val cs = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt_cs"))
    val g = cs.groupBy("c_mktsegment").agg(sum("cnt_cs").cast("long").as("cnt_s"))
    val n = cs.groupBy("c_nationkey").agg(sum("cnt_cs").cast("long").as("n_c"))
    val tot = g.agg(sum("cnt_s").cast("long").as("n_total"))
    n.crossJoin(broadcast(g)).crossJoin(broadcast(tot))
      .join(cs, Seq("c_nationkey", "c_mktsegment"), "left")
      .na.fill(0L, Seq("cnt_cs"))
      .withColumn("term",
        abs(col("cnt_cs") * col("n_total") - col("cnt_s") * col("n_c")))
      .groupBy("c_nationkey")
      .agg(max("n_c").as("class_size"),
        sum("term").as("tvd_num"),
        expr("sum(term) * 1000000L div (2L * max(n_c) * max(n_total))")
          .as("tvd_fp"))
      .withColumn("t02_ok", col("tvd_fp") <= 200000L)
  }

  val tClosenessAuditSql: String =
    """WITH cs AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS cnt_cs
      |  FROM customer GROUP BY 1, 2
      |), g AS (
      |  SELECT c_mktsegment, CAST(sum(cnt_cs) AS BIGINT) AS cnt_s
      |  FROM cs GROUP BY 1
      |), n AS (
      |  SELECT c_nationkey, CAST(sum(cnt_cs) AS BIGINT) AS n_c
      |  FROM cs GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(cnt_s) AS BIGINT) AS n_total FROM g
      |), grid AS (
      |  SELECT n.c_nationkey, n.n_c, g.c_mktsegment, g.cnt_s, tot.n_total,
      |    coalesce(cs.cnt_cs, 0) AS cnt_cs
      |  FROM n CROSS JOIN g CROSS JOIN tot
      |  LEFT JOIN cs USING (c_nationkey, c_mktsegment)
      |)
      |SELECT c_nationkey,
      |  CAST(max(n_c) AS BIGINT) AS class_size,
      |  CAST(sum(abs(cnt_cs * n_total - cnt_s * n_c)) AS BIGINT) AS tvd_num,
      |  CAST(sum(abs(cnt_cs * n_total - cnt_s * n_c)) * 1000000
      |    // (2 * max(n_c) * max(n_total)) AS BIGINT) AS tvd_fp,
      |  CAST(sum(abs(cnt_cs * n_total - cnt_s * n_c)) * 1000000
      |    // (2 * max(n_c) * max(n_total)) AS BIGINT) <= 200000 AS t02_ok
      |FROM grid GROUP BY 1""".stripMargin

  // ------------------------------------------ portable Bloom pre-join audit

  private val bloomM = 8192 // bits; build side here sets ~900 => FP ~0.1%
  private val bloomHashes = 3

  /** One of the [[bloomHashes]] salted positions of `key` in the m-bit
    * Bloom space — md5-derived like every portable hash here (kmvHash). */
  private def bloomPos(i: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"bf$i:"), key.cast("string"))), 1, 12), 16, 10)
      .cast("long") % bloomM

  private def bloomPosSql(i: Int, key: String): String =
    s"CAST(('0x' || substr(md5('bf$i:' || CAST($key AS VARCHAR)), 1, 12)) AS BIGINT) % $bloomM"

  /** Explicit portable Bloom-filter pre-join pruning, with its false-
    * positive rate OBSERVED against the exact semi-join — the auditable
    * sibling of the engine's own adaptive runtime filter (which
    * RuntimeFilterSpec pins landing as `might_contain` on this very join
    * shape, but whose bits no one can inspect cross-engine).
    *
    * Join under audit: orders of BUILDING-segment customers. The build
    * side (segment customers) reduces to its DISTINCT set bit positions —
    * at most m = 8192 rows no matter how many build keys there are (the
    * saturation property that makes a Bloom the right 100 TB runtime
    * filter: the broadcast is O(m), never O(build)). Each fact row
    * probes its k = 3 salted positions via three broadcast left-semi
    * joins — set-semantics identical to testing bits in the bitmap, with
    * zero bit-twiddling to diverge between engines — so the whole fact
    * pruning happens scan-side BEFORE any shuffle of the fact table.
    * No false negative is possible by construction; the report counts
    * the candidates a real pre-filter would pass (true matches + Bloom
    * collisions) next to the exact semi-join, making the claimed FP rate
    * (~(1-e^(-kn/m))^k ≈ 0.1% here) a measured number, not a belief. */
  /** The build side (segment customers) of [[bloomPruneAudit]]. */
  private def bloomBuild(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))

  /** The pruned-candidate stage of [[bloomPruneAudit]] — exposed so the
    * plan invariant can pin its shape (broadcast semi-joins only, fact
    * scan pruned to the two referenced columns). */
  private[graft] def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val bits = bloomBuild(spark, dir).select(explode(array(
        (1 to bloomHashes).map(i => bloomPos(i, col("c_custkey"))): _*)).as("pos"))
      .distinct()
    (1 to bloomHashes).foldLeft(
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))) {
      case (df, i) =>
        df.join(broadcast(bits.withColumnRenamed("pos", s"p$i")),
          bloomPos(i, col("o_custkey")) === col(s"p$i"), "left_semi")
    }
  }

  def bloomPruneAudit(spark: SparkSession, dir: String): DataFrame = {
    val seg = bloomBuild(spark, dir)
    val probe = bloomProbe(spark, dir)
    val trueSemi = Tables.orders(spark, dir)
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"), "left_semi")
    val nFact = Tables.orders(spark, dir).count()
    val nBuild = seg.count()
    val nCand = probe.count()
    val nTrue = trueSemi.count()
    import spark.implicits._
    Seq((nFact, nBuild, nCand, nTrue, nCand - nTrue))
      .toDF("n_fact", "n_build", "n_candidates", "n_true", "n_false_pos")
      .withColumn("fp_rate", // exact-operand double division, both engines IEEE
        col("n_false_pos").cast("double") /
          (col("n_fact") - col("n_true")).cast("double"))
  }

  val bloomPruneAuditSql: String = {
    def probes(key: String): String =
      (1 to bloomHashes)
        .map(i => s"${bloomPosSql(i, key)} IN (SELECT pos FROM bp)")
        .mkString(" AND ")
    s"""WITH seg AS (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       |), bp AS (
       |${(1 to bloomHashes)
           .map(i => s"  SELECT DISTINCT ${bloomPosSql(i, "c_custkey")} AS pos FROM seg")
           .mkString("\n  UNION\n")}
       |), cand AS (
       |  SELECT o_orderkey FROM orders WHERE ${probes("o_custkey")}
       |), tr AS (
       |  SELECT o_orderkey FROM orders
       |  WHERE o_custkey IN (SELECT c_custkey FROM seg)
       |), c AS (
       |  SELECT (SELECT count(*) FROM orders) AS n_fact,
       |    (SELECT count(*) FROM seg) AS n_build,
       |    (SELECT count(*) FROM cand) AS n_candidates,
       |    (SELECT count(*) FROM tr) AS n_true
       |)
       |SELECT n_fact, n_build, n_candidates, n_true,
       |  n_candidates - n_true AS n_false_pos,
       |  CAST(n_candidates - n_true AS DOUBLE) / CAST(n_fact - n_true AS DOUBLE)
       |    AS fp_rate
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------- dataset profiler

  /** Per-column profiling card over the event stream — the first query
    * every data platform runs against an unknown 100 TB table: row/null/
    * distinct counts and the modal value per column, one row per column.
    *
    * Shape: ONE corpus-scale pass — a `stack` unpivot (scan-side
    * projection, no shuffle) into (col_name, val) feeding a single
    * map-combinable (col_name, val) hash agg. Every downstream metric
    * (null count, distinct count, mode) re-aggregates those VALUE-LEVEL
    * counts, never the corpus: n_distinct is a count over the value
    * domain, and the mode is the native bounded-heap top-1 per column
    * ([[graft.plans.TopKPerKey]]), so even a column whose value domain
    * is itself huge (props: ~every row distinct) ships k rows per map
    * task, not its domain. Doubles are profiled in the house integer
    * cents quantization (v_cents) — cross-engine double-to-string
    * formatting is undefined territory, BIGINT-to-string is exact. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.events(spark, dir)
      .withColumn("v_cents",
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
      .select(expr(
        // purchase_cents is a SPARSE column (null off the purchase path) —
        // the driver fixtures ship no physical nulls, so the profiler's
        // null branch is exercised by a derived optional field, the shape
        // data cards actually meet (sparsely-populated optional columns)
        """stack(5,
          |  'event_type', event_type,
          |  'user_id', CAST(user_id AS STRING),
          |  'v_cents', CAST(v_cents AS STRING),
          |  'purchase_cents',
          |    CAST(IF(event_type = 'purchase', v_cents, NULL) AS STRING),
          |  'props', props) AS (col_name, val)""".stripMargin))
      .groupBy(col("col_name"), col("val"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // three consumers below; the corpus is gone already
    val stats = cnts.groupBy("col_name").agg(
      sum("n").as("n_rows"),
      sum(when(col("val").isNull, col("n")).otherwise(lit(0L))).as("n_null"),
      sum(when(col("val").isNull, lit(0L)).otherwise(lit(1L))).as("n_distinct"))
    val mode = graft.plans.TopKPerKey.topK(
      cnts.filter(col("val").isNotNull),
      keys = Seq(col("col_name")),
      order = Seq(col("n").desc, col("val").asc),
      k = 1)
      .select(col("col_name"), col("val").as("top_val"), col("n").as("top_n"))
    stats.join(mode, "col_name")
  }

  val columnProfileSql: String =
    """WITH u AS (
      |  SELECT 'event_type' AS col_name, event_type AS val FROM events
      |  UNION ALL
      |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      |  UNION ALL
      |  SELECT 'v_cents', CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR)
      |  FROM events
      |  UNION ALL
      |  SELECT 'purchase_cents',
      |    CAST(CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END AS VARCHAR)
      |  FROM events
      |  UNION ALL
      |  SELECT 'props', props FROM events
      |), cnts AS (
      |  SELECT col_name, val, count(*) AS n FROM u GROUP BY 1, 2
      |), stats AS (
      |  SELECT col_name, CAST(sum(n) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN val IS NULL THEN n ELSE 0 END) AS BIGINT) AS n_null,
      |    CAST(sum(CASE WHEN val IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_distinct
      |  FROM cnts GROUP BY 1
      |), mode AS (
      |  SELECT col_name, val AS top_val, n AS top_n FROM (
      |    SELECT col_name, val, n, row_number() OVER (
      |      PARTITION BY col_name ORDER BY n DESC, val ASC) AS rn
      |    FROM cnts WHERE val IS NOT NULL)
      |  WHERE rn = 1
      |)
      |SELECT s.col_name, s.n_rows, s.n_null, s.n_distinct, m.top_val, m.top_n
      |FROM stats s JOIN mode m ON s.col_name = m.col_name""".stripMargin

  // -------------------------------------------------- skyline (Pareto front)

  private val skyBucketCents = 10000L // $100 price buckets for the grid prune

  /** Skyline (Pareto-front) query over parts: every part not dominated on
    * (price, size) — no other part is cheaper-or-equal AND smaller-or-
    * equal with at least one strict — the classic multi-criteria shortlist
    * ("show me the frontier, not the catalog").
    *
    * Two-phase plan (Börzsönyi et al. 2001's block-nested-loop made
    * distributive): the naive dominance test is all-pairs, and the naive
    * sorted-scan needs a GLOBAL sort — both banned shapes. Instead:
    *  1. GRID PRUNE, scan-side: bucket prices into $100 cells, take each
    *     cell's min size (one tiny agg), and the running min over
    *     strictly-lower cells via a cell×cell self-join (grid × grid,
    *     bounded by the price range, never the catalog). A part survives
    *     only if its size beats every strictly-cheaper cell's minimum —
    *     for uniform data this leaves O(cells + skyline) candidates out
    *     of the whole catalog, and the filter is a broadcast hash join
    *     against the cell table.
    *  2. EXACT dominance among the surviving candidates only: a broadcast
    *     anti-join with the full strict-in-one predicate. Candidates are
    *     frontier-sized, so the quadratic check is on a set that no
    *     longer grows with the catalog.
    * The oracle proves the same point set through a different algorithm
    * entirely (min-size-per-price + a window running min), so a tie or
    * strictness bug in either phase cannot hide. */
  def priceSizeSkyline(spark: SparkSession, dir: String): DataFrame = {
    val pp = Tables.part(spark, dir).select(col("p_partkey"),
      expr("CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)").as("price_cents"),
      col("p_size").cast("long").as("p_size"))
    val cells = pp.groupBy(expr(s"price_cents div $skyBucketCents").as("cell"))
      .agg(min("p_size").as("ms"))
    // running min over STRICTLY lower cells: grid × grid, both tiny
    val lower = cells.as("c").join(cells.as("l"), col("l.cell") < col("c.cell"), "left")
      .groupBy(col("c.cell").as("cell")).agg(min(col("l.ms")).as("prior_ms"))
    val cand = pp
      .join(broadcast(lower), expr(s"price_cents div $skyBucketCents") === col("cell"))
      .filter(col("prior_ms").isNull || col("p_size") < col("prior_ms"))
      .select("p_partkey", "price_cents", "p_size")
    val candB = Dedup.eager(cand)
    candB.as("a").join(broadcast(candB.as("b")),
        col("b.price_cents") <= col("a.price_cents") &&
        col("b.p_size") <= col("a.p_size") &&
        (col("b.price_cents") < col("a.price_cents") ||
          col("b.p_size") < col("a.p_size")),
        "left_anti")
      .select(col("a.p_partkey").as("p_partkey"),
        col("a.price_cents").as("price_cents"), col("a.p_size").as("p_size"))
  }

  val priceSizeSkylineSql: String =
    """WITH pp AS (
      |  SELECT p_partkey,
      |    CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
      |    CAST(p_size AS BIGINT) AS p_size
      |  FROM part
      |), pm AS (
      |  SELECT price_cents, min(p_size) AS ms FROM pp GROUP BY 1
      |), cm AS (
      |  SELECT price_cents, ms, min(ms) OVER (ORDER BY price_cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_min
      |  FROM pm
      |), sk AS (
      |  SELECT price_cents, ms FROM cm
      |  WHERE prior_min IS NULL OR ms < prior_min
      |)
      |SELECT pp.p_partkey, pp.price_cents, pp.p_size
      |FROM pp JOIN sk
      |  ON pp.price_cents = sk.price_cents AND pp.p_size = sk.ms""".stripMargin

  // ------------------------------------------------- snapshot reconciliation

  /** Snapshot diff / reconciliation — the "what changed between these two
    * states" operator behind every incremental-sync and data-quality
    * check: entities are (user, event_type) streams, an entity's state is
    * its latest value band (latest-wins by (ts, event_id), band =
    * v_cents div 5000 — reconciliation compares normalized state, not raw
    * readings), and the two snapshots are the first and last 10-day
    * windows. The report classifies every entity: added (only in B),
    * removed (only in A), changed / unchanged (both, by band equality).
    *
    * Shape: each snapshot's latest-per-entity runs on the bounded heap
    * (k = 1 per entity per map task crosses the wire — the
    * [[changelogCompact]] shape); the diff is ONE full-outer hash join
    * of two one-row-per-entity frames and a 4-way conditional count.
    * All four classes are live on the fixtures (10/11/367/361). */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    def snap(pred: Column): DataFrame =
      graft.plans.TopKPerKey.topK(
        Tables.events(spark, dir)
          .filter(col("user_id").isNotNull && pred)
          .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT) div 5000").as("band")),
        keys = Seq(col("user_id"), col("event_type")),
        order = Seq(col("ts_ns").desc, col("event_id").desc),
        k = 1)
        .select(col("user_id"), col("event_type"), col("band"))
    // presence is tracked by an explicit marker, NOT by band nullness: a
    // NULL value row would make band NULL and misclassify a both-sides
    // entity as added/removed (review finding; latent only because the
    // driver fixtures ship no NULL values — the oracle checks key
    // nullness, which full_outer coalesces away on the Spark side)
    val a = snap(dayofmonth(col("ts")) <= 10)
      .withColumnRenamed("band", "band_a").withColumn("in_a", lit(true))
    val b = snap(dayofmonth(col("ts")) >= 21)
      .withColumnRenamed("band", "band_b").withColumn("in_b", lit(true))
    a.join(b, Seq("user_id", "event_type"), "full_outer")
      .withColumn("diff_class",
        when(col("in_a").isNull, "added")
          .when(col("in_b").isNull, "removed")
          .when(col("band_a") <=> col("band_b"), "unchanged")
          .otherwise("changed"))
      .groupBy("diff_class").agg(count(lit(1)).as("n"))
  }

  val snapshotDiffSql: String = {
    def snap(pred: String): String =
      s"""SELECT user_id, event_type, band FROM (
         |  SELECT user_id, event_type,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000 AS band,
         |    row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
         |  FROM events WHERE user_id IS NOT NULL
         |    AND CAST(strftime(ts, '%d') AS INT) $pred)
         |WHERE rn = 1""".stripMargin
    s"""WITH a AS (
       |${snap("<= 10")}
       |), b AS (
       |${snap(">= 21")}
       |), j AS (
       |  SELECT CASE
       |    WHEN a.user_id IS NULL THEN 'added'
       |    WHEN b.user_id IS NULL THEN 'removed'
       |    -- null-safe like the Spark side's <=>: a both-sides entity
       |    -- whose value (hence band) is NULL in both snapshots must
       |    -- classify 'unchanged', not 'changed', the day fixtures gain
       |    -- NULL values
       |    WHEN a.band IS NOT DISTINCT FROM b.band THEN 'unchanged'
       |    ELSE 'changed' END AS diff_class
       |  FROM a FULL JOIN b
       |    ON a.user_id = b.user_id AND a.event_type = b.event_type
       |)
       |SELECT diff_class, count(*) AS n FROM j GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------- freshness report

  /** Data-freshness report — the first page of every pipeline dashboard:
    * per time-bearing table, the row count, the newest timestamp, the
    * corpus-wide reference clock (the max across all tables — batch
    * fixtures have no wall clock, so the freshest table defines "now",
    * exactly how warehouse freshness SLAs are measured against the most
    * recent load), each table's staleness behind it in seconds, and the
    * rows that landed within the trailing 30 days of that table's own
    * horizon. One scan-side min/max/conditional-count agg per table;
    * the reference clock is a broadcast 1-row cross join. */
  def freshnessReport(spark: SparkSession, dir: String): DataFrame = {
    // two scan-side aggs per table: the trailing-window count needs the
    // table's own horizon, which the first 1-row agg broadcasts back — a
    // global window over the raw rows would funnel the scan through ONE
    // partition, the banned shape
    def one(tag: String, df: DataFrame, tsSec: Column): DataFrame = {
      val t = df.select(tsSec.as("t"))
      val mx = t.agg(count(lit(1)).as("n_rows"), max("t").as("max_sec"))
      val recent = t.crossJoin(broadcast(mx.select("max_sec")))
        .filter(col("t") >= col("max_sec") - 30L * 86400)
        .agg(count(lit(1)).as("rows_30d"))
      mx.crossJoin(broadcast(recent))
        .select(lit(tag).as("table_name"), col("n_rows"), col("max_sec"),
          col("rows_30d"))
    }
    val legs = one("events", Tables.events(spark, dir), col("ts_sec"))
      .unionByName(one("orders", Tables.orders(spark, dir),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000")))
      .unionByName(one("lineitem", Tables.lineitem(spark, dir),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 1000000")))
    val ref = legs.agg(max("max_sec").as("ref_sec"))
    legs.crossJoin(broadcast(ref))
      .withColumn("staleness_sec", col("ref_sec") - col("max_sec"))
  }

  val freshnessReportSql: String = {
    def one(tag: String, table: String, sec: String): String =
      s"""SELECT '$tag' AS table_name, count(*) AS n_rows,
         |  max($sec) AS max_sec,
         |  CAST(sum(CASE WHEN $sec >=
         |    (SELECT max($sec) FROM $table) - 30 * 86400
         |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_30d
         |FROM $table""".stripMargin
    s"""WITH legs AS (
       |${one("events", "events", "epoch_ns(ts) // 1000000000")}
       |UNION ALL
       |${one("orders", "orders", "epoch_ns(o_orderdate) // 1000000000")}
       |UNION ALL
       |${one("lineitem", "lineitem", "epoch_ns(l_shipdate) // 1000000000")}
       |), ref AS (SELECT max(max_sec) AS ref_sec FROM legs)
       |SELECT l.table_name, l.n_rows, l.max_sec, l.rows_30d, r.ref_sec,
       |  r.ref_sec - l.max_sec AS staleness_sec
       |FROM legs l CROSS JOIN ref r""".stripMargin
  }

  // ------------------------------------------------ revenue concentration

  /** Revenue-concentration (Pareto) report — what share of revenue the
    * top 1% and top 10% of customers carry: the 80/20 measurement behind
    * key-account risk, and the business-side face of [[skewReport]]'s
    * join-key skew (a revenue-concentrated customer base IS a skewed
    * o_custkey domain).
    *
    * Exactness: per-order cents quantization before any sum (the house
    * money rule), so every total is an exact integer; the only doubles
    * are the two reported shares. The percentile cutoffs are integer
    * ceil((n·p)/100) of the CUSTOMER count — a bounded driver scalar
    * (the adjudicated pattern: one count of the aggregated customer
    * domain, never of rows).
    *
    * Shape: one map-combinable revenue-per-customer agg; both top-k
    * selections run on the bounded heap (k rows per map task — no
    * global sort of the customer domain), the 1% cut re-heaping the 10%
    * result. Ties broken by (revenue desc, custkey asc), total order. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val cust = Dedup.eager(Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("rev")))
    val n = cust.count()
    val k1 = ((n + 99) / 100).toInt
    val k10 = ((n + 9) / 10).toInt
    def top(df: DataFrame, k: Int): DataFrame =
      graft.plans.TopKPerKey.topK(df.withColumn("g", lit(1)),
        keys = Seq(col("g")), order = Seq(col("rev").desc, col("o_custkey").asc),
        k = k)
    val top10 = Dedup.eager(top(cust, k10).select("o_custkey", "rev"))
    val top1 = top(top10, k1)
    val total = cust.agg(sum("rev").as("total_cents"), count(lit(1)).as("n_customers"))
    val s10 = top10.agg(sum("rev").as("top10_cents"), count(lit(1)).as("top10_n"))
    val s1 = top1.agg(sum("rev").as("top1_cents"), count(lit(1)).as("top1_n"))
    total.crossJoin(broadcast(s1)).crossJoin(broadcast(s10))
      .withColumn("share1",
        col("top1_cents").cast("double") / col("total_cents").cast("double"))
      .withColumn("share10",
        col("top10_cents").cast("double") / col("total_cents").cast("double"))
  }

  val revenueConcentrationSql: String =
    """WITH cust AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1
      |), r AS (
      |  SELECT *, row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn,
      |    count(*) OVER () AS n
      |  FROM cust
      |), t AS (
      |  SELECT max(n) AS n_customers, CAST(sum(rev) AS BIGINT) AS total_cents,
      |    CAST(sum(CASE WHEN rn <= (n + 99) // 100 THEN rev ELSE 0 END) AS BIGINT)
      |      AS top1_cents,
      |    CAST(sum(CASE WHEN rn <= (n + 99) // 100 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS top1_n,
      |    CAST(sum(CASE WHEN rn <= (n + 9) // 10 THEN rev ELSE 0 END) AS BIGINT)
      |      AS top10_cents,
      |    CAST(sum(CASE WHEN rn <= (n + 9) // 10 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS top10_n
      |  FROM r
      |)
      |SELECT n_customers, total_cents, top1_n, top1_cents, top10_n, top10_cents,
      |  CAST(top1_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS share1,
      |  CAST(top10_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS share10
      |FROM t""".stripMargin

  // ------------------------------------------------ point-in-time features

  /** Point-in-time (PIT) feature join — the feature-store correctness
    * query: every order joins the customer attribute VERSION that was
    * valid when the order happened, against the
    * [[scd2CustomerHistory]] dimension. This is the join that prevents
    * training-serving skew (a model trained with today's customer segment
    * attached to last year's orders has leaked the future); `AS OF`
    * semantics are the whole reason the SCD2 history exists.
    *
    * The history's validity axis is the restatement epoch (0 = before the
    * update batch, 1 = after); orders map onto it by date (before/after
    * 1998-01-01, the corpus midpoint), and the PIT predicate is the
    * classic half-open interval: valid_from <= epoch < valid_to (null =
    * open). Exactly one version matches per order by SCD2 construction —
    * pinned by the oracle's row count (|orders|).
    *
    * Shape: the dimension is broadcast (<= 2 versions per key); the range
    * predicate is a residual filter on the <= 2 candidate versions after
    * the key equi-join — no band join, no window. The fact table never
    * shuffles. */
  def pitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val hist = scd2CustomerHistory(spark, dir)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderdate") < lit("1998-01-01").cast("date"), 0L)
          .otherwise(1L).as("epoch"))
    ord.join(broadcast(hist), col("o_custkey") === col("c_custkey") &&
        col("valid_from") <= col("epoch") &&
        (col("valid_to").isNull || col("epoch") < col("valid_to")))
      .select(col("o_orderkey"), col("o_custkey"), col("epoch"),
        col("version"), col("c_acctbal"), col("c_mktsegment"))
  }

  val pitFeaturesSql: String =
    s"""WITH hist AS (
       |  SELECT * FROM ($scd2CustomerHistorySql)
       |), ord AS (
       |  SELECT o_orderkey, o_custkey,
       |    CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
       |      THEN 0 ELSE 1 END AS epoch
       |  FROM orders
       |)
       |SELECT o.o_orderkey, o.o_custkey, CAST(o.epoch AS BIGINT) AS epoch,
       |  h.version, h.c_acctbal, h.c_mktsegment
       |FROM ord o JOIN hist h
       |  ON h.c_custkey = o.o_custkey
       |  AND h.valid_from <= o.epoch
       |  AND (h.valid_to IS NULL OR o.epoch < h.valid_to)""".stripMargin

  // ---------------------------------------------------- join-key skew report

  /** Join-key skew profile — the "should this join be salted?" report,
    * one row per (table, key) pair a pipeline joins or groups on: row and
    * key-domain counts, the hottest key and its share, and
    * `skew_fp` = hottest/mean in 1e-6 fixed point (1e6 = perfectly
    * uniform). This is the measurement behind every skew decision in this
    * engine (user_activity_salted, rate_alerts_sliced,
    * absence_alerts_sliced) promoted to a standing query: the decision
    * input lives next to the data, not in a notebook.
    *
    * Shape per profiled key: one map-combinable count-per-key agg; the
    * global stats re-aggregate the KEY DOMAIN (never the rows), and the
    * hottest key is the bounded-heap top-1. All-integer; the only
    * division is the fixed-point ratio. */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    def profile(tag: String, df: DataFrame, key: Column): DataFrame = {
      // NULL keys profile under the same '__unknown__' sentinel as
      // prepareEvents: a bare NULL group would hit the cross-engine
      // NULLS FIRST (Spark asc) vs NULLS LAST (DuckDB) divergence the
      // moment it ties for hottest key
      val cnts = df
        .select(coalesce(key.cast("string"), lit("__unknown__")).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val top = graft.plans.TopKPerKey.topK(
        cnts.withColumn("g", lit(1)),
        keys = Seq(col("g")), order = Seq(col("n").desc, col("k").asc), k = 1)
        .select(col("n").as("max_cnt"), col("k").as("top_key"))
      cnts.agg(sum("n").as("n_rows"), count(lit(1)).as("n_keys"))
        .crossJoin(broadcast(top))
        .select(lit(tag).as("profiled"), col("n_rows"), col("n_keys"),
          col("top_key"), col("max_cnt"),
          expr("(max_cnt * n_keys * 1000000) div n_rows").as("skew_fp"))
    }
    profile("events.user_id", Tables.events(spark, dir), col("user_id"))
      .unionByName(profile("events.event_type",
        Tables.events(spark, dir), col("event_type")))
      .unionByName(profile("lineitem.l_partkey",
        Tables.lineitem(spark, dir), col("l_partkey")))
      .unionByName(profile("orders.o_custkey",
        Tables.orders(spark, dir), col("o_custkey")))
  }

  val skewReportSql: String = {
    def one(tag: String, table: String, key: String): String = {
      val k = s"coalesce(CAST($key AS VARCHAR), '__unknown__')"
      s"""SELECT '$tag' AS profiled, CAST(sum(n) AS BIGINT) AS n_rows,
         |  count(*) AS n_keys,
         |  (SELECT k FROM (
         |    SELECT $k AS k, count(*) AS n FROM $table GROUP BY 1)
         |   ORDER BY n DESC, k LIMIT 1) AS top_key,
         |  (SELECT n FROM (
         |    SELECT $k AS k, count(*) AS n FROM $table GROUP BY 1)
         |   ORDER BY n DESC, k LIMIT 1) AS max_cnt,
         |  ((SELECT n FROM (
         |    SELECT $k AS k, count(*) AS n FROM $table GROUP BY 1)
         |   ORDER BY n DESC, k LIMIT 1) * count(*) * 1000000) // CAST(sum(n) AS BIGINT)
         |   AS skew_fp
         |FROM (SELECT $k AS k, count(*) AS n FROM $table GROUP BY 1)""".stripMargin
    }
    Seq(
      one("events.user_id", "events", "user_id"),
      one("events.event_type", "events", "event_type"),
      one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("orders.o_custkey", "orders", "o_custkey"),
    ).mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------- data-quality assertions

  /** Data-quality assertion SUITE (the dbt-test / Great-Expectations
    * staple) as ONE oracle-gated query: each invariant is a row —
    * population checked, violation count, pass verdict — so the pipeline
    * gate is `WHERE NOT pass` and the dashboard is the table itself.
    * Six checks over four tables: two null/uniqueness invariants, a
    * foreign-key check (orders→customer), a COMPLETENESS check
    * (orders must have lineitems — the one that FIRES on the fixtures:
    * 257 childless orders at sf0.01, so both verdict branches are
    * exercised), a domain-range check, and a derived-column consistency
    * check (documents.n_chars == length(text)).
    *
    * Shape: each check is one map-combinable aggregate (conditional sums
    * — never a row-level materialization of violations); the two
    * relationship checks are LEFT joins against the DISTINCT key set of
    * the child/parent (broadcast-sized after the distinct), summed in
    * the same pass. Six 1-row frames union — at 100 TB this is six
    * linear scans, or fewer if a caller fuses checks per table. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    val docs = Tables.documents(spark, dir)
    val c1 = ev.agg(count(lit(1)).as("n_checked"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("events_user_id_not_null").as("check_name"),
        col("n_checked"), col("n_violations"))
    // count(col) ignores NULLs in both engines, so nullity can never be
    // misreported as duplication (a NULL id is the OTHER check's job)
    val c2 = ev.agg(count(lit(1)).as("n_checked"),
        (count(col("event_id")) - countDistinct(col("event_id")))
          .as("n_violations"))
      .select(lit("events_event_id_unique").as("check_name"),
        col("n_checked"), col("n_violations"))
    val c3 = ord.join(cust.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("orders_custkey_fk").as("check_name"),
        col("n_checked"), col("n_violations"))
    val c4 = ord.join(li.select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("orders_have_lineitems").as("check_name"),
        col("n_checked"), col("n_violations"))
    val c5 = li.agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("n_violations"))
      .select(lit("lineitem_qty_range").as("check_name"),
        col("n_checked"), col("n_violations"))
    val c6 = docs.agg(count(lit(1)).as("n_checked"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("n_violations"))
      .select(lit("documents_nchars_consistent").as("check_name"),
        col("n_checked"), col("n_violations"))
    Seq(c1, c2, c3, c4, c5, c6).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }

  val dqChecksSql: String =
    """SELECT 'events_user_id_not_null' AS check_name,
      |  count(*) AS n_checked,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violations,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
      |    AS pass
      |FROM events
      |UNION ALL
      |SELECT 'events_event_id_unique', count(*),
      |  CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT),
      |  count(event_id) - count(DISTINCT event_id) = 0
      |FROM events
      |UNION ALL
      |SELECT 'orders_custkey_fk', count(*),
      |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM orders o
      |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |  ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'orders_have_lineitems', count(*),
      |  CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM orders o
      |LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
      |  ON o.o_orderkey = l.l_orderkey
      |UNION ALL
      |SELECT 'lineitem_qty_range', count(*),
      |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
      |    AS BIGINT) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'documents_nchars_consistent', count(*),
      |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |    AS BIGINT) = 0
      |FROM documents""".stripMargin

  // ------------------------------------------------- salting planner

  private[graft] val saltTargetRows = 64L

  /** SALT PLAN — the executable follow-up to [[skewReport]]: where the
    * report says WHETHER a key column is skewed, this emits the per-key
    * salt map a two-phase salted aggregation/join actually consumes.
    * Every `events.user_id` key whose row count exceeds the per-task
    * target gets `salt_factor = ceil(count / target)` (exact integer
    * ceil-division, `(n + T - 1) div T`); keys under the target are
    * omitted — the salt map must stay BROADCASTABLE, and "absent means
    * factor 1" is what keeps it O(hot keys), not O(keys), at 100 TB.
    * `max_task_rows` = ceil(count / factor) shows the post-salt bound a
    * reviewer checks against executor memory.
    *
    * This is the precomputed form of what the engineered operators do
    * inline (salted agg in `user_activity_salted`, sliced windows via
    * RateWindowRewrite, AQE skew-join splits — SCALE_NOTES): pipelines
    * that must salt a STABLE hot-key population (daily joins against the
    * same power users) plan it once and broadcast the map instead of
    * re-detecting per query. Shape: one map-combinable count agg, a
    * filter, per-row arithmetic — nothing wider than (key, two longs)
    * ever moves. */
  def saltPlan(spark: SparkSession, dir: String): DataFrame = {
    val t = saltTargetRows
    Tables.events(spark, dir)
      .select(coalesce(col("user_id").cast("string"), lit("__unknown__")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > t)
      .withColumn("salt_factor", expr(s"(n_rows + $t - 1) div $t"))
      .withColumn("max_task_rows",
        expr("(n_rows + salt_factor - 1) div salt_factor"))
      .select("key", "n_rows", "salt_factor", "max_task_rows")
  }

  val saltPlanSql: String =
    s"""WITH c AS (
       |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
       |    count(*) AS n_rows
       |  FROM events GROUP BY 1
       |), f AS (
       |  SELECT "key", n_rows,
       |    (n_rows + $saltTargetRows - 1) // $saltTargetRows AS salt_factor
       |  FROM c WHERE n_rows > $saltTargetRows
       |)
       |SELECT "key", n_rows, salt_factor,
       |  (n_rows + salt_factor - 1) // salt_factor AS max_task_rows
       |FROM f""".stripMargin

  // ------------------------------- TPC-H gap queries, fixture-adapted
  // (faithful Q2/Q9/Q11/Q16/Q20 need the partsupp table the fixtures do
  // not ship — supplycost/availqty have no stand-in — so each is adapted
  // to derive its supplier-part relation from lineitem while keeping the
  // query's defining PLAN SHAPE: argmin join-back, multi-dim profit
  // rollup, scalar-subquery HAVING, exclusion-list distinct count, and
  // nested semi-joins.)

  private def centsL(c: Column): Column = Analytics.cents(c)
  private def discPct: Column =
    floor(col("l_discount") * 100.0 + 0.5).cast("long")
  /** Line revenue in 1e-4 dollars (cents x (100 - discount%)) — exact
    * int64; headroom: a 2^63 sum is ~$9e14, beyond any fixture or real
    * corpus year. */
  private def revFp: Column = centsL(col("l_extendedprice")) * (lit(100L) - discPct)
  private val revFpSql: String =
    """CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
      |      (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))""".stripMargin

  /** TPC-H Q2 (min-cost supplier), adapted: for each PROMO size-15 part,
    * the EUROPE supplier with the lowest observed unit price — unit cost
    * derives from lineitem (`extendedprice/quantity`, exact 1e-4-dollar
    * fixed point via integer division; quantities are integral) since
    * the fixtures ship no partsupp. The correlated `= min(...)`
    * subquery becomes the argmin join-back: per-(part, supplier) min
    * unit price, then top-1 per part on the bounded heap (ties to the
    * lowest suppkey).
    *
    * 100 TB shape: the broadcast part filter dies scan-side BEFORE the
    * only fact shuffle (the (part, supplier) agg); suppliers/nation/
    * region are broadcast dims; the argmin is TopKPerKey k=1 — no
    * global sort, no second fact pass. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(spark, dir)
      .filter(col("p_size") === 15 && col("p_type") === "PROMO")
      .select("p_partkey", "p_name")
    val se = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "EUROPE")
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val uc = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(pf.select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(expr("(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)" +
        " * 100) div CAST(l_quantity AS BIGINT)")).as("unit_fp"))
    graft.plans.TopKPerKey.topK(
      uc.join(broadcast(se), col("l_suppkey") === col("s_suppkey")),
      keys = Seq(col("l_partkey")),
      order = Seq(col("unit_fp").asc, col("s_suppkey").asc), k = 1)
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
        "s_acctbal", "unit_fp")
  }

  val q2Sql: String =
    """WITH pf AS (
      |  SELECT p_partkey, p_name FROM part
      |  WHERE p_size = 15 AND p_type = 'PROMO'
      |), se AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |), uc AS (
      |  SELECT l_partkey, l_suppkey,
      |    min((CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * 100)
      |        // CAST(l_quantity AS BIGINT)) AS unit_fp
      |  FROM lineitem JOIN pf ON l_partkey = p_partkey
      |  GROUP BY 1, 2
      |), r AS (
      |  SELECT l_partkey, unit_fp, s_suppkey, s_name, s_acctbal, n_name,
      |    row_number() OVER (PARTITION BY l_partkey
      |      ORDER BY unit_fp, s_suppkey) AS rn
      |  FROM uc JOIN se ON l_suppkey = s_suppkey
      |)
      |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal, unit_fp
      |FROM r JOIN pf ON l_partkey = p_partkey WHERE rn = 1""".stripMargin

  /** TPC-H Q9 (product-type profit), adapted: profit per supplier nation
    * per order year over '%red%' parts, with the part's retail price
    * standing in for the missing ps_supplycost (cost proxy = 60% of
    * retail x quantity). All money in exact 1e-4-dollar int64 fixed
    * point. Shape: broadcast part filter prunes the fact scan-side; ONE
    * shuffle joins orders on the orderkey; supplier->nation is a
    * broadcast dim; the rollup is map-combinable. */
  def q9ProfitProxy(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(spark, dir).filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), centsL(col("p_retailprice")).as("rc"))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice",
        "l_discount", "l_quantity")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revFp - col("rc") * col("l_quantity").cast("long") * 60L)
        .as("profit_fp"))
  }

  val q9Sql: String =
    s"""SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
       |  CAST(sum($revFpSql
       |    - CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
       |      * CAST(l_quantity AS BIGINT) * 60) AS BIGINT) AS profit_fp
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11 (important stock), adapted: parts whose revenue through
    * NATION_7 suppliers exceeds 3x the nation's MEAN per-part revenue —
    * value derives from lineitem revenue instead of the missing
    * supplycost x availqty. A relative-to-mean threshold where the
    * original scales its fraction by 1/SF: a fixed share dilutes to an
    * empty result as the part domain grows (measured: 0.1% kept 238
    * parts at sf0.01 and ZERO at sf1), while 3x-mean keeps the heavy
    * tail live at every scale (17 at sf0.01, 1,760 at sf1). The
    * defining shape survives: group-by-part, then a HAVING against a
    * broadcast 1-row scalar (the house pattern), decided exactly in
    * integers — `value_fp > (3 * total_fp) div n_parts`, identical
    * floor-division on both engines, products kept to ~3x the corpus
    * total (int64 headroom ~$9e14 nation-total). */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val se = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val v = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(se), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(sum(revFp).as("value_fp"))
    val tot = v.agg(sum(col("value_fp")).as("total_fp"),
      count(lit(1)).as("n_parts"))
    v.crossJoin(broadcast(tot))
      .filter(col("value_fp") > expr("(total_fp * 3) div n_parts"))
      .select("l_partkey", "value_fp")
  }

  val q11Sql: String =
    s"""WITH se AS (
       |  SELECT s_suppkey FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_7'
       |), v AS (
       |  SELECT l_partkey, CAST(sum($revFpSql) AS BIGINT) AS value_fp
       |  FROM lineitem JOIN se ON l_suppkey = s_suppkey
       |  GROUP BY 1
       |)
       |SELECT l_partkey, value_fp FROM v
       |WHERE value_fp > (CAST((SELECT sum(value_fp) FROM v) AS BIGINT) * 3)
       |  // (SELECT count(*) FROM v)""".stripMargin

  /** TPC-H Q16 (parts/supplier relationship), adapted: distinct supplier
    * count per (brand, type, size) over small sizes, excluding one brand
    * and the "complaint" suppliers — the fixture supplier has no
    * s_comment, so negative account balance stands in for the complaint
    * predicate. The relation itself comes from lineitem DISTINCT pairs
    * (no partsupp). Shape: the exclusion list is a broadcast anti-join
    * BEFORE the distinct agg; part attributes broadcast; the only fact
    * shuffle is the (part, supplier) DISTINCT. */
  def q16SupplierRelation(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val pf = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#11" &&
        col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#11' AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q20 (excess inventory), adapted: suppliers who shipped more
    * than 50 units of any 'small%' part during 1997 — shipped quantity
    * from lineitem stands in for the missing availqty comparison. The
    * nested-semi-join shape survives: part name filter (broadcast,
    * scan-side) -> per-(part, supplier) quantity agg (the one fact
    * shuffle) -> HAVING -> DISTINCT supplier set -> LEFT SEMI against
    * the supplier dim -> broadcast nation names. */
  def q20ExcessShipments(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(spark, dir)
      .filter(col("p_name").like("small%")).select("p_partkey")
    val hot = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .filter(col("qty") > 50L)
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
  }

  val q20Sql: String =
    """WITH pf AS (
      |  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      |), a AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
      |  FROM lineitem JOIN pf ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2
      |)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM a WHERE qty > 50)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_profit_proxy" -> (q9ProfitProxy _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_supplier_relation" -> (q16SupplierRelation _),
    "q20_excess_shipments" -> (q20ExcessShipments _),
    "skew_report" -> (skewReport _),
    "salt_plan" -> (saltPlan _),
    "dq_checks" -> (dqChecks _),
    "pit_features" -> (pitFeatures _),
    "revenue_concentration" -> (revenueConcentration _),
    "freshness_report" -> (freshnessReport _),
    "snapshot_diff" -> (snapshotDiff _),
    "price_size_skyline" -> (priceSizeSkyline _),
    "column_profile" -> (columnProfile _),
    "bloom_prune_audit" -> (bloomPruneAudit _),
    "changelog_compact" -> (changelogCompact _),
    "zorder_layout" -> (zorderLayout _),
    "k_anonymity_audit" -> (kAnonymityAudit _),
    "t_closeness_audit" -> (tClosenessAudit _),
    "l_diversity_audit" -> (lDiversityAudit _),
    "q8_market_share" -> (q8MarketShare _),
    "q12_priority_lateness" -> (q12PriorityLateness _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _),
    "scd2_customer_history" -> (scd2CustomerHistory _),
    "rollup_incremental" -> (rollupIncremental _),
    "props_kv_stats" -> (propsKvStats _),
    "sliding_window_counts" -> (slidingWindowCounts _),
    "session_native" -> (sessionNative _),
    "concurrent_sessions" -> (concurrentSessions _),
    "user_value_mad" -> (userValueMad _),
    "q4_late_orders" -> (q4LateOrders _),
    "above_mean_events" -> (aboveMeanEvents _),
    "rolling_dau" -> (rollingDau _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q10_returned_revenue" -> (q10ReturnedRevenue _),
    "q13_custdist" -> (q13CustDist _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "value_moving_avg" -> (valueMovingAvg _),
    "user_first_last" -> (userFirstLast _),
    "value_histogram" -> (valueHistogram _),
    "user_type_unpivot" -> (userTypeUnpivot _),
    "type_diurnal_corr" -> (typeDiurnalCorr _),
  )

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q9_profit_proxy" -> q9Sql,
    "q11_important_parts" -> q11Sql,
    "q16_supplier_relation" -> q16Sql,
    "q20_excess_shipments" -> q20Sql,
    "skew_report" -> skewReportSql,
    "salt_plan" -> saltPlanSql,
    "dq_checks" -> dqChecksSql,
    "pit_features" -> pitFeaturesSql,
    "revenue_concentration" -> revenueConcentrationSql,
    "freshness_report" -> freshnessReportSql,
    "snapshot_diff" -> snapshotDiffSql,
    "price_size_skyline" -> priceSizeSkylineSql,
    "column_profile" -> columnProfileSql,
    "bloom_prune_audit" -> bloomPruneAuditSql,
    "changelog_compact" -> changelogCompactSql,
    "zorder_layout" -> zorderLayoutSql,
    "k_anonymity_audit" -> kAnonymityAuditSql,
    "t_closeness_audit" -> tClosenessAuditSql,
    "l_diversity_audit" -> lDiversityAuditSql,
    "q8_market_share" -> q8Sql,
    "q12_priority_lateness" -> q12Sql,
    "q21_waiting_supplier" -> q21Sql,
    "q17_small_quantity" -> q17Sql,
    "q22_sales_opportunity" -> q22Sql,
    "scd2_customer_history" -> scd2CustomerHistorySql,
    "rollup_incremental" -> rollupIncrementalSql,
    "props_kv_stats" -> propsKvStatsSql,
    "sliding_window_counts" -> slidingWindowCountsSql,
    "session_native" -> sessionNativeSql,
    "concurrent_sessions" -> concurrentSessionsSql,
    "user_value_mad" -> userValueMadSql,
    "q4_late_orders" -> q4Sql,
    "above_mean_events" -> aboveMeanEventsSql,
    "rolling_dau" -> rollingDauSql,
    "q7_nation_volume" -> q7Sql,
    "q10_returned_revenue" -> q10Sql,
    "q13_custdist" -> q13Sql,
    "q18_large_orders" -> q18Sql,
    "q14_promo_share" -> q14Sql,
    "q15_top_supplier" -> q15Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "value_moving_avg" -> valueMovingAvgSql,
    "user_first_last" -> userFirstLastSql,
    "value_histogram" -> valueHistogramSql,
    "user_type_unpivot" -> userTypeUnpivotSql,
    "type_diurnal_corr" -> typeDiurnalCorrSql,
  )
}
