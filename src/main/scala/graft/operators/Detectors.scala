package graft.operators

import graft.model._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch (DataFrame) formulation of the three detection operators.
  *
  * Each rule compiles to a declarative Spark plan built ONLY from
  * codegen'd built-ins (`filter`, window functions, `format_string`) so
  * Catalyst gets full predicate-pushdown / column-pruning / WSCG freedom —
  * there is deliberately no UDF and no custom Expression in this path.
  *
  * Semantics reproduced from the reference detectors (paths relative to
  * /root/reference/):
  *  - threshold: strict `>` on double-coerced field
  *    (core-engine/.../ThresholdDetector.java:46-78)
  *  - rate: per-event trailing count window [t-w, t] per key, strict `>`
  *    (core-engine/.../RateSpikeDetector.java:74-114)
  *  - statistical: per-key moving mean / POPULATION sigma over the previous
  *    `windowSize` values EXCLUDING the current one (check-before-insert),
  *    >=2 history values, sigma==0 fires on any deviation
  *    (core-engine/.../StatisticalOutlierDetector.java:77-156)
  *
  * Clock: the reference uses ingestion time (stamped at deserialize,
  * EventDeserializationSchema.java:36). For deterministic batch/oracle runs
  * we drive windows off the fixture's own `ts` column, floored to the
  * second (`ts_sec`). Flooring to seconds keeps Spark (us-precision
  * timestamps) and any ns-precision reader in exact agreement.
  *
  * Scale posture (100 TB): every operator here is a single hash-partitioned
  * window over the key — one shuffle on `key`, no driver-side collection,
  * no unbounded state. Window width is bounded (`windowSeconds` /
  * `windowSize`), so per-partition memory is O(active window), and skewed
  * keys are handled by AQE; the partition count follows
  * `spark.sql.shuffle.partitions`.
  */
object Detectors {

  /** Key semantics of the reference pipeline: string-coerce the key field,
    * missing -> "__unknown__" (StreamSentinelJob.java:121-124). */
  def keyCol(keyField: String): Column =
    coalesce(col(keyField).cast("string"), lit("__unknown__"))

  /** Events with the derived columns every detector needs. Column pruning
    * still reaches the scan because these are simple projections. `ts_sec`
    * is taken as-is when the source already provides the exact
    * floor-to-second epoch (see [[graft.sources.Tables.events]]), else
    * derived from a `ts` timestamp column (in-memory test fixtures). */
  def prepareEvents(df: DataFrame, keyField: String = "user_id"): DataFrame = {
    val withTs =
      if (df.columns.contains("ts_sec")) df
      else df.withColumn("ts_sec", col("ts").cast("long"))
    withTs.withColumn("key", keyCol(keyField))
  }

  /** Attach the alert projection's `original_event` column. Called AFTER
    * each detector's fire-filter, never before: the concat only runs for
    * firing rows (typically a few percent), and the raw source columns it
    * references flow through any window shuffle as-is — same bytes on the
    * wire, far less string-building CPU. */
  private def withOriginalEvent(df: DataFrame): DataFrame =
    df.withColumn("original_event", originalEvent(df.columns.toSeq))

  /** The alert's inline copy of the event that fired it, as a JSON object
    * string — mirrors the reference's `originalEvent` field (Alert.java:
    * 31-43, defensive copy at :114, serialized onto the alerts topic by
    * AlertSerializationSchema.java): a consumer gets the full event in the
    * alert record, no join back required.
    *
    * Rendered via [[Fmt]] concat (NOT `to_json`) so the bytes are
    * engine-deterministic and the DuckDB oracle can reproduce them:
    * longs print exactly, `value` goes through the same HALF_UP
    * fixed-point path as the detail strings, strings are JSON-escaped with
    * literal `replace`, and `props` — already a raw JSON object string in
    * the schema-free contract — embeds as-is. Fields absent from the input
    * schema (in-memory test fixtures) render as JSON null, as do NULLs. */
  def originalEvent(columns: Seq[String]): Column = {
    def opt(name: String)(mk: => Column): Column =
      if (columns.contains(name)) coalesce(mk, lit("null")) else lit("null")
    concat(
      lit("{\"event_id\":"), opt("event_id")(col("event_id").cast("string")),
      lit(",\"ts_sec\":"), opt("ts_sec")(col("ts_sec").cast("string")),
      lit(",\"user_id\":"), opt("user_id")(col("user_id").cast("string")),
      lit(",\"event_type\":"), opt("event_type")(Fmt.jsonStr(col("event_type"))),
      // try_cast first: the schema-free contract admits string-encoded and
      // garbage values (Event.java:101-114); garbage renders as JSON null
      lit(",\"value\":"), opt("value")(Fmt.f(expr("try_cast(value AS DOUBLE)"), 2)),
      lit(",\"props\":"), opt("props")(col("props")),
      lit("}"))
  }

  private val alertCols =
    Seq("rule_name", "key", "ts_sec", "event_id", "value", "details", "original_event")

  /** Reference field coercion (Event.java:101-114): numbers and
    * string-encoded numbers evaluate as double; anything non-parseable is
    * as-if-missing. `try_cast` reproduces Optional.empty under ANSI mode
    * (a plain cast would throw on garbage). */
  private def measure(field: String): Column =
    expr(s"try_cast(`${field.replace("`", "``")}` AS DOUBLE)")

  /** value > threshold, strict. Alert projection mirrors
    * ThresholdDetector.java:67-74 ("Threshold exceeded: %s=%.2f
    * (threshold: %.2f)"). */
  def thresholdAlerts(events: DataFrame, rule: ThresholdRule,
      defaultKeyField: String = "user_id"): DataFrame = {
    val v = measure(rule.field)
    withOriginalEvent(
      prepareEvents(events, defaultKeyField)
        .filter(v.isNotNull && v > lit(rule.threshold)))
      .withColumn("value", v)
      .withColumn("rule_name", lit(rule.name))
      // Same text as ThresholdDetector.java:71-72's String.format; constant
      // parts are Java-formatted here, per-row numbers via Fmt (HALF_UP).
      .withColumn("details", concat(
        lit(s"Threshold exceeded: ${rule.field}="), Fmt.f(v, 2),
        lit(" (threshold: %.2f)".format(rule.threshold))))
      .select(alertCols.map(col): _*)
  }

  /** Trailing time-window count per key: COUNT(*) OVER (PARTITION BY key
    * ORDER BY ts_sec RANGE BETWEEN w PRECEDING AND CURRENT ROW) > t.
    * Inclusive lower bound matches the deque eviction `< windowStart`
    * (RateSpikeDetector.java:85-87). NOTE on ties: events sharing a second
    * are RANGE peers and all see each other; the streaming deque only sees
    * earlier arrivals — the batch formulation is the set-semantics reading
    * and is what the oracle checks.
    *
    * Written in the canonical window shape; under [[graft.functions
    * .GraftExtensions]] the [[graft.plans.RateWindowRewrite]] optimizer rule
    * re-plans it into the slice-parallel form automatically, so the
    * skew-safe plan is the default for every caller (including
    * [[compile]]'s rule dispatch) — see [[rateAlertsSliced]] for the
    * hand-written equivalent and the equivalence argument. */
  def rateAlerts(events: DataFrame, rule: RateRule): DataFrame = {
    val w = Window.partitionBy("key").orderBy("ts_sec")
      .rangeBetween(-rule.windowSeconds, 0)
    withOriginalEvent(
      prepareEvents(events, rule.keyField)
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("cnt") > lit(rule.threshold)))
      .withColumn("rule_name", lit(rule.name))
      .withColumn("value", col("cnt").cast("double"))
      .withColumn("details", concat(
        lit("Rate spike: "), col("cnt").cast("string"),
        lit(" events in %d seconds (threshold: %.0f)"
          .format(rule.windowSeconds, rule.threshold))))
      .select(alertCols.map(col): _*)
  }

  /** Slice-parallel formulation of [[rateAlerts]] — identical output,
    * skew-proof execution. The plain RANGE window serializes each key
    * through ONE task, so a pathologically hot key (the sf1 events_hot
    * probe: half of all events on one user) caps scaling at that task.
    * Because the frame only looks back `windowSeconds`, the timeline
    * chops into `sliceSeconds` slices computed independently: each event
    * goes to its home slice, and events in the last `windowSeconds` of a
    * slice are ALSO copied into the next slice as context rows (flagged,
    * counted by neighbors, then dropped). Any frame member is at most
    * `windowSeconds` behind its row, so it lives in the same slice or the
    * context band — each exactly once, making every count identical to
    * the single-partition window's. The window key becomes (key, slice):
    * a hot key spreads over timeline/sliceSeconds tasks at a replication
    * overhead of windowSeconds/sliceSeconds (default 1/64). */
  def rateAlertsSliced(events: DataFrame, rule: RateRule,
      sliceSeconds: Long = 0L): DataFrame = {
    val s = if (sliceSeconds > 0) sliceSeconds
      else math.max(rule.windowSeconds.toLong * 64L, 3600L)
    require(s > rule.windowSeconds,
      s"sliceSeconds ($s) must exceed the rule window (${rule.windowSeconds})")
    val prep = prepareEvents(events, rule.keyField)
    val sliceOf = floor(col("ts_sec") / s).cast("long")
    // the reserved __graft_* names tell RateWindowRewrite this plan is
    // already sliced by hand, so the rule doesn't re-slice it
    val home = prep
      .withColumn("__graft_slice", sliceOf)
      .withColumn("__graft_ctx", lit(false))
    val ctx = prep
      .withColumn("__graft_slice", sliceOf + 1)
      .withColumn("__graft_ctx", lit(true))
      .filter(col("ts_sec") >= col("__graft_slice") * s - rule.windowSeconds)
    val w = Window.partitionBy("key", "__graft_slice").orderBy("ts_sec")
      .rangeBetween(-rule.windowSeconds, 0)
    withOriginalEvent(
      home.unionByName(ctx)
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(!col("__graft_ctx") && col("cnt") > lit(rule.threshold)))
      .withColumn("rule_name", lit(rule.name))
      .withColumn("value", col("cnt").cast("double"))
      .withColumn("details", concat(
        lit("Rate spike: "), col("cnt").cast("string"),
        lit(" events in %d seconds (threshold: %.0f)"
          .format(rule.windowSeconds, rule.threshold))))
      .select(alertCols.map(col): _*)
  }

  /** Moving mean/sigma over the PREVIOUS windowSize values (ROWS BETWEEN
    * windowSize PRECEDING AND 1 PRECEDING — the -1 upper bound encodes
    * check-before-insert). Rows with a null/non-numeric field are excluded
    * BEFORE windowing, as the reference never admits them to the deque
    * (StatisticalOutlierDetector.java:83-86). Processing order = arrival
    * order; the fixture's `event_id` is the arrival sequence, giving a
    * total order that any engine reproduces exactly.
    *
    * Numerics: engines disagree at the ulp level on windowed
    * `avg`/`stddev_pop` (different accumulation orders / algorithms), and
    * 2-value windows put sigma = |a-b|/2 exactly on half-cent boundaries
    * all the time — so we compute the moments EXACTLY. Measures are
    * quantized to integer cents (lossless for the 2-decimal fixture
    * domain), the window keeps integer S1 = sum(c), S2 = sum(c^2), and
    *   mean  = S1 / n / 100
    *   sigma = sqrt(n*S2 - S1^2) / n / 100     (population sigma, /N)
    * where `n*S2 - S1^2` is an exact integer: every double that follows is
    * the same IEEE operation sequence in any engine, making both the fire
    * decision and the formatted details bit-deterministic. sigma == 0 is
    * the exact integer test D == 0. */
  def statisticalAlerts(events: DataFrame, rule: StatisticalRule,
      defaultKeyField: String = "user_id"): DataFrame = {
    val v = measure(rule.field)
    val sf = math.pow(10, rule.quantScale) // quantization unit (Rules.scala)
    val w = Window.partitionBy("key").orderBy("event_id")
      .rowsBetween(-rule.windowSize, -1)
    withOriginalEvent(
      prepareEvents(events, defaultKeyField)
        .filter(v.isNotNull)
        // NOTE: the raw `value` column must stay untouched until after
        // withOriginalEvent — overwriting it with the measured field here
        // would falsify the embedded event whenever rule.field != "value"
        .withColumn("v", v)
        .withColumn("c", floor(col("v") * lit(sf) + 0.5).cast("long"))
        .withColumn("s1", sum("c").over(w))
        .withColumn("s2", sum(col("c") * col("c")).over(w))
        .withColumn("hist", count("c").over(w))
        .withColumn("mean", col("s1").cast("double") / col("hist") / lit(sf))
        .withColumn("dd",
          (col("hist") * col("s2") - col("s1") * col("s1")).cast("double"))
        .withColumn("stddev", sqrt(col("dd")) / col("hist") / lit(sf))
        .filter(col("hist") >= 2 && // MIN_HISTORY_SIZE (:45)
          when(col("dd") === 0.0, abs(col("v") - col("mean")) > 0.0)
            .otherwise(abs(col("v") - col("mean")) >
              lit(rule.deviationFactor) * col("stddev"))))
      .withColumn("value", col("v"))
      .withColumn("rule_name", lit(rule.name))
      .withColumn("details", concat(
        lit(s"Statistical outlier: ${rule.field}="), Fmt.f(col("v"), 2),
        lit(" (mean="), Fmt.f(col("mean"), 2),
        lit(", stddev="), Fmt.f(col("stddev"), 2),
        lit(", factor=%.1f)".format(rule.deviationFactor))))
      .select(alertCols.map(col): _*)
  }

  /** One rule -> one DataFrame transform (the batch analog of
    * DetectorFactory.java:39-72's dispatch; exhaustive by construction).
    * `defaultKeyField` is the job-level keyBy field (JobConfig's
    * DEFAULT_KEY_FIELD, StreamSentinelJob.java:121-124); the rate rule
    * keys by its own required keyField, as in the reference. */
  def compile(rule: DetectionRule,
      defaultKeyField: String = "user_id"): DataFrame => DataFrame = rule match {
    case r: ThresholdRule => thresholdAlerts(_, r, defaultKeyField)
    case r: RateRule => rateAlerts(_, r)
    case r: StatisticalRule => statisticalAlerts(_, r, defaultKeyField)
  }

  /** The whole engine in batch: union of the per-rule alert streams (the
    * reference's single process function runs all detectors per event —
    * AnomalyProcessFunction.java:120-135 — which in set terms is exactly
    * this union). Per-rule isolation only holds here if callers run rules
    * as separate queries; for the reference's one-broken-rule-cannot-kill-
    * the-others contract inside a SINGLE union job, use
    * [[allAlertsContained]]. */
  def allAlerts(events: DataFrame, rules: Seq[DetectionRule],
      defaultKeyField: String = "user_id"): DataFrame =
    rules.map(r => compile(r, defaultKeyField)(events)).reduce(_ unionAll _)

  /** A rule the engine refused to run, with why — the batch twin of the
    * reference's per-detector catch-and-log
    * (AnomalyProcessFunction.java:130-134). */
  final case class RuleError(rule_name: String, error_class: String,
      message: String)

  /** [[compile]] with the per-rule try/catch the reference wraps around
    * every detector call (AnomalyProcessFunction.java:120-134): a rule
    * whose plan cannot even be CONSTRUCTED — a `field` that does not
    * resolve against the event schema, a malformed expression — is
    * reported instead of thrown. Dataset transformations analyze eagerly,
    * so every resolution-time failure surfaces right here, not at action
    * time. (Runtime row-level hazards are already contained by
    * construction: field coercion is `try_cast` — the reference's
    * Optional.empty skip — and the detail strings are total.) */
  def compileContained(rule: DetectionRule, events: DataFrame,
      defaultKeyField: String = "user_id"): Either[RuleError, DataFrame] =
    try Right(compile(rule, defaultKeyField)(events))
    catch {
      case scala.util.control.NonFatal(e) =>
        Left(RuleError(rule.name, e.getClass.getName,
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" ")))
    }

  /** [[allAlerts]] with the reference's error containment: broken rules
    * are excluded from the union and reported, healthy rules run — one
    * bad rule no longer fails the whole job
    * (AnomalyProcessFunction.java:120-134). Returns the surviving-rule
    * union (an empty, correctly-typed alerts frame when every rule is
    * broken) plus one [[RuleError]] per excluded rule. */
  def allAlertsContained(events: DataFrame, rules: Seq[DetectionRule],
      defaultKeyField: String = "user_id"): (DataFrame, Seq[RuleError]) = {
    val (errs, ok) = rules.partitionMap(compileContained(_, events, defaultKeyField))
    val alerts =
      if (ok.nonEmpty) ok.reduce(_ unionAll _)
      else {
        import org.apache.spark.sql.types._
        events.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(
            StructField("rule_name", StringType), StructField("key", StringType),
            StructField("ts_sec", LongType), StructField("event_id", LongType),
            StructField("value", DoubleType), StructField("details", StringType),
            StructField("original_event", StringType))))
      }
    (alerts, errs)
  }

  /** Alert throttling — the storm-suppression stage the reference lacks
    * (it emits one alert per firing event, so a hot key under sustained
    * breach floods the alerts topic — README.md:198-211 shows no
    * suppression anywhere). Keeps the FIRST alert per
    * (rule, key, period bucket) and reports how many duplicates the
    * bucket swallowed (`n_suppressed`), so downstream consumers keep
    * full information at 1/period the volume.
    *
    * Scale shape: one hash exchange on (rule_name, key, bucket) — the
    * bucket term keeps a hot key's alerts spread over time-sliced
    * groups instead of one ever-growing partition; both window
    * functions (rank + bucket count) share the single sort. */
  def throttle(alerts: DataFrame, periodSec: Long): DataFrame = {
    // bucket is materialized as a column BEFORE the window specs: two
    // specs re-deriving the expression get distinct expression ids, which
    // Catalyst treats as different partitionings — two exchanges instead
    // of one (observed in the plan audit)
    val part = Window.partitionBy(col("rule_name"), col("key"), col("bucket"))
    val w = part.orderBy(col("ts_sec"), col("event_id"))
    alerts
      .withColumn("bucket", expr(s"ts_sec div $periodSec"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_suppressed", count(lit(1)).over(part) - 1)
      .filter(col("rn") === 1).drop("rn", "bucket")
  }

  // ---------------------------------------------- absence (dead-man switch)

  private[graft] val absenceGapNs = 24L * 3600 * 1000000000L

  /** Absence detection — the dead-man switch, the rule family the
    * threshold/rate/statistical trio structurally CANNOT express: those
    * fire on events that exist; this fires on events that don't (a
    * heartbeat going silent, a supplier feed stalling). Batch form: every
    * per-key gap longer than 24 h, reported at resumption (silent_from →
    * resumed_at), plus the still-silent tail — keys whose LAST event is
    * more than 24 h before the corpus horizon (resumed_at NULL).
    *
    * Shape: one hash exchange on key feeding an in-partition `lag` — the
    * same single-window discipline as the rate rule; the tail leg is a
    * per-key max agg against a broadcast 1-row horizon. The streaming
    * twin ([[graft.streaming.StreamingAbsence]]) detects the same
    * condition LIVE with per-key event-time timers — state is one long
    * per key, and the timer re-arms on every event. */
  def absenceAlerts(spark: SparkSession, dir: String): DataFrame = {
    val ev = prepareEvents(graft.sources.Tables.events(spark, dir))
      .select(col("key"), col("ts_ns"), col("event_id"))
    val w = Window.partitionBy("key").orderBy(col("ts_ns"), col("event_id"))
    val resumed = ev
      .withColumn("p", lag("ts_ns", 1).over(w))
      .filter(col("p").isNotNull && col("ts_ns") - col("p") > absenceGapNs)
      .select(col("key"),
        expr("p div 1000000000").as("silent_from"),
        expr("ts_ns div 1000000000").as("resumed_at"),
        expr(s"(ts_ns - p) div 1000000000").as("gap_sec"))
    val horizon = ev.agg(max("ts_ns").as("h"))
    val trailing = ev.groupBy("key").agg(max("ts_ns").as("mt"))
      .crossJoin(broadcast(horizon))
      .filter(col("h") - col("mt") > absenceGapNs)
      .select(col("key"),
        expr("mt div 1000000000").as("silent_from"),
        lit(null).cast("long").as("resumed_at"),
        expr("(h - mt) div 1000000000").as("gap_sec"))
    resumed.unionByName(trailing)
  }

  val absenceAlertsSql: String =
    s"""WITH e AS (
       |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
       |    epoch_ns(ts) AS tsn, event_id
       |  FROM events
       |), g AS (
       |  SELECT "key", tsn,
       |    lag(tsn) OVER (PARTITION BY "key" ORDER BY tsn, event_id) AS p
       |  FROM e
       |), res AS (
       |  SELECT "key", p // 1000000000 AS silent_from,
       |    tsn // 1000000000 AS resumed_at,
       |    (tsn - p) // 1000000000 AS gap_sec
       |  FROM g WHERE p IS NOT NULL AND tsn - p > $absenceGapNs
       |), h AS (SELECT max(tsn) AS h FROM e),
       |tr AS (
       |  SELECT "key", mt // 1000000000 AS silent_from,
       |    CAST(NULL AS BIGINT) AS resumed_at,
       |    (h.h - mt) // 1000000000 AS gap_sec
       |  FROM (SELECT "key", max(tsn) AS mt FROM e GROUP BY 1) l, h
       |  WHERE h.h - mt > $absenceGapNs
       |)
       |SELECT * FROM res UNION ALL SELECT * FROM tr""".stripMargin

  /** Skew-safe [[absenceAlerts]]: identical output (same oracle), with the
    * per-key gap scan SLICE-PARALLELIZED so a hot key no longer serializes
    * through one window task — the same timeline-slicing discipline as
    * [[rateAlertsSliced]], adapted to adjacent-pair semantics:
    *
    *  - WITHIN a 6 h slice, consecutive pairs come from a window over
    *    (key, slice) — a hot key's events spread across horizon/6h tasks;
    *  - ACROSS slices, the only missing pairs are (last of one slice,
    *    first of the next EXISTING slice): each slice reduces to one
    *    (first, last) row (map-combinable struct min/max, deterministic by
    *    (ts_ns, event_id)), and a lag over the per-key SLICE AGGREGATE —
    *    thousands of rows per key per year, not events — yields them;
    *    empty slices are skipped by construction, so the boundary pair
    *    connects actual neighbors.
    * Together the two legs enumerate exactly the consecutive pairs the
    * monolithic window sees. Hot-key cost drops from O(hot events) in one
    * task to O(hot events / slices) per task plus a slice-count window. */
  def absenceAlertsSliced(spark: SparkSession, dir: String): DataFrame = {
    val sliceNs = 6L * 3600 * 1000000000L
    val ev = prepareEvents(graft.sources.Tables.events(spark, dir))
      .select(col("key"), col("ts_ns"), col("event_id"))
      .withColumn("slice", expr(s"ts_ns div $sliceNs"))
    val within = ev
      .withColumn("p", lag("ts_ns", 1)
        .over(Window.partitionBy("key", "slice").orderBy(col("ts_ns"), col("event_id"))))
      .filter(col("p").isNotNull)
      .select(col("key"), col("p"), col("ts_ns").as("t"))
    val sliceAgg = ev.groupBy("key", "slice")
      .agg(min(struct(col("ts_ns"), col("event_id"))).as("first"),
        max(struct(col("ts_ns"), col("event_id"))).as("last"))
    val boundary = sliceAgg
      .withColumn("prev_last", lag("last", 1)
        .over(Window.partitionBy("key").orderBy("slice")))
      .filter(col("prev_last").isNotNull)
      .select(col("key"), col("prev_last.ts_ns").as("p"),
        col("first.ts_ns").as("t"))
    val resumed = within.unionByName(boundary)
      .filter(col("t") - col("p") > absenceGapNs)
      .select(col("key"),
        expr("p div 1000000000").as("silent_from"),
        expr("t div 1000000000").as("resumed_at"),
        expr("(t - p) div 1000000000").as("gap_sec"))
    val horizon = ev.agg(max("ts_ns").as("h"))
    val trailing = ev.groupBy("key").agg(max("ts_ns").as("mt"))
      .crossJoin(broadcast(horizon))
      .filter(col("h") - col("mt") > absenceGapNs)
      .select(col("key"),
        expr("mt div 1000000000").as("silent_from"),
        lit(null).cast("long").as("resumed_at"),
        expr("(h - mt) div 1000000000").as("gap_sec"))
    resumed.unionByName(trailing)
  }

  // ------------------------------------------------ pattern (CEP sequence)

  private[graft] val patternN = 3
  private[graft] val patternWindowNs = 12L * 3600 * 1000000000L

  /** Sequence-pattern detection (the CEP rule): [[patternN]] consecutive
    * 'error' events for one key within 12 h — "repeated failures in a
    * short window", the escalation trigger that a plain rate rule on ALL
    * events can't see (the errors hide inside normal traffic volume).
    * Consecutive means consecutive in the key's ERROR substream; the
    * alert lands on the closing event and reports the run's span.
    *
    * Shape: the event-type filter dies scan-side (only the error
    * substream is shuffled — for a 1% error rate that is 1% of the
    * corpus), then one per-key window with a single `lag(n-1)`; no
    * joins, no self-products, alert projection identical to the other
    * detector families. */
  def patternAlerts(spark: SparkSession, dir: String): DataFrame = {
    val ev = prepareEvents(graft.sources.Tables.events(spark, dir))
      .filter(col("event_type") === "error")
      .select(col("key"), col("ts_ns"), col("ts_sec"), col("event_id"))
    val w = Window.partitionBy("key").orderBy(col("ts_ns"), col("event_id"))
    ev
      .withColumn("t1", lag("ts_ns", patternN - 1).over(w))
      .filter(col("t1").isNotNull &&
        col("ts_ns") - col("t1") <= patternWindowNs)
      .select(col("key"), col("event_id"), col("ts_sec"),
        lit("error_burst").as("rule_name"),
        expr("(ts_ns - t1) div 1000000000").as("span_sec"))
  }

  val patternAlertsSql: String =
    s"""WITH e AS (
       |  SELECT coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
       |    epoch_ns(ts) AS tsn, epoch_ns(ts) // 1000000000 AS ts_sec, event_id
       |  FROM events WHERE event_type = 'error'
       |), g AS (
       |  SELECT "key", tsn, ts_sec, event_id,
       |    lag(tsn, ${patternN - 1}) OVER (
       |      PARTITION BY "key" ORDER BY tsn, event_id) AS t1
       |  FROM e
       |)
       |SELECT "key", event_id, ts_sec, 'error_burst' AS rule_name,
       |  (tsn - t1) // 1000000000 AS span_sec
       |FROM g WHERE t1 IS NOT NULL AND tsn - t1 <= $patternWindowNs""".stripMargin
}
