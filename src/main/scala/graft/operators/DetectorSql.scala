package graft.operators

import graft.model._

/** ANSI/DuckDB SQL twins of [[Detectors]], generated from the same rule
  * objects so parameters can never drift between the Spark plan and the
  * oracle. The SQL reads the same parquet `events` table the driver
  * registers; `ts` there is a nanosecond timestamp, so the exact
  * floor-to-second clock is `epoch_ns(ts) // 1000000000` (matches Spark's
  * `ts_ns div 1e9` on the nanos-as-long read bit-for-bit). */
object DetectorSql {

  /** Rule-supplied strings reach the generated SQL as identifiers
    * (field/key names) or string-literal content (rule names); quote both
    * so a name containing a quote can't break or inject into the oracle —
    * the twin of the backtick quoting [[Detectors.measure]] applies on
    * the Spark side. */
  private def qid(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
  private def qlit(s: String): String = s.replace("'", "''")

  private val tsSec = "epoch_ns(ts) // 1000000000"
  private val keyExpr =
    "coalesce(CAST(user_id AS VARCHAR), '__unknown__')"

  /** Twin of [[Detectors.originalEvent]] over the raw `events` table —
    * same piece order, same coalesce-to-'null', same [[Fmt]] value path. */
  private val origEvent: String = {
    def opt(e: String) = s"coalesce($e, 'null')"
    "'{\"event_id\":' || " + opt("CAST(event_id AS VARCHAR)") +
      " || ',\"ts_sec\":' || " + opt(s"CAST($tsSec AS VARCHAR)") +
      " || ',\"user_id\":' || " + opt("CAST(user_id AS VARCHAR)") +
      " || ',\"event_type\":' || " + opt(Fmt.sqlJsonStr("event_type")) +
      " || ',\"value\":' || " + opt(Fmt.sqlF("TRY_CAST(value AS DOUBLE)", 2)) +
      " || ',\"props\":' || " + opt("props") + " || '}'"
  }

  def threshold(r: ThresholdRule): String = {
    val v = qid(r.field)
    s"""SELECT '${qlit(r.name)}' AS rule_name,
       |  $keyExpr AS "key",
       |  $tsSec AS ts_sec,
       |  event_id,
       |  $v AS value,
       |  'Threshold exceeded: ${qlit(r.field)}=' || ${Fmt.sqlF(v, 2)} ||
       |    ' (threshold: ${"%.2f".format(r.threshold)})' AS details,
       |  $origEvent AS original_event
       |FROM events
       |WHERE $v IS NOT NULL AND $v > ${r.threshold}""".stripMargin
  }

  def rate(r: RateRule): String =
    s"""WITH e AS (
       |  SELECT event_id,
       |    coalesce(CAST(${qid(r.keyField)} AS VARCHAR), '__unknown__') AS "key",
       |    $tsSec AS ts_sec,
       |    $origEvent AS original_event
       |  FROM events
       |), c AS (
       |  SELECT *, count(*) OVER (PARTITION BY "key" ORDER BY ts_sec
       |    RANGE BETWEEN ${r.windowSeconds} PRECEDING AND CURRENT ROW) AS cnt
       |  FROM e
       |)
       |SELECT '${qlit(r.name)}' AS rule_name, "key", ts_sec, event_id,
       |  CAST(cnt AS DOUBLE) AS value,
       |  'Rate spike: ' || CAST(cnt AS VARCHAR) ||
       |    ' events in ${r.windowSeconds} seconds (threshold: ${"%.0f".format(r.threshold)})' AS details,
       |  original_event
       |FROM c WHERE cnt > ${r.threshold}""".stripMargin

  /** Exact integer-moment twin of [[Detectors.statisticalAlerts]] — the
    * operation sequence (cents quantization, S1/S2 sums, the division and
    * sqrt order) must stay identical so every derived double matches
    * bit-for-bit. */
  def statistical(r: StatisticalRule): String = {
    val v = qid(r.field)
    val sf = s"${math.pow(10, r.quantScale)}" // e.g. "100.0" at the default
    s"""WITH e AS (
       |  SELECT event_id, $v AS v,
       |    CAST(floor($v * $sf + 0.5) AS BIGINT) AS c,
       |    $keyExpr AS "key",
       |    $tsSec AS ts_sec,
       |    $origEvent AS original_event
       |  FROM events WHERE $v IS NOT NULL
       |), s AS (
       |  SELECT *,
       |    sum(c) OVER w AS s1,
       |    sum(c * c) OVER w AS s2,
       |    count(c) OVER w AS hist
       |  FROM e
       |  WINDOW w AS (PARTITION BY "key" ORDER BY event_id
       |    ROWS BETWEEN ${r.windowSize} PRECEDING AND 1 PRECEDING)
       |), m AS (
       |  SELECT *,
       |    CAST(s1 AS DOUBLE) / hist / $sf AS mean,
       |    CAST(hist * s2 - s1 * s1 AS DOUBLE) AS dd,
       |    sqrt(CAST(hist * s2 - s1 * s1 AS DOUBLE)) / hist / $sf AS sd
       |  FROM s
       |)
       |SELECT '${qlit(r.name)}' AS rule_name, "key", ts_sec, event_id, v AS value,
       |  'Statistical outlier: ${qlit(r.field)}=' || ${Fmt.sqlF("v", 2)} ||
       |    ' (mean=' || ${Fmt.sqlF("mean", 2)} ||
       |    ', stddev=' || ${Fmt.sqlF("sd", 2)} ||
       |    ', factor=${"%.1f".format(r.deviationFactor)})' AS details,
       |  original_event
       |FROM m
       |WHERE hist >= 2 AND (CASE WHEN dd = 0 THEN abs(v - mean) > 0
       |  ELSE abs(v - mean) > ${r.deviationFactor} * sd END)""".stripMargin
  }

  def forRule(rule: DetectionRule): String = rule match {
    case r: ThresholdRule => threshold(r)
    case r: RateRule => rate(r)
    case r: StatisticalRule => statistical(r)
  }

  def all(rules: Seq[DetectionRule]): String =
    rules.map(r => s"(${forRule(r)})").mkString("\nUNION ALL\n")

  /** SQL twin of [[graft.operators.Detectors.throttle]] applied to a
    * rule's alert stream: first alert per (rule, key, period bucket)
    * plus the count of suppressed duplicates. */
  def throttled(rule: DetectionRule, periodSec: Long): String =
    s"""WITH a AS (
       |${forRule(rule)}
       |), b AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY rule_name, "key", ts_sec // $periodSec
       |      ORDER BY ts_sec, event_id) AS rn,
       |    count(*) OVER (PARTITION BY rule_name, "key", ts_sec // $periodSec) - 1
       |      AS n_suppressed
       |  FROM a
       |)
       |SELECT rule_name, "key", ts_sec, event_id, value, details,
       |  original_event, n_suppressed
       |FROM b WHERE rn = 1""".stripMargin
}
