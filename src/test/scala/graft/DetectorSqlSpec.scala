package graft

import graft.model._
import graft.operators.DetectorSql
import org.scalatest.funsuite.AnyFunSuite

/** Generated oracle SQL must quote rule-supplied strings: field/key names
  * are identifiers, rule names are literal content — a quote in either
  * must not break or inject into the SQL (the DuckDB twin of the backtick
  * quoting in Detectors.measure). */
class DetectorSqlSpec extends AnyFunSuite {

  test("field names are double-quoted identifiers with embedded-quote doubling") {
    val sql = DetectorSql.threshold(ThresholdRule("r", "weird\"field", 1.0))
    assert(sql.contains("\"weird\"\"field\" AS value"))
    assert(sql.contains("WHERE \"weird\"\"field\" IS NOT NULL"))
  }

  test("rule names with single quotes are escaped in literals") {
    val sql = DetectorSql.threshold(ThresholdRule("o'brien's rule", "value", 1.0))
    assert(sql.contains("'o''brien''s rule' AS rule_name"))
    val sql2 = DetectorSql.statistical(StatisticalRule("it's stat", "value"))
    assert(sql2.contains("'it''s stat' AS rule_name"))
  }

  test("rate keyField is identifier-quoted") {
    val sql = DetectorSql.rate(RateRule("r", "user\"id", 10, 2.0))
    assert(sql.contains("CAST(\"user\"\"id\" AS VARCHAR)"))
  }

  test("plain fixture rules keep byte-identical text apart from quoting") {
    // the quoting must not change what the oracle computes for normal
    // names: the details literal still renders the raw field text
    val sql = DetectorSql.threshold(SparkEntry.FixtureRules.threshold)
    assert(sql.contains("'Threshold exceeded: value='"))
    assert(sql.contains("\"value\" AS value"))
  }
}
