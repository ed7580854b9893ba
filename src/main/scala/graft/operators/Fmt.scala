package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic fixed-point formatting.
  *
  * The reference's detail strings use Java `String.format("%.2f", d)`
  * (e.g. ThresholdDetector.java:71-72), which rounds the exact binary
  * value HALF_UP (= half-away-from-zero for positives). Neither Spark's
  * double->decimal cast (rounds the SHORTEST decimal repr —
  * `BigDecimal.valueOf`) nor C `printf` (half-to-even) reproduces that at
  * exact-half boundaries, and engines' aggregate ulp differences make any
  * direct rounding of a computed double non-portable.
  *
  * So we format through integer scaling: `n = floor(x * 10^s + 0.5)` is
  * (a) exactly Java's HALF_UP for non-negative doubles and (b) the same
  * IEEE operations in every engine — identical input double => identical
  * string everywhere. Callers are responsible for feeding doubles that are
  * themselves deterministically derived (see [[Detectors.statisticalAlerts]]'s
  * exact integer-space moments).
  *
  * Domain: non-negative finite values (all fixture measures). */
object Fmt {

  /** Java-"%.Nf"-equivalent string of a non-negative double column. */
  def f(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 6)
    val sf = math.pow(10, scale).toLong
    val n = floor(c * lit(sf.toDouble) + lit(0.5)).cast("long")
    if (scale == 0) n.cast("string")
    else concat(
      (n / lit(sf)).cast("long").cast("string"), lit("."),
      lpad(pmod(n, lit(sf)).cast("string"), scale, "0"))
  }

  /** DuckDB twin of [[f]] — must stay operation-for-operation identical. */
  def sqlF(expr: String, scale: Int): String = {
    require(scale >= 0 && scale <= 6)
    val sf = math.pow(10, scale).toLong
    val n = s"CAST(floor(($expr) * $sf.0 + 0.5) AS BIGINT)"
    if (scale == 0) s"CAST($n AS VARCHAR)"
    else s"(CAST($n // $sf AS VARCHAR) || '.' || lpad(CAST($n % $sf AS VARCHAR), $scale, '0'))"
  }

  /** JSON string literal of a string column: escape backslash, quote, and
    * the common control characters (\n \r \t), wrap in double quotes.
    * Literal `replace` (not regexp) exists with identical semantics in
    * Spark and DuckDB, so the bytes match. Remaining C0 controls
    * (vertical tab, form feed, ...) are out of the supported domain —
    * they never survive text ingestion in practice and a full RFC 8259
    * pass would need per-char \u00XX rewriting on both engines. */
  def jsonStr(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
        "\r" -> "\\r", "\t" -> "\\t")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
    concat(lit("\""), esc, lit("\""))
  }

  /** DuckDB twin of [[jsonStr]] — same replacements in the same order
    * (standard SQL strings don't interpret escapes, so '\n' below is the
    * two-character sequence backslash-n and chr(10) is the newline). */
  def sqlJsonStr(expr: String): String =
    raw"""('"' || replace(replace(replace(replace(replace($expr, '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t') || '"')"""
}
