package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The schema-free event contract (reference: Event.java:33-59 holds any
  * JSON object as a Map; EventDeserializationSchema.java:30-42 stamps
  * ingestion time and nulls out malformed records instead of crashing).
  *
  * Two layers:
  *  - [[parse]]: raw JSON strings -> `fields MAP<STRING,STRING>` +
  *    `ingest_ts` + the raw payload. PERMISSIVE `from_json` yields null on
  *    malformed input = the reference's drop-don't-crash contract
  *    (StreamSentinelJob.java:123 filters those).
  *  - [[field]] / [[numericField]]: the reference's typed accessors
  *    (getStringField / getNumericField with string-number coercion,
  *    Event.java:86-125) as Column expressions over the map.
  *
  * Works identically on a batch DataFrame of JSON lines and on a
  * streaming source (`readStream` of a file dir; Kafka's value column once
  * a kafka connector jar is on the classpath — same `from_json` shape,
  * see SURVEY.md §2 op 1).
  */
object EventJson {

  val fieldsType: MapType = MapType(StringType, StringType)

  /** bytes/string JSON -> (raw, fields, ingest_ts); malformed -> fields
    * null (caller filters, mirroring the null-filter operator). */
  def parse(raw: Column): Column =
    from_json(raw.cast("string"), fieldsType)

  def parsed(df: DataFrame, rawCol: String = "value"): DataFrame =
    df.withColumn("fields", parse(col(rawCol)))
      .withColumn("ingest_ts", current_timestamp())
      .filter(col("fields").isNotNull)

  /** getStringField: toString coercion of any value (Event.java:122-125). */
  def field(fields: Column, name: String): Column = fields.getItem(name)

  /** getNumericField: Numbers and parseable strings as double, anything
    * else empty (Event.java:101-114) — try_cast is exactly that. */
  def numericField(fields: Column, name: String): Column =
    field(fields, name).try_cast(DoubleType)

  /** Alert JSON serialization with ISO-8601 timestamps
    * (AlertSerializationSchema.java:22-39, WRITE_DATES_AS_TIMESTAMPS=false).
    * Spark's to_json renders TimestampType ISO-8601 under UTC session tz.
    *
    * Contained like the reference's serializer (AlertSerializationSchema
    * .java:24-30: serialize never crashes the job — a failing record
    * becomes empty bytes): `to_json` is total on the flat alert schema the
    * detectors emit, but on exotic caller-supplied columns (deep structs,
    * maps with odd keys) it can still throw at runtime, so the expression
    * is wrapped in Catalyst's `TryEval` (throw -> NULL, inside codegen)
    * and coalesced to the empty string — the exact empty-byte-array
    * contract, one bad row never kills the stream. */
  def serializeAlerts(alerts: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.TryEval
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val json = to_json(struct(alerts.columns.toIndexedSeq.map(col): _*))
    alerts.select(
      coalesce(ColumnBridge.column(TryEval(ColumnBridge.expression(json))),
        lit("")).as("value"))
  }
}
