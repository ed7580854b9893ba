package graft

import graft.sources.EventJson
import org.apache.spark.sql.functions._

/** Schema-free JSON contract (Event.java:33-59 +
  * EventDeserializationSchema.java:30-42 + AlertSerializationSchema). */
class EventJsonSpec extends SparkSpec {
  import spark.implicits._

  test("any JSON object parses; malformed records drop, never crash") {
    val raw = Seq(
      """{"userId": "u1", "amount": 120.5, "extra": {"nested": 1}}""",
      """{"totally": "different", "shape": [1,2,3]}""",
      """not json at all""",
      """""").toDF("value")
    val parsed = EventJson.parsed(raw)
    assert(parsed.count() == 2) // both valid objects survive, any shape
    assert(parsed.columns.contains("ingest_ts"))
  }

  test("typed accessors: string coercion + numeric coercion (Event.java:86-125)") {
    val raw = Seq(
      """{"userId": 42, "amount": "15000"}""",
      """{"userId": "u2", "amount": "garbage"}""").toDF("value")
    val p = EventJson.parsed(raw)
    val out = p.select(
      EventJson.field(col("fields"), "userId").as("k"),
      EventJson.numericField(col("fields"), "amount").as("v"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("42").contains(15000.0)) // numeric userId keys as "42"
    assert(out("u2").isEmpty) // garbage amount -> empty, not an error
  }

  test("alert serialization is JSON with ISO-8601 timestamps") {
    val alerts = Seq(("r1", "k1", java.sql.Timestamp.valueOf("2024-01-01 00:00:07")))
      .toDF("rule_name", "key", "ts")
    val json = EventJson.serializeAlerts(alerts).as[String].head()
    assert(json.contains(""""rule_name":"r1""""))
    assert(json.contains("2024-01-01T00:00:07")) // ISO-8601, not epoch
  }
}
