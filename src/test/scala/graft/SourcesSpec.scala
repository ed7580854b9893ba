package graft

import graft.operators.Warehouse
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format surface: the engine reads/writes CSV, JSON lines, and ORC
  * besides parquet (the reference's only connector is Kafka — §2 op 1 —
  * so file formats are north-star surface; parquet is pinned by every
  * oracle query, these pin the rest). Round-trips go through /tmp and
  * compare row sets exactly. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Option[Double], String)] =
    df.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .as[(Long, Long, String, Option[Double], String)].collect().toSet

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("props", StringType)))

  private def base = Tables.events(spark, dir)
    .select("event_id", "user_id", "event_type", "value", "props")

  test("csv round-trip: quoted JSON column survives; explicit schema read") {
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    base.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(canon(back) == canon(base))
  }

  test("json-lines round-trip: explicit schema read (no inference scan)") {
    val out = java.nio.file.Files.createTempDirectory("graft-json").toString
    base.write.mode("overwrite").json(out)
    // at scale you never let the reader infer: schema-on-read, one pass
    val back = spark.read.schema(schema).json(out)
    assert(canon(back) == canon(base))
  }

  test("orc round-trip: columnar alternative with pushdown") {
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString
    base.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(canon(back) == canon(base))
    // predicate reaches the ORC scan
    val plan = back.filter(col("event_id") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed"))
  }

  test("props_kv_stats: dynamic key profile matches a direct computation") {
    val got = Warehouse.propsKvStats(spark, dir)
      .as[(String, Long, Option[Double])].collect()
    assert(got.nonEmpty)
    val direct = Tables.events(spark, dir)
      .filter(col("props").isNotNull)
      .select(get_json_object(col("props"), "$.k").try_cast("long").as("v"))
      .agg(count(lit(1)), sum("v"), count("v"))
      .as[(Long, Option[Long], Long)].head()
    val k = got.find(_._1 == "k").get
    assert(k._2 == direct._1)
    assert(k._3.contains(direct._2.get.toDouble / direct._3))
  }
}
