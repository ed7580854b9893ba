package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Demonstrates the partitioned-layout path: writing a fact table
  * partitioned by a low-cardinality column (here event_type standing in
  * for the usual date partition) lets any query filtering on it skip
  * whole directories at planning time — at 100 TB, a day-partitioned
  * table turns "scan everything" into "scan 1/365th". The assertions pin
  * the property: the filter lands in PartitionFilters (not a post-scan
  * Filter), and results match the unpartitioned path. */
class PartitionPruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned write: type filter prunes at the scan, same results") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "value", "event_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    // sum exact integer cents, not doubles: IEEE addition is
    // order-dependent, and the two layouts split into different
    // partitions, so a raw double sum could differ in low-order bits
    val centsOf = graft.operators.Analytics.cents(col("value"))
    val q = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum(centsOf).as("total"))
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the partition filter is applied by the file index, not a Filter node
    assert(formatted.contains("PartitionFilters"))
    assert(formatted.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("event_type")))

    val direct = ev.filter(col("event_type") === "purchase")
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum(centsOf).as("total"))
    assert(q.collect().toSeq == direct.collect().toSeq)
  }
}
