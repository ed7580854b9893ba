package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Central parquet table loaders for the driver fixtures.
  *
  * The `events.parquet` fixture stores `ts` as parquet TIMESTAMP(NANOS),
  * which Spark's vectorized reader rejects outright
  * ([PARQUET_TYPE_ILLEGAL]). Sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.configure]]),
  * under which the column surfaces as a raw nanosecond LongType — which we
  * actually prefer: `ts_sec` is then exact integer arithmetic
  * (`ts_ns div 1e9`), bit-identical to any other engine's floor-to-second,
  * with no double-rounding through a timestamp type.
  *
  * All loaders are plain `spark.read.parquet` scans: filters and column
  * pruning push down to the parquet reader (verify with
  * `.explain("formatted")` — PushedFilters / ReadSchema).
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Events with a normalized clock:
    *  - `ts_ns`   raw nanosecond epoch (exact)
    *  - `ts_sec`  floor-to-second epoch (exact integer div)
    *  - `ts`      microsecond TIMESTAMP for human-facing / window() use
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    val tsIsLong = raw.schema("ts").dataType == LongType
    val withNs =
      if (tsIsLong) raw.withColumnRenamed("ts", "ts_ns")
      else raw.withColumn("ts_ns", expr("cast(ts as long) * 1000000000"))
        .drop("ts")
    withNs
      .withColumn("ts_sec", expr("ts_ns div 1000000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

/** Session-level settings every entry point (Verify, Bench, tests) needs. */
object Sessions {
  val nanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(nanosAsLong, "true")
      // registers the graft SQL functions (graft_dot) in this session;
      // DataFrame-API use of VectorExprs needs no registration
      .withExtensions(new graft.functions.GraftExtensions)
}
