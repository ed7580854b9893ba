package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Central parquet table loaders for the driver fixtures.
  *
  * The `events.parquet` fixture has shipped `ts` in three encodings across
  * driver generations, and [[Tables.events]] is total over all of them:
  *
  *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
  *    ([PARQUET_TYPE_ILLEGAL]) unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  *    [[Sessions.builder]]), under which the column surfaces as a raw
  *    nanosecond LongType — exact integer arithmetic, no rounding.
  *  - parquet TIMESTAMP(MICROS, adjustedToUTC) → Spark TimestampType.
  *  - parquet TIMESTAMP(MICROS, local) → Spark TimestampNTZType. There is
  *    NO direct NTZ→BIGINT cast in Spark 4, so the timestamp branches go
  *    through `unix_micros(cast(ts as timestamp))` — the NTZ→TIMESTAMP
  *    cast interprets the wall-clock in the session zone, which
  *    [[Sessions.builder]] pins to UTC, matching DuckDB's `epoch_ns(ts)`
  *    on the same file. Sub-second precision is preserved (micros × 1000),
  *    which the hash oracles require.
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
    val withNs = raw.schema("ts").dataType match {
      case LongType => raw.withColumnRenamed("ts", "ts_ns")
      case _ => // TimestampType (no-op cast) or TimestampNTZType (UTC session)
        raw
          .withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .drop("ts")
    }
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
