package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dev-only data-LAYOUT probe: at 100 TB the scan cost of a selective
  * query is governed by how the data was WRITTEN, not how it is read —
  * a predicate can only skip files/row-groups whose min/max statistics
  * exclude it. This probe writes the same events two ways and measures
  * what the identical filter query actually reads:
  *
  *  - `clustered/`: repartitioned by event_type, sorted within
  *    partitions by (event_type, ts_sec) — each file covers ONE type
  *    and a narrow time band, so min/max prunes aggressively (the
  *    one-time layout job is the only place a big sort is legitimate);
  *  - `shuffled/`: the same rows in hash-scattered order — every file
  *    spans all types and the full clock, min/max excludes nothing.
  *
  * Usage: runMain graft.tools.LayoutProbe [sfDir] [outBase]
  * Prints files/bytes/rows read per layout; evidence in SCALE_NOTES.md.
  */
object LayoutProbe {

  private def scanStats(spark: SparkSession, path: String,
      filterExpr: String): (Long, Long, Long, Long) = {
    val df = spark.read.parquet(path).filter(expr(filterExpr))
    // drive THIS QueryExecution: collect() is the one action wired to
    // the Dataset's own queryExecution (write/foreach/count all build a
    // twin plan whose metrics this method could not see); the filtered
    // slice is small by construction
    df.collect()
    val plan = df.queryExecution.executedPlan
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(leaves)
      }
    val scan = leaves(plan).head
    if (sys.env.contains("LAYOUT_DEBUG"))
      scan.metrics.foreach { case (k, v) => println(s"[metric] $k = ${v.value}") }
    def m(name: String): Long =
      scan.metrics.get(name).map(_.value).getOrElse(-1L)
    (m("numFiles"), m("filesSize"), m("numOutputRows"),
      m("pruningTime").max(0L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val base = if (args.length > 1) args(1) else "/tmp/layout_probe"
    val spark = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // small files on purpose: many row groups -> skipping is observable
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "20000")

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts_sec", "user_id", "event_type", "value")
    ev.repartition(col("event_type"))
      .sortWithinPartitions("event_type", "ts_sec")
      .write.mode("overwrite").parquet(s"$base/clustered")
    ev.repartition(32, col("event_id")) // hash-scatter: worst-case layout
      .write.mode("overwrite").parquet(s"$base/shuffled")

    // a selective slice: one type, one hour of the clock
    val bounds = ev.agg(min("ts_sec"), max("ts_sec")).collect()(0)
    val t0 = bounds.getLong(0)
    val f = s"event_type = 'click' AND ts_sec >= $t0 AND ts_sec < ${t0 + 3600}"

    for ((name, path) <- Seq("clustered" -> s"$base/clustered",
        "shuffled" -> s"$base/shuffled")) {
      val (files, bytes, rows, _) = scanStats(spark, path, f)
      println(f"[layout] $name%-10s filesRead=$files%4d bytesRead=$bytes%12d rowsOut=$rows%8d")
    }
    spark.stop()
  }
}
