package graft.tools

import graft.operators.Detectors
import org.apache.spark.sql.functions._

/** Scratch micro-bench: alert throttling under an alert storm — one
  * pathological (rule, key) receiving half of a large alert stream. The
  * throttle's partition key includes the time bucket, so the hot key's
  * alerts spread across time-sliced groups instead of one partition; this
  * measures that the hot key costs roughly the same as the spread keys
  * and that output collapses by ~period/alert-rate. */
object ThrottleBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 20000000L
    // storm: 50% of alerts on key "hot", 1 alert/sec over ~n/2 seconds;
    // the rest spread over 100k keys in the same time range
    val df = spark.range(n).select(
      lit("r1").as("rule_name"),
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(pmod(col("id") * 2654435761L, lit(100000L)).cast("string"))
        .as("key"),
      expr("id div 2").as("ts_sec"),
      col("id").as("event_id"))
    df.cache(); df.count()
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val out = Detectors.throttle(df, 600L).count()
      println(f"throttle 20M alerts: ${(System.nanoTime() - t0) / 1e9}%.2f s, survivors=$out")
    }
    spark.stop()
  }
}
