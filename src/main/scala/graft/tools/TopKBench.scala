package graft.tools

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch micro-bench: custom bounded-heap top-k vs the window form, on
  * a large synthetic input with one pathological hot key (the shape where
  * the map-side k-row reduction matters: the window plan must shuffle and
  * sort the ENTIRE hot key in one task). */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 20000000L
    // ~50% of rows land on key 0, the rest spread over 100k keys
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(col("id") * 2654435761L, lit(100000L))).as("k"),
      (col("id") * 1103515245L % 1000000L).cast("double").as("v"),
      col("id"))
    df.cache(); df.count()
    def run(label: String, f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(s"$label: min=${ts.map(_._1).min}s rows=${ts.head._2} all=${ts.map(_._1)}")
    }
    run("native", TopKPerKey.topK(df, Seq(col("k")),
      Seq(col("v").desc, col("id")), 3).count())
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    run("window", df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn").count())
    spark.stop()
  }
}
