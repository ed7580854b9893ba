package graft.tools

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** Scratch micro-bench: native DotDouble vs interpreted HOF dot. */
object DotBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    vs.cache(); vs.count()
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val q = vs.limit(10).collect().map(_.getSeq[Double](1).toArray)
    val qlit = array(q.toIndexedSeq.map(arr => array(arr.toIndexedSeq.map(lit): _*)): _*)
    def run(label: String, f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(s"$label: min=${ts.min} all=$ts")
    }
    // explode 10 query vectors against all: 10 * n dot products
    run("native", vs.select(explode(qlit).as("qv"), col("v"))
      .select(sum(VectorExprs.dotd(col("qv"), col("v")))).collect())
    run("hof   ", vs.select(explode(qlit).as("qv"), col("v"))
      .select(sum(hof(col("qv"), col("v")))).collect())
    spark.stop()
  }
}
