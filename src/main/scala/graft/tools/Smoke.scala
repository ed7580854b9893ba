package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for quick local checks (not part of the driver
  * contract). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    e.printSchema()
    e.select("event_id", "ts_ns", "ts_sec", "ts", "user_id", "value").show(5, false)
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    time("warm")(spark.read.parquet(s"$dir/documents.parquet").count())
    val docs = graft.sources.Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      graft.operators.Dedup.tokens(col("text")).as("toks"))
    time("tokenize")(toks.write.format("noop").mode("overwrite").save())
    val sh = docs.select(col("doc_id"), explode(
      graft.operators.Dedup.shingles(graft.operators.Dedup.tokens(col("text")))).as("sh"))
    time("shingle_explode")(sh.write.format("noop").mode("overwrite").save())
    time("shingle_count")(println(sh.count()))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
    time("common_selfjoin")(common.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
