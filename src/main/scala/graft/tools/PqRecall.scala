package graft.tools
object PqRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      def topk(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("rank") <= 3).select("q_id", "cand_id").as[(Long, Long)].collect().toSet
      val bf = topk(graft.operators.Similarity.annTopkCosine(spark, dir))
      val pq = topk(graft.operators.Similarity.annIvfPqTopk(spark, dir))
      val ivf = topk(graft.operators.Similarity.annIvfTopk(spark, dir))
      println(f"[pqrecall] $dir pq_vs_bf=${pq.intersect(bf).size.toDouble/bf.size}%.3f ivf_vs_bf=${ivf.intersect(bf).size.toDouble/bf.size}%.3f pq_vs_ivf=${pq.intersect(ivf).size.toDouble/ivf.size}%.3f")
    }
    spark.stop()
  }
}
