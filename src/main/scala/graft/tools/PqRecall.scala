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
      val mp = topk(graft.operators.Similarity.annIvfMultiprobe(spark, dir))
      val rr = topk(graft.operators.Similarity.annIvfPqRerank(spark, dir))
      println(f"[pqrecall] $dir rerank_vs_bf=${rr.intersect(bf).size.toDouble/bf.size}%.3f multiprobe_vs_bf=${mp.intersect(bf).size.toDouble/bf.size}%.3f rerank_vs_mp=${rr.intersect(mp).size.toDouble/mp.size}%.3f")
    }
    spark.stop()
  }
}
