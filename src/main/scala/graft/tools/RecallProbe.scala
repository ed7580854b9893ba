package graft.tools

import org.apache.spark.sql.functions.col

/** Dev-only recall probe at arbitrary SF: semantic_dedup (cell-bounded,
  * corpus-scaled K) vs the exact all-pairs audit on the same dir — the
  * recall side of the K-scaling trade, which RecallSpec pins only at
  * fixture SFs where K collapses to 8. More cells mean more boundaries a
  * near-dup pair can straddle; this measures what that costs.
  * Usage: runMain graft.tools.RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def vpairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    val truth = vpairs(graft.operators.Similarity.neardupPairs(spark, dir))
    val got = vpairs(graft.operators.Similarity.semanticDedup(spark, dir))
    val fp = (got -- truth).size
    val r = (got intersect truth).size.toDouble / truth.size
    println(f"RECALL semantic_dedup@$dir truth=${truth.size} got=${got.size} fp=$fp recall=$r%.3f")
    spark.stop()
  }
}
