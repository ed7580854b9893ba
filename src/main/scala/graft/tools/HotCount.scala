package graft.tools

/** Dev-only: row counts of a query across dirs (attributes hot-corpus
  * slowdowns to output growth vs skew serialization).
  * Usage: runMain graft.tools.HotCount <query> <dir1> <dir2> ...
  */
object HotCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { dir =>
      val n = graft.SparkEntry.queries(args(0))(spark, dir).count()
      println(s"[hotcount] ${args(0)} @ $dir = $n")
    }
    spark.stop()
  }
}
