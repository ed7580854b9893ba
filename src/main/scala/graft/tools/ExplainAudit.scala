package graft.tools

/** Dev-only plan audit: prints the formatted physical plan of selected
  * queries so scan pruning (ReadSchema / PushedFilters), exchange counts,
  * and WholeStageCodegen coverage can be eyeballed per round.
  * Usage: runMain graft.tools.ExplainAudit [queryCsv] [sfDir]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val wanted: Set[String] =
      if (args.nonEmpty) args(0).split(",").toSet else Set.empty
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        fn(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
