package graft.tools

/** Dev-only: print the ANALYZED and OPTIMIZED logical plans of selected
  * queries (the shapes optimizer rules pattern-match on).
  * Usage: runMain graft.tools.LogicalDump [queryCsv] [sfDir]
  */
object LogicalDump {
  def main(args: Array[String]): Unit = {
    val wanted: Set[String] =
      if (args.nonEmpty) args(0).split(",").toSet else Set.empty
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
      .foreach { case (name, fn) =>
        val qe = fn(spark, dir).queryExecution
        println(s"\n===== $name : optimized =====")
        println(qe.optimizedPlan.treeString)
      }
    spark.stop()
  }
}
