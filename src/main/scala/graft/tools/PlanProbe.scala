package graft.tools

/** Print the executed plan of one registered query (default: token_count)
  * — `sbt "runMain graft.tools.PlanProbe [query] [sfDir]"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("token_count")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.sources.Sessions.builder("local[4]", 4)
      .appName("plan-probe").getOrCreate()
    try {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"=== $name executedPlan ===")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
