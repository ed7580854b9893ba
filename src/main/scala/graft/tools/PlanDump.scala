package graft.tools

/** Dev-only: print the formatted plan of the Bloom probe stage. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.operators.Warehouse.bloomProbe(spark, "/root/testdata/sf0.01")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
