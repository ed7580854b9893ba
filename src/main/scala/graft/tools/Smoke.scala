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
    val dir = "/root/testdata/sf0.01"
    println("=== q5 plan ===")
    graft.operators.Analytics.q5LocalSupplier(spark, dir).explain("formatted")
    println("=== q1 plan ===")
    graft.operators.Analytics.q1PricingSummary(spark, dir).explain("formatted")
    spark.stop()
  }
}
