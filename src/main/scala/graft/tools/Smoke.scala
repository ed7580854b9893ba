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
    println("=== classpath rules -> engine ===")
    val cfg = graft.model.RulesLoader.load()
    println(s"loaded ${cfg.rules.size} rules: ${cfg.rules.map(_.name).mkString(", ")}")
    val alerts = graft.operators.Detectors.allAlerts(e, cfg.rules)
    println(s"alerts from YAML-driven engine: ${alerts.count()}")
    alerts.show(3, false)
    spark.stop()
  }
}
