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
    println("=== env config -> rules -> engine (EP1 lifecycle) ===")
    // DEFAULT_KEY_FIELD falls back to the fixture's user_id unless the
    // environment overrides it (reference default is userId, a column the
    // fixture doesn't have)
    val jc = graft.model.JobConfig.fromEnvironment(
      Map("DEFAULT_KEY_FIELD" -> "user_id") ++ sys.env)
    println(s"job config: $jc")
    val cfg = graft.model.JobConfig.loadRules(jc)
    println(s"loaded ${cfg.rules.size} rules: ${cfg.rules.map(_.name).mkString(", ")}")
    val alerts = graft.operators.Detectors.allAlerts(e, cfg.rules, jc.defaultKeyField)
    println(s"alerts from YAML-driven engine: ${alerts.count()}")
    alerts.show(3, false)
    spark.stop()
  }
}
