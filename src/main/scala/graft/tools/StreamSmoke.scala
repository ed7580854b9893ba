package graft.tools

import graft.model._
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only: replay the reference sample cohort through the streaming
  * engine and print the alert stream (runtime drive of the
  * flatMapGroupsWithState path). */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rules: Seq[DetectionRule] = Seq(
      RateRule("high_rate", "userId", 10, 5.0),
      ThresholdRule("high_amount", "amount", 10000.0),
      StatisticalRule("unusual_amount", "amount", 20, 2.5))

    var id = 0L
    def ev(k: String, t: Long, v: Double): SEvent = { id += 1; SEvent(k, id, t, Some(v)) }
    val t0 = 1000000L
    val batch1 = (0 until 6).map(i => ev("user_001", t0 + i, 50.0)) ++
      Seq(ev("user_002", t0 + 100, 15000.0))
    val batch2 = Seq(102.5, 98.75, 101.2, 99.8, 103.1, 5000.0).zipWithIndex
      .map { case (v, i) => ev("user_003", t0 + 200 + i * 30, v) } ++
      Seq(ev("user_002", t0 + 160, 25000.0))

    val ms = MemoryStream[SEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-smoke-ckpt").toString
    // no TTL here: under the default zero-interval trigger a
    // processing-time timeout busy-loops empty batches (see
    // StreamingDetectors.alerts scaladoc); TTL belongs with a real trigger
    val q = StreamingDetectors.alerts(ms.toDS(), rules)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    ms.addData(batch1); q.processAllAvailable()
    println(s"--- after batch 1 (${spark.table("alerts").count()} alerts) ---")
    spark.table("alerts").show(20, false)
    ms.addData(batch2); q.processAllAvailable()
    println(s"--- after batch 2 (${spark.table("alerts").count()} alerts) ---")
    spark.table("alerts").show(20, false)
    q.stop()
    spark.stop()
  }
}
