package graft

import graft.model.RulesLoader
import graft.operators.Detectors
import graft.sources.Tables

/** Config -> engine end-to-end: the YAML on the classpath drives query
  * construction exactly like the reference's EP1 lifecycle (SURVEY.md §3),
  * and produces the same alerts as the hand-built FixtureRules. */
class EndToEndSpec extends SparkSpec {

  test("classpath rules.yml compiles to the same engine as FixtureRules") {
    // ambient RULES_CONFIG_PATH would redirect load() away from the
    // classpath fallback under test — make the precondition explicit
    assume(sys.env.get("RULES_CONFIG_PATH").isEmpty)
    val cfg = RulesLoader.load()
    assert(cfg.rules.toSet == SparkEntry.FixtureRules.all.toSet)
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val fromYaml = Detectors.allAlerts(df, cfg.rules)
      .select("rule_name", "key", "event_id").collect().map(_.toString).sorted
    val fromCode = Detectors.allAlerts(df, SparkEntry.FixtureRules.all)
      .select("rule_name", "key", "event_id").collect().map(_.toString).sorted
    assert(fromYaml.nonEmpty && fromYaml.sameElements(fromCode))
  }

  test("driver entry() produces alerts (smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("buildPipeline drives the fused production engine through the YAML->config lifecycle") {
    // The full EP1 lifecycle minus the Kafka edges (VERDICT r13 #2): the
    // classpath YAML rules + an env-shaped config with a throttle select
    // the FUSED tws topology in SentinelJob.buildPipeline, and a raw
    // JSON stream through it produces byte-identical alerts to the
    // staged reference-parity form under the same throttle.
    assume(sys.env.get("RULES_CONFIG_PATH").isEmpty)
    val rules = RulesLoader.load().rules
    val cfg = graft.model.JobConfig.fromEnvironment(Map(
      "ALERT_THROTTLE_SEC" -> "600", "DEFAULT_KEY_FIELD" -> "user_id"))
    assert(cfg.detectorEngine == "tws" && cfg.alertThrottleSec == 600L)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      // events shaped like the fixture rules' fields (value + user_id)
      val lines = (0 until 150).map { i =>
        s"""{"user_id":"u${i % 4}","event_id":$i,"ts":${5000 + i * 4},"value":${i % 120}}"""
      }
      val ms = MemoryStream[String]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-fused").toString
      val q = graft.streaming.SentinelJob
        .buildPipeline(ms.toDS().toDF("value"), cfg, rules)
        .writeStream.format("memory").queryName("e2e_fused")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      val got =
        try {
          lines.grouped(40).foreach { g => ms.addData(g); q.processAllAvailable() }
          spark.table("e2e_fused").as[String].collect().sorted.toSeq
        } finally q.stop()
      // staged reference-parity form, same throttle period
      val ms2 = MemoryStream[String]
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-e2e-staged").toString
      val q2 = graft.sources.EventJson.serializeAlerts(
          graft.streaming.StreamingThrottle.throttled(
            graft.streaming.StreamingDetectors.alertsTws(
              graft.streaming.StreamingDetectors.parsedEvents(
                ms2.toDS().toDF("value"), rules, "user_id"), rules),
            600L).toDF())
        .writeStream.format("memory").queryName("e2e_staged")
        .outputMode("append").option("checkpointLocation", ckpt2).start()
      val want =
        try {
          lines.grouped(40).foreach { g => ms2.addData(g); q2.processAllAvailable() }
          spark.table("e2e_staged").as[String].collect().sorted.toSeq
        } finally q2.stop()
      assert(got.nonEmpty && got == want)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("Kafka wiring is complete up to connector resolution (offline)") {
    // The production job (SentinelJob) is compile-complete; this container
    // ships no spark-sql-kafka jar (SURVEY §2 op 1), so source resolution
    // is exactly where it must stop — with the standard missing-data-source
    // error, not a wiring bug.
    val cfg = graft.model.JobConfig(kafkaBootstrapServers = "broker:9092")
    val ex = intercept[Exception] {
      graft.streaming.SentinelJob.kafkaSource(spark, cfg)
    }
    val msg = ex.toString + Option(ex.getMessage).getOrElse("")
    assert(msg.contains("kafka") || msg.contains("DATA_SOURCE"))
  }
}
