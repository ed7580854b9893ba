package graft

import graft.model._
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row shape for the single-parse `props_threshold` path; `k_val` is an
  * Option because try_cast yields null for absent/non-numeric `$.k`. */
case class PropsHit(event_id: Long, key: String, ts_sec: Long, k_val: Option[Double])

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-runnable twin in [[oracleSql]]
  * with the SAME column names (the driver sorts columns by name before
  * hashing values). Rule-derived queries share one source of truth for
  * parameters: the [[FixtureRules]] instances feed both the Spark plan
  * ([[Detectors]]) and the SQL generator ([[DetectorSql]]).
  */
object SparkEntry {

  /** Canonical rule parameterization for the driver fixtures (chosen per
    * FIXTURES.md §B.1 so both fire/no-fire branches are exercised:
    * `value > 100` fires ≈12%, rate window 1 h with threshold 2,
    * statistical window 5 / 2.0σ). Mirrors the shape of the reference's
    * config/rules.yml (high_rate / high_amount / unusual_amount). */
  object FixtureRules {
    val threshold: ThresholdRule = ThresholdRule("high_value", "value", 100.0)
    val rate: RateRule = RateRule("high_rate", "user_id", 3600, 2.0)
    val statistical: StatisticalRule = StatisticalRule("unusual_value", "value", 5, 2.0)
    val all: Seq[DetectionRule] = Seq(threshold, rate, statistical)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full engine in batch — all three rules unioned. */
  def entry(spark: SparkSession): DataFrame =
    Detectors.allAlerts(
      Tables.events(spark, "/root/testdata/sf0.001"), FixtureRules.all)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    "threshold_alerts" -> ((s, dir) =>
      Detectors.thresholdAlerts(Tables.events(s, dir), FixtureRules.threshold)),
    "rate_alerts" -> ((s, dir) =>
      Detectors.rateAlerts(Tables.events(s, dir), FixtureRules.rate)),
    // identical alerts, slice-parallel window: a hot key spreads across
    // timeline-slice tasks instead of serializing through one
    "rate_alerts_sliced" -> ((s, dir) =>
      Detectors.rateAlertsSliced(Tables.events(s, dir), FixtureRules.rate)),
    "stat_alerts" -> ((s, dir) =>
      Detectors.statisticalAlerts(Tables.events(s, dir), FixtureRules.statistical)),
    "all_alerts" -> ((s, dir) =>
      Detectors.allAlerts(Tables.events(s, dir), FixtureRules.all)),
    // the reference's per-detector error containment, ORACLE-GATED: a
    // deliberately broken rule (field that cannot resolve) is excluded and
    // reported, and the surviving union must hash-match the plain
    // all_alerts oracle — proof the containment path neither drops nor
    // perturbs healthy rules (AnomalyProcessFunction.java:120-134)
    "all_alerts_contained" -> ((s, dir) => {
      val broken = ThresholdRule("broken_rule", "no_such_field", 1.0)
      val (alerts, errs) = Detectors.allAlertsContained(
        Tables.events(s, dir), FixtureRules.all :+ broken)
      require(errs.map(_.rule_name) == Seq("broken_rule"),
        s"containment must report exactly the broken rule, got $errs")
      alerts
    }),
    // alert-storm suppression: first alert per (rule, key, 10 min)
    "throttled_alerts" -> ((s, dir) =>
      Detectors.throttle(
        Detectors.thresholdAlerts(Tables.events(s, dir), FixtureRules.threshold), 600L)),
    // schema-free contract: detect on a dynamic JSON field inside `props`
    // (the reference's Map<String,Object> event shape, Event.java:39-59)
    "props_threshold" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      // Parse ONCE per row: a Column filter on the k_val alias gets pushed
      // below the Project with the parse substituted into the predicate
      // (two get_json_object evaluations per surviving row). The typed
      // closure filter is a substitution barrier — Catalyst cannot inline
      // an alias into a lambda — so the plan keeps a single parse in the
      // projection; the ser/de hop for a 4-field row is far cheaper than a
      // second JSON parse on a schema-free 100 TB hot path.
      Tables.events(s, dir)
        .select(col("event_id"),
          Detectors.keyCol("user_id").as("key"), col("ts_sec"),
          get_json_object(col("props"), "$.k").try_cast("double").as("k_val"))
        .as[PropsHit]
        .filter(_.k_val.exists(_ > 50.0))
        .toDF()
    }),
    // alert FUSION across all four detector families (threshold / rate /
    // statistical / seasonal): one row per flagged event with how many
    // independent rules fired and which — the triage score a SIEM ranks
    // by (an event 3 rules agree on outranks any single firing). Shape:
    // union of the already-computed alert streams + one hash agg on
    // event_id; rule names are sorted before joining so the list is
    // order-free.
    "ensemble_alerts" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val base = Detectors.allAlerts(Tables.events(s, dir), FixtureRules.all)
        .select(col("event_id"), col("rule_name"))
      val seas = Analytics.seasonalAlerts(s, dir)
        .select(col("event_id"), lit("seasonal_value").as("rule_name"))
      val burst = Detectors.patternAlerts(s, dir)
        .select(col("event_id"), col("rule_name"))
      base.unionByName(seas).unionByName(burst).groupBy("event_id")
        .agg(count(lit(1)).as("n_rules"),
          array_join(sort_array(collect_list(col("rule_name"))), ",").as("rules"))
    }),
    // absence (dead-man switch) + sequence-pattern (CEP) detector families
    "absence_alerts" -> ((s, dir) => Detectors.absenceAlerts(s, dir)),
    "pattern_alerts" -> ((s, dir) => Detectors.patternAlerts(s, dir)),
    // identical silences, slice-parallel gap scan (hot-key skew armor)
    "absence_alerts_sliced" -> ((s, dir) => Detectors.absenceAlertsSliced(s, dir)),
    "multimodal_features" -> ((s, dir) => Multimodal.features(s, dir)),
    "multimodal_frames" -> ((s, dir) => Multimodal.frames(s, dir)),
    "multimodal_resize" -> ((s, dir) => Multimodal.resize(s, dir)),
    "multimodal_phash_dedup" -> ((s, dir) => Multimodal.phashDedup(s, dir)),
    "multimodal_phash_clusters" -> ((s, dir) => Multimodal.phashClusters(s, dir)),
    "multimodal_phash_radius_curve" -> ((s, dir) => Multimodal.phashRadiusCurve(s, dir)),
  ) ++ Analytics.queries ++ Warehouse.queries ++ Dedup.queries ++
    TextAnalysis.queries ++ Similarity.queries ++ Corpus.queries ++
    Retrieval.queries ++ Graph.queries ++ Linkage.queries ++
    Forget.queries ++ Crawl.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "threshold_alerts" -> DetectorSql.threshold(FixtureRules.threshold),
    "rate_alerts" -> DetectorSql.rate(FixtureRules.rate),
    // same oracle as rate_alerts: the sliced plan must be output-identical
    "rate_alerts_sliced" -> DetectorSql.rate(FixtureRules.rate),
    "stat_alerts" -> DetectorSql.statistical(FixtureRules.statistical),
    "all_alerts" -> DetectorSql.all(FixtureRules.all),
    // containment leaves the healthy union bit-identical to all_alerts
    "all_alerts_contained" -> DetectorSql.all(FixtureRules.all),
    "throttled_alerts" -> DetectorSql.throttled(FixtureRules.threshold, 600L),
    "ensemble_alerts" ->
      s"""WITH a AS (
         |${DetectorSql.all(FixtureRules.all)}
         |), se AS (
         |${Analytics.seasonalAlertsSql}
         |), pb AS (
         |  SELECT * FROM (${Detectors.patternAlertsSql})
         |)
         |SELECT event_id, count(*) AS n_rules,
         |  array_to_string(list(rule_name ORDER BY rule_name), ',') AS rules
         |FROM (SELECT event_id, rule_name FROM a
         |  UNION ALL SELECT event_id, 'seasonal_value' AS rule_name FROM se
         |  UNION ALL SELECT event_id, rule_name FROM pb)
         |GROUP BY 1""".stripMargin,
    "absence_alerts" -> Detectors.absenceAlertsSql,
    "pattern_alerts" -> Detectors.patternAlertsSql,
    "absence_alerts_sliced" -> Detectors.absenceAlertsSql,
    "multimodal_features" -> Multimodal.featuresSql,
    "multimodal_frames" -> Multimodal.framesSql,
    "multimodal_resize" -> Multimodal.resizeSql,
    "multimodal_phash_dedup" -> Multimodal.phashDedupSql,
    "multimodal_phash_clusters" -> Multimodal.phashClustersSql,
    "multimodal_phash_radius_curve" -> Multimodal.phashRadiusCurveSql,
    "props_threshold" ->
      """SELECT event_id,
        |  coalesce(CAST(user_id AS VARCHAR), '__unknown__') AS "key",
        |  epoch_ns(ts) // 1000000000 AS ts_sec,
        |  TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val
        |FROM events
        |WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50.0""".stripMargin,
  ) ++ Analytics.oracles ++ Warehouse.oracles ++ Dedup.oracles ++
    TextAnalysis.oracles ++ Similarity.oracles ++ Corpus.oracles ++
    Retrieval.oracles ++ Graph.oracles ++ Linkage.oracles ++
    Forget.oracleSql ++ Crawl.oracles
}
