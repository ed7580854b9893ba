package graft

import org.apache.spark.sql.functions._

/** Pins that the BUILT-IN skew armor actually engages: on the hot-key
  * adversary shape (one key holding half the fact side of a large×large
  * equi-join), AQE's skew-join rule must detect the oversized shuffle
  * partition at runtime and split it — visible as `skew=true` on the
  * sort-merge join of the adaptively executed plan — and the split plan
  * must agree exactly with the AQE-off plan.
  *
  * The engineered forms (salting, sliced rate windows, bounded-heap
  * top-k) exist for the cases AQE statistics cannot see (skew introduced
  * mid-pipeline, non-join skew, first-run without runtime stats); this
  * spec is the evidence the DEFAULT path handles the visible case, so
  * the hand-built armor is an addition, not a workaround. Thresholds are
  * scaled down (64 KiB skew trigger, 16 KiB advisory target) so a
  * test-sized fact exhibits the same relative skew a 100 TB partition
  * would against production defaults (256 MiB / 64 MiB). */
class AqeSkewSplitSpec extends SparkSpec {

  test("AQE splits the hot partition: skew=true in the executed join, exact parity") {
    val n = 400000L
    // fact: 50% of rows on key 0, rest spread over 100k keys
    val fact = spark.range(n).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(col("id") * 2654435761L, lit(100000L))).as("k"),
      col("id").as("v"))
    val dim = spark.range(100000L).select(col("id").as("k"),
      (col("id") % 97).as("attr"))

    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("v") % 1000003L)).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      conf.set("spark.sql.adaptive.enabled", "false")
      val plainFp = fingerprint(fact.join(dim, "k"))

      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      // the hot partition is ~5x the median here — right at the default
      // factor-5 boundary; 2.0 makes the trigger unambiguous at test scale
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      val joined = fact.join(dim, "k")
      val aqeFp = fingerprint(joined)
      // inspect the join's OWN adaptively-executed plan (the fingerprint
      // agg above is a separate query execution; foreach/rdd actions
      // execute a CLONED plan and leave this one isFinalPlan=false)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("skew=true"),
        s"AQE did not mark the join as skew-split:\n$plan")
      assert(aqeFp == plainFp, s"AQE skew split changed the result: " +
        s"plain=$plainFp aqe=$aqeFp")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
