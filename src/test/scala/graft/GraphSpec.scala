package graft

import graft.operators.Graph

/** Behavioral pins for the transition-graph PageRank operator. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val SCALE = 1000000000000L

  test("mass conservation up to dangling leak; all ranks positive") {
    val ranks = Graph.typeMarkovRank(spark, dir)
      .as[(String, Long)].collect()
    assert(ranks.nonEmpty)
    assert(ranks.forall(_._2 > 0L))
    val total = ranks.map(_._2).sum
    // PageRank mass cannot exceed SCALE (truncation + dangling only
    // remove mass) and teleport alone guarantees ~15% of it
    assert(total <= SCALE, s"total $total exceeds SCALE")
    assert(total >= SCALE * 14 / 100, s"total $total below the teleport floor")
  }

  test("deterministic across runs (the iteration has no float or order sensitivity)") {
    val a = Graph.typeMarkovRank(spark, dir).as[(String, Long)].collect().toMap
    val b = Graph.typeMarkovRank(spark, dir).as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("a hub state with all inbound probability outranks its feeders") {
    // 40 users alternate X->Z, 40 alternate Y->Z: Z receives the full
    // outbound probability of both X and Y, and feeds only X/Y back
    val rows = for {
      u <- 0 until 80
      i <- 0 until 10
    } yield {
      val feeder = if (u < 40) "X" else "Y"
      val t = if (i % 2 == 0) feeder else "Z"
      ((u * 10 + i).toLong,               // event_id
        1700000000000000000L + u * 1000000000000L + i * 1000000000L, // ts ns
        u.toLong, t, 1.0, "{}")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graph").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ranks = Graph.typeMarkovRank(spark, tmp)
      .as[(String, Long)].collect().toMap
    assert(ranks.keySet == Set("X", "Y", "Z"))
    assert(ranks("Z") > ranks("X") && ranks("Z") > ranks("Y"),
      s"hub not top: $ranks")
    // symmetric feeders tie exactly (integer arithmetic, identical inputs)
    assert(ranks("X") == ranks("Y"), s"symmetric feeders diverge: $ranks")

    // frequent_paths on the same constructed corpus: each user's strict
    // alternation F,Z,F,Z... (10 events) yields 4 (F,Z,F) and 4 (Z,F,Z)
    // trigrams; 40 users per feeder
    val paths = Graph.frequentPaths(spark, tmp)
      .as[(String, String, String, Long)].collect()
      .map(p => (p._1, p._2, p._3) -> p._4).toMap
    assert(paths(("X", "Z", "X")) == 160L && paths(("Z", "X", "Z")) == 160L)
    assert(paths(("Y", "Z", "Y")) == 160L && paths(("Z", "Y", "Z")) == 160L)
    assert(paths.size == 4) // no cross-feeder trigram can exist
  }

  test("frequent_paths plan: TakeOrdered, no global sort exchange") {
    val df = Graph.frequentPaths(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
  }
}
