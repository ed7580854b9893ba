package graft

import graft.operators.Analytics
import graft.plans.{TopKPerKey, TopKPerKeyExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins for the tier-(c) custom operator stack (logical node + strategy +
  * physical bounded-heap exec): result equivalence with the window form,
  * the physical plan shape (partial/final pair around ONE exchange, no
  * WindowExec, no full Sort), and edge semantics. */
class TopKPerKeySpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("matches the window-form top-k on the fixture") {
    val native = Analytics.topkNative(spark, dir)
      .as[(String, Long, Double, Long)].collect().toSet
    val window = Analytics.topkEventsPerUser(spark, dir)
      .select("key", "event_id", "value", "ts_sec")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("matches an in-memory replay on random data, any k") {
    val rnd = new scala.util.Random(20260812L)
    val rows = Seq.tabulate(2000) { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(500).toDouble, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(7)
    Seq(1, 3, 50).foreach { k =>
      val got = TopKPerKey.topK(df, Seq(col("k")),
          Seq(col("v").desc, col("id")), k)
        .as[(Long, Double, Long)].collect()
      val want = rows.groupBy(_._1).values.flatMap(
        _.sortBy { case (_, v, id) => (-v, id) }.take(k)).toSet
      assert(got.toSet == want, s"k=$k")
      // no duplicated rows either (ids are unique)
      assert(got.length == want.size, s"k=$k")
    }
  }

  test("physical plan: partial+final pair, one exchange, no window/sort") {
    val df = TopKPerKey.topK(
      Seq((1L, 2.0, 3L)).toDF("k", "v", "id").repartition(4),
      Seq(col("k")), Seq(col("v").desc, col("id")), 2)
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case e: TopKPerKeyExec => e }
    assert(execs.map(_.partial).sorted == Seq(false, true))
    // exactly one shuffle sits BETWEEN partial and final (the test's own
    // repartition below the partial node doesn't count)
    val finalNode = execs.find(!_.partial).get
    val partialNode = execs.find(_.partial).get
    val between = collect(finalNode.child) { case s: ShuffleExchangeLike => s }.size -
      collect(partialNode) { case s: ShuffleExchangeLike => s }.size
    assert(between == 1)
    assert(collect(plan) { case w: WindowExec => w }.isEmpty)
    assert(collect(plan) { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty)
  }

  test("k >= group size returns whole groups; keys with nulls group together") {
    val df = Seq(
      (Some(1L), 10.0, 1L), (Some(1L), 20.0, 2L),
      (None, 5.0, 3L), (None, 7.0, 4L), (None, 6.0, 5L)
    ).toDF("k", "v", "id")
    val got = TopKPerKey.topK(df, Seq(col("k")), Seq(col("v").desc, col("id")), 10)
      .as[(Option[Long], Double, Long)].collect()
    assert(got.length == 5)
    val nullGroup = TopKPerKey.topK(df, Seq(col("k")), Seq(col("v").desc, col("id")), 2)
      .filter(col("k").isNull).as[(Option[Long], Double, Long)].collect()
    assert(nullGroup.map(_._3).sorted.toSeq == Seq(4L, 5L))
  }

  test("null ORDER values follow the window form's null ordering") {
    val rnd = new scala.util.Random(5L)
    val rows = Seq.tabulate(400) { i =>
      (rnd.nextInt(10).toLong,
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(50).toDouble),
        i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(5)
    Seq(col("v").desc -> "desc", col("v").asc -> "asc").foreach { case (o, label) =>
      val got = TopKPerKey.topK(df, Seq(col("k")), Seq(o, col("id")), 3)
        .as[(Long, Option[Double], Long)].collect().toSet
      val w = Window.partitionBy("k").orderBy(o, col("id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("k", "v", "id").as[(Long, Option[Double], Long)].collect().toSet
      assert(got == want, label)
    }
  }

  test("rewrite rule: window-form top-k plans as the bounded heap") {
    val rows = Seq.tabulate(300)(i => ((i % 7).toLong, (i * 31 % 83).toDouble, i.toLong))
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    // rn <= k with rn dropped: fires
    val df = rows.toDF("k", "v", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
    df.collect()
    assert(collect(df.queryExecution.executedPlan) { case e: TopKPerKeyExec => e }.size == 2)
    assert(collect(df.queryExecution.executedPlan) { case x: WindowExec => x }.isEmpty)
    // rn < k (strict) also fires, with k-1
    val strict = rows.toDF("k", "v", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") < 4).drop("rn")
    assert(collect(strict.queryExecution.executedPlan) { case e: TopKPerKeyExec => e }.nonEmpty)
    assert(strict.collect().toSet == df.collect().toSet)
    // results identical to what the window ACTUALLY computes
    val want = rows.groupBy(_._1).values.flatMap(
      _.sortBy { case (_, v, id) => (-v, id) }.take(3)).toSet
    assert(df.as[(Long, Double, Long)].collect().toSet == want)
  }

  test("rewrite rule: declines when ranks survive or other window columns exist") {
    val rows = Seq.tabulate(100)(i => ((i % 5).toLong, i.toDouble, i.toLong))
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    // rn kept in the output: the caller wants ranks — no rewrite
    val keepRn = rows.toDF("k", "v", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    keepRn.collect()
    assert(collect(keepRn.queryExecution.executedPlan) { case e: TopKPerKeyExec => e }.isEmpty)
    assert(collect(keepRn.queryExecution.executedPlan) { case x: WindowExec => x }.nonEmpty)
    // a second window column forces the window plan
    val twoCols = rows.toDF("k", "v", "id")
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max("v").over(Window.partitionBy("k")))
      .filter(col("rn") <= 2).drop("rn")
    twoCols.collect()
    assert(collect(twoCols.queryExecution.executedPlan) { case e: TopKPerKeyExec => e }.isEmpty)
  }

  test("agrees with the window form under partition-count extremes") {
    val rows = Seq.tabulate(500)(i => ((i % 5).toLong, (i * 37 % 97).toDouble, i.toLong))
    Seq(1, 32).foreach { parts =>
      val df = rows.toDF("k", "v", "id").repartition(parts)
      val got = TopKPerKey.topK(df, Seq(col("k")),
          Seq(col("v").desc, col("id")), 4)
        .as[(Long, Double, Long)].collect().toSet
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val want = rows.toDF("k", "v", "id")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
        .select("k", "v", "id").as[(Long, Double, Long)].collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }
}
