package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Behavioral pins for nearest-centroid classification. The fixture
  * labels are RANDOM (accuracy sits at chance there — verified), so the
  * semantics are pinned on a constructed separable corpus; the fixture
  * run pins conservation and the plan shape. */
class CentroidClassifySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("confusion matrix conserves the held-out population") {
    val cm = Similarity.centroidClassify(spark, dir)
    val total = cm.agg(sum("n")).collect()(0).getLong(0)
    val heldOut = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(graft.functions.VectorExprs.dotd(col("v"), col("v"))))
      .filter(col("norm") > 0.0 && col("vec_id") % 4 === 0)
      .count()
    assert(total == heldOut, s"confusion total $total != held-out $heldOut")
    // predictions stay in the label domain seen at train time
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select("label").distinct().as[Int].collect().toSet
    val preds = cm.select("pred_label").distinct().as[Int].collect().toSet
    assert(preds.subsetOf(labels), s"predicted unseen labels ${preds -- labels}")
  }

  test("separable corpus classifies perfectly (diagonal confusion matrix)") {
    // 3 labels, axis-aligned clusters with small same-axis jitter:
    // centroids are far apart, so every held-out vector must land on its
    // own label's centroid
    val dims = 64
    val rows = for {
      label <- 0 until 3
      i <- 0 until 40
    } yield {
      val v = Array.fill(dims)(0.001f * ((i + label) % 5))
      v(label) = 1.0f + 0.01f * (i % 7) // dominant axis = label
      ((label * 40 + i).toLong, v, label)
    }
    val tmp = java.nio.file.Files.createTempDirectory("cc").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val cm = Similarity.centroidClassify(spark, tmp)
      .as[(Int, Int, Long)].collect()
    assert(cm.nonEmpty)
    assert(cm.forall { case (l, p, _) => l == p },
      s"off-diagonal predictions: ${cm.filter(c => c._1 != c._2).mkString(", ")}")
    assert(cm.map(_._3).sum == rows.count(_._1 % 4 == 0))
  }

  test("label_outliers: exactly the bottom-3 of an independent local recompute") {
    val out = Similarity.labelOutliers(spark, dir)
      .as[(Int, Long, Double)].collect()
    assert(out.nonEmpty)
    // full local recompute: quantize, per-label floored-mean centroid,
    // exact long dots, bottom-3 by (cos, vec_id)
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
      .filter { case (_, _, v) => math.sqrt(v.map(x => x * x).sum) > 0.0 }
      .map { case (id, l, v) =>
        (id, l, v.map(x => math.floor(x * 1000000.0 + 0.5).toLong).toArray)
      }
    val expected = vecs.groupBy(_._2).flatMap { case (l, vs) =>
      val n = vs.length
      val cent = Array.tabulate(vs.head._3.length) { d =>
        math.floor(vs.map(_._3(d)).sum.toDouble / n.toDouble).toLong
      }
      val nc2 = cent.map(c => c * c).sum
      if (nc2 <= 0L) Seq.empty[(Int, Long, Double)]
      else vs.toSeq.flatMap { case (id, _, q) =>
        val nq2 = q.map(x => x * x).sum
        if (nq2 <= 0L) None
        else {
          val dot = q.zip(cent).map { case (a, b) => a * b }.sum
          Some((l, id, dot.toDouble / (math.sqrt(nq2.toDouble) * math.sqrt(nc2.toDouble))))
        }
      }.sortBy(o => (o._3, o._2)).take(3)
    }.toSet
    assert(out.toSet == expected,
      s"got ${out.toSet -- expected}, missing ${expected -- out.toSet}")
  }

  test("plan: centroids broadcast, no shuffle join, long-dot kernel in the loop") {
    val df = Similarity.centroidClassify(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    assert(nodes("SortMergeJoin") == 0 && nodes("ShuffledHashJoin") == 0, plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("graft_dotl"), plan)
  }
}
