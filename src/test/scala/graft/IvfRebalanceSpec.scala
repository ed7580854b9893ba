package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** Pins the IVF retrain/rebalance operator (VERDICT r9 item 5): on a
  * corpus engineered so one direction floods a single cell, splitting
  * the hot cell must (1) cut max occupancy, (2) keep every vector
  * assigned (no rows lost to the new centroid set), and (3) preserve
  * retrieval: recall@3 vs brute force under the rebalanced index must
  * not fall below the pre-rebalance index's.
  */
class IvfRebalanceSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  /** Skewed fixture: 70% of vectors crowd 3 tight clusters around one
    * dominant direction (one-ish hot cell after training), the rest
    * spread over 40 scattered clusters. Deterministic integer-derived
    * floats, including the query ids (< 10) and k-means init ids
    * (100..). */
  private lazy val skewDir: String = {
    val n = 1200
    val rows = (0 until n).map { id =>
      val crowd = id % 10 < 7
      val cluster = if (crowd) id % 3 else 3 + id % 40
      val v = Array.tabulate(dims) { d =>
        val base =
          if (crowd) (if (d < 8) 9.0f else ((cluster * 131 + d * 17) % 19 - 9) / 40.0f)
          else ((cluster * 131 + d * 17) % 19 - 9) / 9.0f
        val eps = ((id * 31 + d * 7) % 11 - 5) / 500.0f
        base + eps
      }
      (id.toLong, v, cluster % 5)
    }
    val tmp = java.nio.file.Files.createTempDirectory("ivfskew").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def maxOcc(cents: org.apache.spark.sql.DataFrame): Long =
    Similarity.assignCells(spark, skewDir, cents)
      .groupBy("cell").count().agg(org.apache.spark.sql.functions.max("count"))
      .as[Long].head()

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.filter(col("rank") <= 3).select("q_id", "cand_id")
      .as[(Long, Long)].collect().toSet

  test("splitting hot cells cuts max occupancy and keeps retrieval") {
    val cellCap = 256
    val before = Similarity.centroidsDf(spark, skewDir)
    val occB = maxOcc(before)
    assert(occB > cellCap, s"fixture must start skewed (max occupancy $occB)")

    val after = Similarity.rebalancedCentroids(spark, skewDir, cellCap)
    val occA = maxOcc(after)
    info(s"max occupancy $occB -> $occA (cap $cellCap); " +
      s"cells ${before.count()} -> ${after.count()}")
    assert(occA < occB, "rebalance must cut max occupancy")
    assert(after.count() > before.count(), "splits must add centroids")

    // no rows lost: every vector still assigns to exactly one cell
    val nVecs = Similarity.assignCells(spark, skewDir, before).count()
    assert(Similarity.assignCells(spark, skewDir, after).count() == nVecs)

    // retrieval preserved: recall@3 vs brute force does not drop
    val bf = topk(Similarity.annTopkCosine(spark, skewDir))
    val rb = topk(Similarity.annIvfTopkWith(spark, skewDir, before))
      .intersect(bf).size.toDouble / bf.size
    val ra = topk(Similarity.annIvfTopkWith(spark, skewDir, after))
      .intersect(bf).size.toDouble / bf.size
    info(f"recall@3 before=$rb%.3f after=$ra%.3f")
    assert(ra >= rb, s"rebalance dropped recall: $rb -> $ra")
  }

  test("a balanced corpus is a no-op (same centroid set back)") {
    val dir = "/root/testdata/sf0.01"
    val before = Similarity.centroidsDf(spark, dir)
      .as[(Long, Array[Double], Double)].collect().map(t => (t._1, t._2.toSeq, t._3)).toSet
    val after = Similarity.rebalancedCentroids(spark, dir, 256)
      .as[(Long, Array[Double], Double)].collect().map(t => (t._1, t._2.toSeq, t._3)).toSet
    assert(after == before)
  }
}
