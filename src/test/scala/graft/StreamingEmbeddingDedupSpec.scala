package graft

import graft.operators.Similarity
import graft.streaming.StreamingEmbeddingDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity + growth semantics for the streaming embedding-dedup twin —
  * the embedding analog of StreamingIncrementalDedupSpec's theorems:
  * against a static base index, any micro-batch split of the increment
  * equals the batch operator exactly; grow mode pairs later batches
  * against earlier novel vectors. */
class StreamingEmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("v1", "v2", "sim_r").as[(Long, Long, Double)].collect().toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("static base: micro-batch replay equals the batch operator exactly") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val newVecs = emb.filter(col("vec_id") % 10 === 7)
    val baseVecs = Similarity.normalized(emb.filter(col("vec_id") % 10 =!= 7))
    val baseDir = tmp("graft-embdedup")
    StreamingEmbeddingDedup.initBase(spark, dir, baseVecs, baseDir)

    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val onBatch = StreamingEmbeddingDedup.onBatch(baseDir, growBase = false,
      (hits, _) => got ++= rows(hits))
    (0 until 3).foreach { b =>
      onBatch(newVecs.filter(pmod(col("vec_id"), lit(89)) % 3 === b), b.toLong)
    }
    val want = rows(Similarity.embeddingDedupIncremental(spark, dir))
    assert(want.nonEmpty, "fixture must produce at least one pair")
    assert(got.toSet == want)
  }

  test("grow mode: later batches pair against earlier novel vectors") {
    val baseDir = tmp("graft-embdedup-grow")
    // base holds one direction; the increment introduces a NOVEL
    // direction twice across two batches — the second copy must pair
    // against the first (grown index), not the base
    def vec(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat)
    val d = 64
    def unit(axis: Int, axis2: Int = -1): Array[Float] = {
      val a = Array.fill(d)(0.0f); a(axis) = 1.0f
      if (axis2 >= 0) a(axis2) = 0.3f
      a
    }
    val base = Similarity.normalized(
      Seq((1L, unit(0))).toDF("vec_id", "embedding"))
    StreamingEmbeddingDedup.initBase(spark, dir, base, baseDir)

    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Double)]]
    val onBatch = StreamingEmbeddingDedup.onBatch(baseDir, growBase = true,
      (hits, id) => got(id) = rows(hits))
    // batch 0: a copy of the base vector (pairs, not grown) and a novel
    // direction (no pair -> grows the index)
    onBatch(Seq((10L, unit(0)), (11L, unit(7))).toDF("vec_id", "embedding"), 0L)
    assert(got(0L).map(t => (t._1, t._2)) == Set((10L, 1L)))
    // batch 1: a near-copy of the novel direction must hit vec 11
    onBatch(Seq((20L, unit(7, 9))).toDF("vec_id", "embedding"), 1L)
    assert(got(1L).exists(t => t._1 == 20L && t._2 == 11L && t._3 >= 0.45),
      s"near-copy of a grown vector must pair with it: ${got(1L)}")
    // duplicate of an already-paired vector never re-enters the index:
    // 30 pairs with 11 (and with 20 if 20 was novel — 20 DID pair, so
    // it must NOT be in the index)
    onBatch(Seq((30L, unit(7))).toDF("vec_id", "embedding"), 2L)
    assert(got(2L).map(t => (t._1, t._2)) == Set((30L, 11L)),
      s"paired vectors must not grow the index: ${got(2L)}")

    // marker-deleted replay of batch 1: identical re-delivery, identical
    // index — the replay reads batch < 1 (cannot pair against its own
    // crashed growth) and overwrites cells/batch=1 with the same rows
    def idxNow(): Set[(Long, Long, Int)] =
      spark.read.parquet(s"$baseDir/cells").select("vec_id", "cell", "batch")
        .as[(Long, Long, Int)].collect().toSet
    val before = idxNow()
    val delivered1 = got(1L)
    val marker = new java.io.File(s"$baseDir/_graft_embdedup_ledger/1")
    assert(marker.exists() && marker.delete())
    got.remove(1L)
    onBatch(Seq((20L, unit(7, 9))).toDF("vec_id", "embedding"), 1L)
    assert(got(1L) == delivered1)
    assert(idxNow() == before)
  }
}
