package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.operators.Corpus
import graft.util.SessionCache

/** Lifecycle pins for [[SessionCache]] (ADVICE r6): serve-time validation
  * must RECOMPUTE a dead entry (a locally-checkpointed frame whose blocks
  * vanished is unrecomputable via lineage — the old bare-map cache failed
  * forever), and memoization must still hold for healthy entries. */
class SessionCacheSpec extends SparkSpec {

  test("memoizes per key; recomputes when the validity check fails") {
    val computes = new AtomicInteger(0)
    @volatile var healthy = true
    val cache = new SessionCache[Int](valid = (_, _) => healthy)
    assert(cache.get(spark, "a") { computes.incrementAndGet() } == 1)
    assert(cache.get(spark, "a") { computes.incrementAndGet() } == 1)
    assert(cache.get(spark, "b") { computes.incrementAndGet() } == 2)
    assert(computes.get() == 2, "healthy entries must serve without recompute")
    healthy = false
    assert(cache.get(spark, "a") { computes.incrementAndGet() } == 3)
    healthy = true
    assert(cache.get(spark, "a") { computes.incrementAndGet() } == 3,
      "the recomputed value must be re-cached")
    assert(cache.size == 2)
  }

  test("dedup labels survive losing their checkpointed blocks") {
    val dir = "/root/testdata/sf0.001"
    val before = Corpus.dedupClusters(spark, dir).collect().sortBy(_.getLong(0))
    assert(before.nonEmpty)
    // simulate executor loss: drop every persisted RDD's blocks — the
    // cached labels frame is now unrecomputable through lineage, so only
    // the cache layer's validity check stands between this and a
    // permanently failing operator
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val after = Corpus.dedupClusters(spark, dir).collect().sortBy(_.getLong(0))
    assert(after.toSeq == before.toSeq)
  }
}
