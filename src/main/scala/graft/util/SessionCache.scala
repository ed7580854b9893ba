package graft.util

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for expensive derived values (propagated
  * dedup-cluster labels, trained IVF centroids).
  *
  * A bare `ConcurrentHashMap[(SparkSession, String), V]` has two lifecycle
  * hazards this type closes:
  *
  *  1. Keying by the session OBJECT retains the stopped session (and its
  *     whole object graph) for the life of the JVM. Here keys are
  *     `(sessionUUID, key)` strings — the map never holds the session
  *     itself, and a stale entry can never be served to a new session
  *     (UUIDs are unique per session instance). On application end every
  *     entry belonging to that session is dropped outright.
  *  2. A cached value backed by locally-checkpointed RDD blocks is
  *     UNRECOMPUTABLE after executor loss — lineage was truncated, so
  *     without a guard every later serve fails permanently instead of
  *     recomputing. The caller-supplied `valid` predicate runs on every
  *     serve; a false verdict recomputes and replaces the entry.
  *
  * Compute-once semantics: lookups go through `ConcurrentHashMap.compute`,
  * so concurrent callers of the same key block rather than duplicating the
  * (expensive, block-pinning) computation.
  */
final class SessionCache[V](
    valid: (SparkSession, V) => Boolean = (_: SparkSession, _: V) => true) {

  private val m = new ConcurrentHashMap[(String, String), V]()
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  // Spark's own sessionUUID is private[sql]; mint one per session instance
  // instead. The WeakHashMap key is the session, the value a plain string
  // that references nothing — so this identity table never retains a
  // session either, and a NEW session object always maps to a fresh id.
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def uuid(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  def get(spark: SparkSession, key: String)(compute: => V): V = {
    val u = uuid(spark)
    hook(spark, u)
    m.compute((u, key), (_, cur) =>
      if (cur != null && valid(spark, cur)) cur else compute)
  }

  /** Entry count (test hook). */
  def size: Int = m.size

  private def hook(spark: SparkSession, u: String): Unit =
    if (hooked.add(u))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(event: SparkListenerApplicationEnd): Unit = {
          m.keySet.removeIf(_._1 == u)
          hooked.remove(u)
        }
      })
}
