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
  * Compute-once semantics WITHOUT holding the map's bin lock through the
  * computation: `computeIfAbsent` only installs a cheap lazy holder, and
  * the (expensive — often a full Spark job) computation runs under the
  * holder's own monitor. Running it inside `ConcurrentHashMap.compute`
  * would pin the bin lock for minutes — blocking unrelated keys that hash
  * to the same bin, stalling the listener-bus thread when
  * `onApplicationEnd`'s removeIf hits the bin, and deadlocking any
  * re-entrant get from inside a computation (CHM recursive-update).
  * Concurrent callers of the same key still block on the holder rather
  * than duplicating the computation.
  */
final class SessionCache[V](
    valid: (SparkSession, V) => Boolean = (_: SparkSession, _: V) => true) {

  /** `value` memoizes under the holder's monitor (Scala lazy val); a
    * throwing computation leaves it uninitialized, so the next caller
    * retries instead of caching the failure. */
  private final class Holder(compute: () => V) { lazy val value: V = compute() }

  private val m = new ConcurrentHashMap[(String, String), Holder]()
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
    val k = (u, key)
    var result: Option[V] = None
    while (result.isEmpty) {
      var fresh = false
      val h = m.computeIfAbsent(k, _ => { fresh = true; new Holder(() => compute) })
      val v = h.value // may run the computation — outside any map lock
      if (fresh || valid(spark, v)) result = Some(v)
      else m.remove(k, h) // stale (e.g. checkpoint blocks lost): retry fresh
    }
    result.get
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
