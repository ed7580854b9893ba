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
  *
  * `dispose` (optional) releases resources a dropped value pins — for
  * the checkpoint-backed frames that means unpersisting the RDD blocks,
  * which `spark.catalog.clearCache()` never touches. It runs only on
  * values whose computation actually completed.
  */
final class SessionCache[V](
    valid: (SparkSession, V) => Boolean = (_: SparkSession, _: V) => true,
    dispose: V => Unit = (_: V) => ()) {

  SessionCache.register(this)

  /** `value` memoizes under the holder's monitor (Scala lazy val); a
    * throwing computation leaves it uninitialized, so the next caller
    * retries instead of caching the failure. `done` flips only after a
    * successful computation, so [[clear]] never forces an uncomputed
    * holder (and never disposes a half-built value). */
  private final class Holder(compute: () => V) {
    @volatile var done: Boolean = false
    lazy val value: V = { val v = compute(); done = true; v }
  }

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

  /** Drop every entry belonging to `spark`'s session, disposing each
    * fully-computed value (unpersist of checkpoint blocks for the
    * frame-backed caches). The bench calls this through [[SessionCache.clearAll]]
    * on its cold pass so per-query times include the artifacts the query
    * actually needs — see Bench.scala. */
  def clear(spark: SparkSession): Unit = {
    val u = ids.get(spark)
    if (u != null) {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == u) {
          val h = e.getValue
          it.remove()
          if (h.done) dispose(h.value)
        }
      }
    }
  }

  private def hook(spark: SparkSession, u: String): Unit =
    if (hooked.add(u))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(event: SparkListenerApplicationEnd): Unit = {
          m.keySet.removeIf(_._1 == u)
          hooked.remove(u)
        }
      })
}

/** Registry of every live SessionCache instance (all are operator-object
  * singletons, so the set is small and append-only) — lets the bench wipe
  * all session-memoized artifacts between queries without each call site
  * exporting its private cache. */
object SessionCache {
  private val instances =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[SessionCache[_]]())

  private def register(c: SessionCache[_]): Unit = instances.add(c)

  /** Clear every registered cache's entries for `spark`. */
  def clearAll(spark: SparkSession): Unit =
    instances.synchronized {
      val it = instances.iterator()
      while (it.hasNext) it.next().clear(spark)
    }
}
