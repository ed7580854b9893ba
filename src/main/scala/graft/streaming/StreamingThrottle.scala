package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.operators.Detectors.throttle]]: pass the
  * FIRST alert per (rule, key, period bucket) downstream immediately and
  * swallow the rest of the bucket — alert-storm suppression as a
  * continuous operator.
  *
  * Delta vs the batch form, by design: the batch query reports each
  * bucket's `n_suppressed` (it sees whole buckets); the stream emits the
  * surviving alert at arrival time, when the bucket's final count is
  * unknowable — suppression volume is observable via the metrics
  * counters instead. Within a micro-batch, rows fold in (ts_sec,
  * event_id) order, so intra-batch disorder cannot change the survivor;
  * across batches the state advances monotonically (an alert for a
  * bucket at-or-before one already emitted is suppressed), so a
  * straggler bucket never double-fires.
  *
  * Scale posture: per-(rule, key) state is ONE long (the last emitted
  * bucket) — hot keys cost the same state as cold ones; keys
  * hash-partition via groupByKey; RocksDB state + optional idle-key TTL
  * like the other transformWithState operators. */
object StreamingThrottle {

  def throttled(alerts: Dataset[SAlert], periodSec: Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[SAlert] = {
    import alerts.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    // Key by the TUPLE, not a delimiter-joined string: caller-supplied
    // rule names/keys may contain any delimiter, and a collision would
    // silently share one throttle watermark between two (rule, key)
    // pairs — i.e. suppress real alerts.
    // COMPATIBILITY: this tuple key uses a different state-store key
    // encoder than the pre-r6 delimited-string key — a query restarted
    // from a checkpoint written before the change will fail or mis-read
    // its throttle state. Deployments upgrading across that change must
    // start from a fresh checkpointLocation (throttle state is a single
    // last-emitted bucket per key, so the cost is at most one duplicate
    // alert per (rule, key) in the first period after the reset). The
    // r13 move to column grouping below changes the grouping schema
    // again — same fresh-checkpoint posture, same bounded cost.
    //
    // `groupBy(cols).as[...]` groups on the EXISTING columns, so the map
    // side of the exchange stays row-to-row whole-stage codegen — the
    // old groupByKey(lambda) paid a deserialize→tuple→serialize object
    // round trip per alert, and under an alert storm the alert volume is
    // the event volume (StreamThroughputBench's core phase measures
    // exactly that regime).
    alerts.toDF()
      .groupBy(org.apache.spark.sql.functions.col("rule_name"),
        org.apache.spark.sql.functions.col("key"))
      .as[(String, String), SAlert]
      .transformWithState(new ThrottleProcessor(periodSec, ttl), timeMode,
        OutputMode.Append())
  }

  /** Product-typed state so an absent value surfaces as null, not a
    * primitive default (0 is a valid bucket id). */
  final case class ThrState(last: Long)

  /** Pure per-batch fold (separated for property testing): survivors =
    * the (ts_sec, event_id)-minimal alert of every bucket strictly
    * after `last`, in ascending bucket order, plus the advanced
    * watermark bucket. One pass, O(distinct buckets) memory — never
    * materializes the batch (an alert storm puts millions of hot-key
    * rows in one batch). Truncating `/` matches the batch twin's
    * `ts_sec div period` (and DuckDB `//`) on negative timestamps
    * where floorDiv would not. */
  private[graft] def survivors(last: Long, rows: Iterator[SAlert],
      periodSec: Long): (Seq[SAlert], Long) = {
    val best = scala.collection.mutable.LongMap.empty[SAlert]
    rows.foreach { a =>
      val bucket = a.ts_sec / periodSec
      if (bucket > last) {
        val cur = best.getOrNull(bucket)
        if (cur == null || a.ts_sec < cur.ts_sec ||
            (a.ts_sec == cur.ts_sec && a.event_id < cur.event_id))
          best(bucket) = a
      }
    }
    if (best.isEmpty) (Seq.empty, last)
    else (best.toSeq.sortBy(_._1).map(_._2), best.keysIterator.max)
  }

  final class ThrottleProcessor(periodSec: Long, ttl: TTLConfig)
      extends StatefulProcessor[(String, String), SAlert, SAlert] {

    @transient private var lastBucket: ValueState[ThrState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastBucket = getHandle.getValueState[ThrState]("lastBucket",
        Encoders.product[ThrState], ttl)

    override def handleInputRows(key: (String, String), rows: Iterator[SAlert],
        timerValues: TimerValues): Iterator[SAlert] = {
      // Long.MinValue sentinel = no bucket emitted yet for this key
      val last = Option(lastBucket.get()).map(_.last).getOrElse(Long.MinValue)
      val (out, newLast) = survivors(last, rows, periodSec)
      if (newLast != last) lastBucket.update(ThrState(newLast))
      out.iterator
    }
  }
}
