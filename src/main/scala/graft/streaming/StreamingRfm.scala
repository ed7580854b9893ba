package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Event rows for the streaming feature accumulator (the projection of
  * the event stream [[graft.operators.Analytics.userRfmFeatures]] reads). */
final case class RfmEvent(user_id: Long, ts_sec: Long, value: Option[Double])

/** Running per-user features, emitted after every batch that touches the
  * user. `total_value` is None until a non-null value is seen (matching
  * the batch twin's sum-of-nulls semantics); recency is derivable
  * downstream as `clock - last_sec` against whatever "now" the consumer
  * uses — a running state cannot know the corpus max timestamp. */
final case class RfmFeatures(user_id: Long, n_events: Long,
  total_value: Option[Double], first_sec: Long, last_sec: Long,
  active_days: Long)

/** Streaming twin of [[graft.operators.Analytics.userRfmFeatures]] — the
  * feature-STORE half of the feature-engineering story: the batch query
  * computes the profile from history, this operator keeps it current as
  * events arrive. Every aggregate in the profile is ASSOCIATIVE (count,
  * cents sum, min/max, distinct-day insertion), which is precisely what
  * makes the batch rollup incrementally maintainable
  * ([[graft.operators.Warehouse.rollupIncremental]]) AND streamable with
  * O(1)-ish state — the three views are one design.
  *
  * State per user: one fixed-size value row + a day-key map whose
  * cardinality is bounded by the calendar (a user active every single
  * day for 30 years is ~11k longs), not by event volume; hot users cost
  * the same state as cold ones. Day-count increments check membership
  * first, so the count never scans the map. RocksDB-backed via
  * `transformWithState`; optional TTL evicts dormant users. */
object StreamingRfm {

  def features(events: Dataset[RfmEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[RfmFeatures] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.user_id)
      .transformWithState(new RfmProcessor(ttl), timeMode, OutputMode.Append())
  }

  final case class St(n: Long, cents: Long, hasCents: Boolean,
    firstSec: Long, lastSec: Long, days: Long)

  final class RfmProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, RfmEvent, RfmFeatures] {

    @transient private var st: ValueState[St] = _
    @transient private var daySet: MapState[Long, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[St]("rfm", Encoders.product[St], ttl)
      daySet = getHandle.getMapState[Long, Boolean]("days",
        Encoders.scalaLong, Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[RfmEvent],
        timerValues: TimerValues): Iterator[RfmFeatures] = {
      var s = Option(st.get())
        .getOrElse(St(0L, 0L, hasCents = false, Long.MaxValue, Long.MinValue, 0L))
      rows.foreach { e =>
        val cents = e.value.map(v => math.floor(v * 100.0 + 0.5).toLong)
        s = St(
          s.n + 1,
          s.cents + cents.getOrElse(0L),
          s.hasCents || cents.isDefined,
          math.min(s.firstSec, e.ts_sec),
          math.max(s.lastSec, e.ts_sec),
          s.days + {
            val day = e.ts_sec / 86400L // fixture clocks are positive epochs
            if (daySet.containsKey(day)) 0L else { daySet.updateValue(day, true); 1L }
          })
      }
      st.update(s)
      Iterator.single(RfmFeatures(key, s.n,
        if (s.hasCents) Some(s.cents.toDouble / 100.0) else None,
        s.firstSec, s.lastSec, s.days))
    }
  }
}
