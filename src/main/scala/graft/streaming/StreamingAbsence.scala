package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

final case class AbsEvent(key: String, ts_sec: Long)
final case class AbsEventT(key: String, ts_sec: Long, ets: java.sql.Timestamp)
final case class AbsAlert(key: String, silent_from: Long, deadline_sec: Long)

/** Per-key absence state. `evs` is the ascending list of ALIVE
  * silence-start candidates — events that (so far) have no successor
  * within `gap`; the invariant "consecutive retained events are > gap
  * apart" plus watermark pruning bounds it at ~`disorder/gap + 2`
  * entries regardless of event rate, because any event whose next event
  * lands within `gap` is falsified immediately and dropped (later
  * insertions can only shrink a gap, never re-open it). `emittedUpTo`
  * is the largest silent_from already reported (confirmations happen in
  * ascending order, so one long dedups both the resumed-then-trailing
  * and the timer-vs-input race). `armed` is the single registered
  * event-time timer (ms), 0 = none. */
final case class AbsSt(evs: List[Long], emittedUpTo: Long, armed: Long)

/** Streaming twin of [[graft.operators.Detectors.absenceAlerts]] — the
  * LIVE dead-man switch, and the one detector that cannot be written as a
  * per-event transform at all: it must fire when NO event arrives, which
  * only a timer can do.
  *
  * Semantics: a silence starting at event time `a` is CONFIRMED exactly
  * when the watermark passes `a + gap` — at that point no event that
  * could break the silence (any `c` with `a < c <= a+gap`) can still
  * arrive, so confirmation is sound under bounded disorder, and it is
  * complete because every candidate `a` stays buffered until either a
  * falsifying successor arrives or its deadline is observed. A resumed
  * silence (the next event arrives `> gap` later) therefore does NOT
  * lose its alert when the resume shows up before the watermark reaches
  * the old deadline — the candidate simply stays in the buffer until the
  * watermark confirms it. Intra-batch gaps (both endpoints in one
  * micro-batch) are detected the same way: every input row is an
  * insertion, not just the batch max.
  *
  * Mechanics per key: insert each event into the alive-candidate list
  * (falsifying its predecessor if within `gap`, dying on arrival if its
  * successor is within `gap`), then sweep: emit every candidate whose
  * deadline the current watermark has passed, and keep ONE event-time
  * timer armed at the earliest pending deadline so confirmation happens
  * even with no further input for the key. State is a few longs per key,
  * independent of volume and horizon.
  *
  * Trailing silences — no resuming event ever arrives — still require
  * watermark PROGRESS to fire, because `TimeMode.EventTime` has no
  * processing-time timers: a live deployment that wants dead-man alerts
  * during total silence needs a heartbeat source advancing the watermark
  * (the spec's `__wmflush__` sentinel plays that role).
  *
  * Granularity caveat: this twin compares second-floored times while the
  * batch query compares nanoseconds before flooring, so a gap in
  * `(gap, gap + 1s)` can be reported by batch and not here; streaming
  * positives are always batch positives (floor(b)-floor(a) > gap implies
  * b-a > gap). The spec fixture has no such boundary pair, so the pin is
  * exact set equality there. */
object StreamingAbsence {

  def alerts(events: Dataset[AbsEvent], gapSec: Long,
      maxDisorder: java.time.Duration): Dataset[AbsAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withColumn("ets", timestamp_seconds(col("ts_sec")))
      .withWatermark("ets", s"${maxDisorder.getSeconds} seconds")
      .as[AbsEventT]
      .groupByKey(_.key)
      .transformWithState(new AbsenceProcessor(gapSec), TimeMode.EventTime(),
        OutputMode.Append())
  }

  val heartbeatKey = "__heartbeat__"

  /** Synthetic heartbeat stream for LIVE deployments: rate-source rows
    * mapped to [[AbsEvent]]s under a reserved key, stamped with wall-clock
    * event time. Unioned into the monitored stream it keeps the watermark
    * advancing during TOTAL silence — the one condition under which
    * event-time timers cannot fire on their own (TimeMode.EventTime has
    * no processing-time timers), so trailing dead-man alerts keep
    * working when every real key goes quiet, which is exactly when a
    * dead-man switch matters most. One row per `intervalSec` — negligible
    * against any real stream; the heartbeat key's own state is one buffer
    * entry and one timer like any other key. */
  def heartbeat(spark: SparkSession, intervalSec: Long = 1L,
      key: String = heartbeatKey): Dataset[AbsEvent] = {
    import spark.implicits._
    spark.readStream.format("rate")
      .option("rowsPerSecond", "1")
      .load()
      .filter(col("value") % lit(math.max(1L, intervalSec)) === 0L)
      .select(lit(key).as("key"),
        unix_timestamp(col("timestamp")).as("ts_sec"))
      .as[AbsEvent]
  }

  /** [[alerts]] with the heartbeat unioned in and its own alerts filtered
    * back out — the live-deployment form whose trailing alerts fire even
    * when the whole world goes silent. The watermark is applied to the
    * UNIONED stream, so heartbeat event time drives it. */
  def alertsWithHeartbeat(events: Dataset[AbsEvent], gapSec: Long,
      maxDisorder: java.time.Duration, intervalSec: Long = 1L)
      : Dataset[AbsAlert] = {
    val hb = heartbeat(events.sparkSession, intervalSec)
    alerts(events.unionByName(hb), gapSec, maxDisorder)
      .filter(_.key != heartbeatKey)
  }

  /** The pure candidate-buffer transition — kept side-effect-free so the
    * property spec can drive it against a brute-force oracle without a
    * streaming query. */
  object Core {

    val empty = AbsSt(Nil, Long.MinValue, 0L)

    /** Insert one event into the alive-candidate list, preserving the
      * "consecutive entries > gap apart" invariant: a predecessor within
      * `gap` is falsified (it has a successor now), and the new event dies
      * on arrival if ITS successor is within `gap`. */
    def insert(gapSec: Long)(evs: List[Long], ts: Long): List[Long] =
      if (evs.contains(ts)) evs
      else {
        val (below, above) = evs.partition(_ < ts)
        val keptBelow =
          if (below.lastOption.exists(p => ts - p <= gapSec)) below.init
          else below
        if (above.headOption.exists(s => s - ts <= gapSec)) keptBelow ++ above
        else (keptBelow :+ ts) ++ above
      }

    /** Confirm every candidate whose deadline the watermark has passed
      * (ascending, so `emittedUpTo` dedups). Returns (confirmed
      * silence-starts, next state with the earliest pending deadline in
      * `armed`, 0 = none). */
    def sweep(gapSec: Long, st: AbsSt, wmMs: Long): (List[Long], AbsSt) = {
      var evs = st.evs
      var emitted = st.emittedUpTo
      val out = List.newBuilder[Long]
      // STRICTLY past the deadline: an on-time event at ts == a+gap (ts ==
      // watermark is not late under Spark's ts < wm drop rule) could still
      // arrive and falsify the silence — the batch twin's b-a > gap is
      // strict too. Hence the timer is armed one ms past the deadline.
      while (evs.nonEmpty && wmMs > (evs.head + gapSec) * 1000L) {
        val a = evs.head
        if (a > emitted) { out += a; emitted = a }
        evs = evs.tail
      }
      val next = evs.headOption.map(a => (a + gapSec) * 1000L + 1L).getOrElse(0L)
      (out.result(), AbsSt(evs, emitted, next))
    }
  }

  final class AbsenceProcessor(gapSec: Long)
      extends StatefulProcessor[String, AbsEventT, AbsAlert] {

    @transient private var st: ValueState[AbsSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AbsSt]("buf",
        Encoders.product[AbsSt], TTLConfig.NONE)

    /** [[Core.sweep]] plus the side effects: emit alerts, persist state,
      * and keep ONE timer armed at the earliest pending deadline. */
    private def sweepAndArm(key: String, evs0: List[Long], prev: AbsSt,
        wmMs: Long): Iterator[AbsAlert] = {
      val (starts, next) = Core.sweep(gapSec,
        AbsSt(evs0, prev.emittedUpTo, prev.armed), wmMs)
      if (prev.armed != next.armed) {
        if (prev.armed != 0L) getHandle.deleteTimer(prev.armed)
        if (next.armed != 0L) getHandle.registerTimer(next.armed)
      }
      st.update(next)
      starts.iterator.map(a => AbsAlert(key, a, a + gapSec))
    }

    override def handleInputRows(key: String, rows: Iterator[AbsEventT],
        timerValues: TimerValues): Iterator[AbsAlert] = {
      val prev = Option(st.get()).getOrElse(Core.empty)
      val evs = rows.map(_.ts_sec).toArray.sorted
        .foldLeft(prev.evs)(Core.insert(gapSec))
      sweepAndArm(key, evs, prev, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AbsAlert] = {
      val prev = Option(st.get()).getOrElse(Core.empty)
      // only the CURRENTLY armed timer may sweep; a racing stale timer
      // (re-armed deadline that expired in the same batch) is ignored
      if (expiredTimerInfo.getExpiryTimeInMs() != prev.armed) Iterator.empty
      else sweepAndArm(key, prev.evs, prev.copy(armed = 0L),
        timerValues.getCurrentWatermarkInMs())
    }
  }
}
