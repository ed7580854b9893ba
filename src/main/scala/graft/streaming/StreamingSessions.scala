package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A closed user session: [start_sec, end_sec] with no internal gap
  * > gapSec, matching the batch formulation
  * ([[graft.operators.Analytics.sessionize]]) row-for-row. */
final case class SessionOut(key: String, session_id: Long, n_events: Long,
    start_sec: Long, end_sec: Long, duration_sec: Long)

/** Per-key open-session state: running session ordinal, event count, the
  * min/max event-time bounds of the open session, and the timestamp of
  * the most recent event in PROCESSING (eventId) order — the gap check
  * runs on consecutive events like the batch lag, while the emitted
  * bounds are min/max like the batch aggregation, so non-monotone
  * timestamps inside a session can't produce negative durations. */
final case class SessState(seq: Long, n: Long, minSec: Long, maxSec: Long,
    lastSec: Long)

/** Streaming sessionization — the stream-native complement of the batch
  * `sessionize` query: per-key gap-based sessions maintained in group
  * state, emitted (Append mode) when they CLOSE. A session closes when
  *  (a) a same-key event arrives more than `gapSec` after the session's
  *      last event (the successor session opens in the same call), or
  *  (b) with `closeOnWatermark`, the event-time watermark passes
  *      last + gap — idle sessions flush without needing a successor
  *      event, and their state is removed (bounded state at 100 TB:
  *      state per key is one 4-field record, lifetime bounded by the
  *      watermark delay + gap).
  *
  * Ordering contract: events are processed in `eventId` order within a
  * micro-batch (same contract as [[StreamingDetectors]]), so a replay in
  * eventId order reproduces the batch operator's lag-over-event_id
  * semantics exactly.
  *
  * Scale posture: one hash shuffle on key (the groupByKey exchange);
  * state is O(1) per key regardless of session length; emission is
  * append-only so downstream sinks never see updates.
  */
object StreamingSessions {

  def sessions(events: Dataset[SEvent], gapSec: Long = 1800,
      closeOnWatermark: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val src =
      if (!closeOnWatermark) events
      else events.toDF()
        .withColumn("et", timestamp_seconds(col("tsSec")))
        .withWatermark("et", "0 seconds")
        .as[SEvent]
    val timeout =
      if (closeOnWatermark) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.key)
      .flatMapGroupsWithState[SessState, SessionOut](OutputMode.Append(), timeout) {
        (key: String, it: Iterator[SEvent], state: GroupState[SessState]) =>
          def closed(s: SessState) = SessionOut(key, s.seq, s.n,
            s.minSec, s.maxSec, s.maxSec - s.minSec)
          if (state.hasTimedOut) {
            val out = state.getOption.map(closed).toSeq
            state.remove()
            out.iterator
          } else {
            var st = state.getOption
            val out = Seq.newBuilder[SessionOut]
            it.toSeq.sortBy(e => (e.eventId, e.tsSec, e.original)).foreach { e =>
              st match {
                case None =>
                  st = Some(SessState(1L, 1L, e.tsSec, e.tsSec, e.tsSec))
                case Some(s) if e.tsSec - s.lastSec > gapSec =>
                  out += closed(s)
                  st = Some(SessState(s.seq + 1, 1L, e.tsSec, e.tsSec, e.tsSec))
                case Some(s) =>
                  st = Some(s.copy(n = s.n + 1,
                    minSec = math.min(s.minSec, e.tsSec),
                    maxSec = math.max(s.maxSec, e.tsSec),
                    lastSec = e.tsSec))
              }
            }
            st.foreach { s =>
              state.update(s)
              if (closeOnWatermark)
                // strictly after both the session-close boundary and the
                // current watermark (Spark rejects timeouts <= watermark)
                state.setTimeoutTimestamp(math.max(
                  (math.max(s.lastSec, s.maxSec) + gapSec) * 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }
}
