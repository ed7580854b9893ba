package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

final case class AbsEvent(key: String, ts_sec: Long)
final case class AbsEventT(key: String, ts_sec: Long, ets: java.sql.Timestamp)
final case class AbsAlert(key: String, silent_from: Long, deadline_sec: Long)
final case class AbsSt(last: Long)

/** Streaming twin of [[graft.operators.Detectors.absenceAlerts]] — the
  * LIVE dead-man switch, and the one detector that cannot be written as a
  * per-event transform at all: it must fire when NO event arrives, which
  * only a timer can do. Per key: one `ValueState` holding the latest
  * event time, and ONE armed event-time timer at `last + gap` —
  * `deleteTimer` disarms the stale deadline whenever a newer event
  * re-arms it, so state is one long + one timer per key, independent of
  * volume and horizon.
  *
  * When the watermark passes an armed deadline, [[AbsAlert]] fires with
  * the silence start (the last seen event) and the deadline it breached —
  * the streaming analogue of the batch query's silence report: every
  * batch row (resumed or trailing) whose `silent_from + gap` the final
  * watermark has passed appears here, pinned by spec over an
  * out-of-order replay.
  *
  * Late events (event time <= stored last) neither re-arm nor un-fire:
  * inside the disorder bound the watermark has not passed the breached
  * deadline yet, so the re-arm happens before the alert could fire —
  * bounded-disorder replay is exact; beyond the bound, a fired alert
  * stands (the standard watermark contract, same as
  * [[StreamingDetectors.alertsEventTime]]). */
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

  final class AbsenceProcessor(gapSec: Long)
      extends StatefulProcessor[String, AbsEventT, AbsAlert] {

    @transient private var st: ValueState[AbsSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AbsSt]("last",
        Encoders.product[AbsSt], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[AbsEventT],
        timerValues: TimerValues): Iterator[AbsAlert] = {
      val mx = rows.map(_.ts_sec).max
      val prev = Option(st.get())
      if (prev.forall(mx > _.last)) {
        prev.foreach(p => getHandle.deleteTimer((p.last + gapSec) * 1000L))
        st.update(AbsSt(mx))
        getHandle.registerTimer((mx + gapSec) * 1000L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AbsAlert] = {
      val cur = Option(st.get())
      // only the CURRENT deadline may fire; a racing stale timer (deleted
      // deadline that expired in the same batch) is ignored
      cur match {
        case Some(s) if expiredTimerInfo.getExpiryTimeInMs() == (s.last + gapSec) * 1000L =>
          Iterator.single(AbsAlert(key, s.last, s.last + gapSec))
        case _ => Iterator.empty
      }
    }
  }
}
