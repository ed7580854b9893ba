package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import scala.collection.mutable.ArrayBuffer

final case class PatEvent(key: String, event_id: Long, ts_ns: Long, ts_sec: Long,
  event_type: String)
final case class PatAlert(key: String, event_id: Long, ts_sec: Long,
  rule_name: String, span_sec: Long)

/** Streaming twin of [[graft.operators.Detectors.patternAlerts]] — the CEP
  * sequence rule, live: per key, the previous N−1 error timestamps ride in
  * one fixed-size ValueState (a bounded deque — for N = 3, two longs), and
  * each arriving error closes or extends the run in O(1). Same
  * arrival-order contract as the reference detectors
  * ([[StreamingDetectors.alerts]]): in-order replay is spec-pinned
  * byte-identical to the batch query.
  *
  * The non-error stream never reaches the state store: the filter runs
  * before groupByKey, so state traffic is proportional to the ERROR rate,
  * not the event rate — the same scan-side-substream shape as the batch
  * plan. */
object StreamingPattern {

  final case class PatSt(t1: Long, t2: Long) // previous two error ts_ns (t1 older)

  def alerts(events: Dataset[PatEvent]): Dataset[PatAlert] = {
    import events.sparkSession.implicits._
    events.filter(_.event_type == "error")
      .groupByKey(_.key)
      .transformWithState(new PatternProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  final class PatternProcessor
      extends StatefulProcessor[String, PatEvent, PatAlert] {

    @transient private var st: ValueState[PatSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PatSt]("pat",
        Encoders.product[PatSt], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PatEvent],
        timerValues: TimerValues): Iterator[PatAlert] = {
      var cur = Option(st.get()).getOrElse(PatSt(-1L, -1L))
      val out = ArrayBuffer.empty[PatAlert]
      // micro-batch rows fold in event order (the arrival-order contract
      // is per replayed batch; within one batch the iterator is unsorted)
      rows.toSeq.sortBy(e => (e.ts_ns, e.event_id)).foreach { e =>
        if (cur.t1 >= 0 &&
            e.ts_ns - cur.t1 <= graft.operators.Detectors.patternWindowNs)
          out += PatAlert(key, e.event_id, e.ts_sec, "error_burst",
            (e.ts_ns - cur.t1) / 1000000000L)
        cur = PatSt(cur.t2, e.ts_ns)
      }
      st.update(cur)
      out.iterator
    }
  }
}
