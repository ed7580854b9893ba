package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import scala.collection.mutable.ArrayBuffer

final case class CusumEvent(event_type: String, day: String)
final case class CusumDay(event_type: String, day: String, y: Long, s: Long,
  alarm: Boolean)
final case class CusumState(day: String, y: Long, s: Long)

/** Streaming twin of [[graft.operators.Analytics.cusumAlerts]] — the live
  * slow-drift detector: per event type, the open day's count and the CUSUM
  * statistic ride in ONE fixed-size ValueState, and a day is scored the
  * moment a later day's first event arrives (daily close-out). The
  * in-control mean `mu8` is a BATCH-trained artifact
  * ([[graft.operators.Analytics.cusumBaseline]], |types| rows), the same
  * train-offline / score-online split as [[StreamingSeasonal]] — a
  * sequential statistic cannot know the full-horizon mean online, so the
  * batch trainer owns it and the stream only folds.
  *
  * Exactness: the fold is the batch recurrence verbatim (1/8 fixed point,
  * integer max/compare), so day-ordered replay produces byte-identical
  * (day, y, s, alarm) rows to the batch query for every CLOSED day
  * (pinned by spec; the final day stays open forever in a stream — that
  * row only exists once the next day starts).
  *
  * Ordering contract: within a micro-batch, rows fold grouped-by-day in
  * day order (the iterator order is not relied on); across micro-batches
  * the replay must be day-monotone per key — a whole day arriving after a
  * later day already opened is DROPPED, the same contract as any
  * daily-close pipeline without a reprocessing path (watermarked
  * re-aggregation is the batch query's job).
  *
  * State per key: one (day, long, long) — constant in volume and horizon. */
object StreamingCusum {

  def alerts(events: Dataset[CusumEvent], baseline: Map[String, Long])
      : Dataset[CusumDay] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(baseline), TimeMode.None(),
        OutputMode.Append())
  }

  final class CusumProcessor(baseline: Map[String, Long])
      extends StatefulProcessor[String, CusumEvent, CusumDay] {

    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
        timerValues: TimerValues): Iterator[CusumDay] = {
      // a key the batch trainer never saw has no in-control mean: scoring
      // it against mu8 = 0 would alarm on EVERY day with traffic (review
      // finding), so untrained keys are dropped until the next retrain —
      // the same explicit-drop contract as late days
      if (!baseline.contains(key)) { rows.foreach(_ => ()); return Iterator.empty }
      val mu8 = baseline(key)
      val k8 = mu8 / 64
      val h8 = mu8 / 4
      val byDay = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.day, m.getOrElse(e.day, 0L) + 1L)
      }.toSeq.sortBy(_._1)

      var cur = Option(st.get())
      val out = ArrayBuffer.empty[CusumDay]
      byDay.foreach { case (day, n) =>
        cur match {
          case None =>
            cur = Some(CusumState(day, n, 0L))
          case Some(c) if day == c.day =>
            cur = Some(c.copy(y = c.y + n))
          case Some(c) if day > c.day => // close out c.day, open `day`
            val news = math.max(0L, c.s + 8 * c.y - mu8 - k8)
            val alarm = news > h8
            out += CusumDay(key, c.day, c.y, news, alarm)
            cur = Some(CusumState(day, n, if (alarm) 0L else news))
          case Some(_) => // late whole day after close: dropped (see scaladoc)
        }
      }
      cur.foreach(st.update)
      out.iterator
    }
  }
}
