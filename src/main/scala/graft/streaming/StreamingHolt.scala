package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import scala.collection.mutable.ArrayBuffer

final case class HoltDay(event_type: String, day: String, y: Long, level8: Long,
  trend8: Long, forecast8: Long)
final case class HoltSt(day: String, y: Long, l: Long, b: Long, init: Boolean)

/** Streaming twin of [[graft.operators.Analytics.holtForecast]] — the live
  * level+trend forecaster: per key, the open day's count and the Holt
  * (l, b) pair ride in ONE fixed-size ValueState; a day is smoothed and
  * its next-step forecast emitted the moment a later day's first event
  * arrives (the [[StreamingCusum]] daily close-out shape). Unlike CUSUM
  * the recurrence is fully self-contained — no batch-trained artifact —
  * because level and trend are defined by the recurrence alone.
  *
  * Exactness: the fold is the batch recurrence verbatim (1/8 fixed
  * point, alpha = beta = 1/4 as integer shifts, truncating division), so
  * day-ordered replay is byte-identical to the batch query on every
  * CLOSED day (spec). Ordering contract identical to [[StreamingCusum]]:
  * in-batch rows fold grouped-by-day in day order; a whole day arriving
  * after a later day opened is dropped. State per key: (day, 3 longs,
  * flag) — constant in volume and horizon. */
object StreamingHolt {

  def forecasts(events: Dataset[CusumEvent]): Dataset[HoltDay] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new HoltProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  final class HoltProcessor
      extends StatefulProcessor[String, CusumEvent, HoltDay] {

    @transient private var st: ValueState[HoltSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HoltSt]("holt",
        Encoders.product[HoltSt], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
        timerValues: TimerValues): Iterator[HoltDay] = {
      val byDay = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.day, m.getOrElse(e.day, 0L) + 1L)
      }.toSeq.sortBy(_._1)

      var cur = Option(st.get())
      val out = ArrayBuffer.empty[HoltDay]
      byDay.foreach { case (day, n) =>
        cur match {
          case None =>
            cur = Some(HoltSt(day, n, 0L, 0L, init = false))
          case Some(c) if day == c.day =>
            cur = Some(c.copy(y = c.y + n))
          case Some(c) if day > c.day => // close out c.day, open `day`
            val (nl, nb) =
              if (!c.init) (8 * c.y, 0L)
              else ((8 * c.y + 3 * (c.l + c.b)) / 4,
                (((8 * c.y + 3 * (c.l + c.b)) / 4) - c.l + 3 * c.b) / 4)
            out += HoltDay(key, c.day, c.y, nl, nb, nl + nb)
            cur = Some(HoltSt(day, n, nl, nb, init = true))
          case Some(_) => // late whole day after close: dropped (contract)
        }
      }
      cur.foreach(st.update)
      out.iterator
    }
  }
}
