package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues}

final case class HllEvent(event_type: String, user_key: String)

final case class HllEstimate(event_type: String, n_regs: Long, v_zero: Long,
  est_raw: Double)

/** Streaming twin of [[graft.operators.Analytics.hllDistinctAudit]] — the
  * live distinct-cardinality monitor: per key, the 64 HLL registers live
  * in a MapState and every micro-batch folds its hashes in by register
  * MAX. Because max is ORDER-FREE and the register math is exact integer
  * arithmetic, the streaming registers after any prefix of the data are
  * bit-identical to the batch audit over the same rows — not
  * approximately, exactly (pinned by spec). That is the real content of
  * "sketches are mergeable": batch, streaming, and 1000-executor
  * partial-merge all commute to the same registers.
  *
  * State per key: ≤ 64 (bkt → max ρ) longs — constant, independent of
  * cardinality or volume; the estimate replays the batch audit's exact
  * fixed-point chain (Σ 2^(50−M) longs, two float ops at the end). */
object StreamingHll {

  private val m = 64L
  private val alpha = 0.709
  private val scale = 1125899906842624L // 2^50

  /** The engine-portable h60 hash ([[graft.operators.Dedup.h60]]),
    * replicated in JVM code for the state processor: first 15 hex chars
    * of md5("hll:" + key) as a long. */
  private[streaming] def h60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hll:$key".getBytes("UTF-8"))
    // 15 hex chars = 60 bits = top 7.5 bytes
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private[streaming] def register(key: String): (Long, Long) = {
    val h = h60(key)
    val w = h / m // exact: both nonneg longs
    val rho = if (w == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (h % m, rho)
  }

  /** The batch audit's exact estimate chain over register maxes. */
  private[streaming] def estimate(regs: Map[Long, Long]): HllEstimate = {
    var s = 0L
    regs.valuesIterator.foreach(mx => s += scale >> mx)
    s += (m - regs.size) * scale
    HllEstimate("", regs.size.toLong, m - regs.size,
      alpha * 4096.0 * 1.125899906842624e15 / s.toDouble)
  }

  def estimates(events: Dataset[HllEvent]): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new HllProcessor, TimeMode.None(), OutputMode.Append())
  }

  final class HllProcessor
      extends StatefulProcessor[String, HllEvent, HllEstimate] {

    @transient private var regs: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getMapState[Long, Long]("regs",
        Encoders.scalaLong, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HllEvent],
        timerValues: TimerValues): Iterator[HllEstimate] = {
      rows.foreach { e =>
        val (bkt, rho) = register(e.user_key)
        val cur = Option(regs.getValue(bkt)).getOrElse(0L)
        if (rho > cur) regs.updateValue(bkt, rho)
      }
      val snapshot = regs.iterator().map { case (k, v) => (k, v) }.toMap
      Iterator.single(estimate(snapshot).copy(event_type = key))
    }
  }
}
