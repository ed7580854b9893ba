package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Current top-k row per key (rank 1..k by value desc, event_id asc) —
  * one snapshot row per rank, re-emitted whenever the key's top-k set
  * changes. A consumer keeps the latest snapshot per (key, rank). */
final case class TopKRow(key: String, rank: Int, event_id: Long, value: Double)

/** Streaming twin of the batch bounded-heap operator
  * ([[graft.plans.TopKPerKey]]): continuously maintained per-key top-k
  * via `transformWithState`.
  *
  * Scale posture mirrors the batch operator's: per-key state is EXACTLY
  * k (value, id) pairs — not the key's history — so state size is
  * `keys x k` whatever the stream volume, and a hot key costs the same
  * state as a cold one (the stream analog of the batch partial stage's
  * k-row cap). Keys hash-partition across executors via groupByKey;
  * RocksDB-backed state + optional idle-key TTL, exactly like
  * [[StreamingDetectors.alertsTws]].
  *
  * Emission contract: Append-mode snapshots. A batch that changes a
  * key's top-k set emits the FULL refreshed top-k for that key (<= k
  * rows, re-ranked); an unchanged key emits nothing. Deterministic:
  * intra-batch arrival order cannot affect the merged result because
  * the merge is order-insensitive (sort over the union).
  */
object StreamingTopK {

  /** Bounded per-key state: the current top-k, best-first. */
  final case class TopKState(items: Seq[(Double, Long)])

  def topK(events: Dataset[SEvent], k: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.key)
      .transformWithState(new TopKProcessor(k, ttl), timeMode,
        OutputMode.Append())
  }

  final class TopKProcessor(k: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, SEvent, TopKRow] {

    @transient private var state: ValueState[TopKState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState]("topk",
        Encoders.product[TopKState], ttl)

    override def handleInputRows(key: String, rows: Iterator[SEvent],
        timerValues: TimerValues): Iterator[TopKRow] = {
      val cur = Option(state.get()).map(_.items).getOrElse(Seq.empty)
      // events without the measured field are skipped, like the batch
      // query's value-not-null gate
      val incoming = rows.flatMap(e =>
        e.fields.get("value").map(v => (v, e.eventId))).toSeq
      if (incoming.isEmpty) Iterator.empty
      else {
        val merged = (cur ++ incoming)
          .sortBy { case (v, id) => (-v, id) }.take(k)
        if (merged == cur) Iterator.empty
        else {
          state.update(TopKState(merged))
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            TopKRow(key, i + 1, id, v)
          }
        }
      }
    }
  }
}
