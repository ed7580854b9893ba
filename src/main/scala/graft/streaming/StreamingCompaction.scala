package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One changelog record for the streaming compactor — the projection of
  * the event stream [[graft.operators.Warehouse.changelogCompact]] reads
  * (`ts_ns` carries the changelog order; `event_id` breaks ties). */
final case class ChangeRecord(key: String, event_id: Long, event_type: String,
  value: Option[Double], ts_ns: Long)

/** The compactor's per-key verdict after a micro-batch: the CURRENT
  * record for the key, plus whether the key is live. A tombstoned key is
  * EMITTED with `is_live = false` (not silently dropped): a downstream
  * materializer needs the delete to retract the previous upsert — the
  * retraction half of the CDC contract. */
final case class CompactedState(key: String, event_id: Long,
  event_type: String, value: Option[Double], ts_ns: Long, is_live: Boolean)

/** Streaming twin of [[graft.operators.Warehouse.changelogCompact]]:
  * latest-wins-with-tombstones CDC compaction maintained continuously.
  * The batch operator collapses a finished changelog to current state;
  * this keeps the same state current as changelog records arrive — the
  * "materialized upsert view" a downstream store (or a Delta MERGE
  * target) consumes.
  *
  * Correctness under disorder comes from the same property that makes
  * the batch form a 1-row bounded heap: "latest" is an ASSOCIATIVE
  * max under the total order (ts_ns, event_id), so applying records in
  * any arrival order — late data included, across any micro-batch split
  * — converges to the batch answer. State per key is ONE fixed-size
  * record forever (no deques, no growth with churn); hot keys cost the
  * same bytes as cold ones. RocksDB-backed `transformWithState`;
  * optional TTL evicts keys nothing updates. */
object StreamingCompaction {

  /** The fixture vocabulary's tombstone marker (see the batch twin). */
  val tombstoneType = "error"

  def compact(changes: Dataset[ChangeRecord],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CompactedState] = {
    import changes.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    changes.groupByKey(_.key)
      .transformWithState(new CompactProcessor(ttl), timeMode, OutputMode.Append())
  }

  final class CompactProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, ChangeRecord, CompactedState] {

    @transient private var latest: ValueState[ChangeRecord] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[ChangeRecord]("latest",
        Encoders.product[ChangeRecord], ttl)

    override def handleInputRows(key: String, rows: Iterator[ChangeRecord],
        timerValues: TimerValues): Iterator[CompactedState] = {
      var cur = Option(latest.get())
      rows.foreach { r =>
        // strictly-newer wins; (ts_ns, event_id) is a total order, so a
        // replayed duplicate is a no-op and late data can never regress
        if (cur.forall(c =>
            r.ts_ns > c.ts_ns || (r.ts_ns == c.ts_ns && r.event_id > c.event_id)))
          cur = Some(r)
      }
      val c = cur.get // rows is non-empty for an invoked key
      latest.update(c)
      Iterator.single(CompactedState(key, c.event_id, c.event_type, c.value,
        c.ts_ns, c.event_type != tombstoneType))
    }
  }
}
