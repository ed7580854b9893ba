package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One dimension assertion from the upstream CDC feed: "as of change-log
  * position `seq`, customer `custkey` has these attributes". `seq` is the
  * per-key change order (a Debezium LSN / Kafka offset stand-in). */
final case class DimChange(custkey: Long, seq: Long, acctbal: Double,
  mktsegment: String)

/** One emitted SCD2 history row. `as_of` is the change-log position that
  * produced the emission — a downstream materializer keeps, per
  * (custkey, version), the row with the highest `as_of`: a later CLOSE
  * emission supersedes the OPEN emission of the same version, which is
  * exactly a latest-wins upsert ([[StreamingCompaction]]'s contract), so
  * the maintained table converges regardless of sink replay. */
final case class Scd2Version(c_custkey: Long, version: Long,
  c_acctbal: Double, c_mktsegment: String, valid_from: Long,
  valid_to: Option[Long], is_current: Boolean, as_of: Long)

/** Streaming twin of [[graft.operators.Warehouse.scd2CustomerHistory]] —
  * the APPLY CHANGES half of a warehouse: SCD Type-2 dimension history
  * maintained CONTINUOUSLY from a change feed instead of rebuilt from a
  * finished update batch. Semantics match the batch twin exactly:
  * a changed attribute closes the open version (`valid_to` = change seq)
  * and opens the next; a no-op restatement (identical attributes
  * re-asserted) is detected and leaves the history untouched.
  *
  * Ordering contract: unlike the compactor, SCD2 is inherently
  * ORDER-SENSITIVE (versions are defined by the change sequence), so the
  * operator requires the per-key feed to be seq-ordered ACROSS
  * micro-batches — the standard CDC source guarantee (a key lives in one
  * changelog partition). WITHIN a micro-batch no order is needed: rows
  * are re-sorted by `seq` before folding, so shuffle disorder inside a
  * batch cannot corrupt the history.
  *
  * Scale shape: state per key is ONE fixed-size open-version record —
  * no history accumulates in the state store (closed versions are
  * emitted and gone); a key's cost never grows with its churn. History
  * lives where it belongs, in the appended sink. RocksDB-backed
  * `transformWithState`; optional TTL evicts keys whose dimension rows
  * are retired. */
object StreamingScd2 {

  /** The open (current) version of one key — the entire per-key state. */
  final case class OpenVersion(version: Long, acctbal: Double,
    mktsegment: String, valid_from: Long)

  def applyChanges(changes: Dataset[DimChange],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Scd2Version] = {
    import changes.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    changes.groupByKey(_.custkey)
      .transformWithState(new Scd2Processor(ttl), timeMode, OutputMode.Append())
  }

  final class Scd2Processor(ttl: TTLConfig)
      extends StatefulProcessor[Long, DimChange, Scd2Version] {

    @transient private var cur: ValueState[OpenVersion] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[OpenVersion]("cur",
        Encoders.product[OpenVersion], ttl)

    override def handleInputRows(key: Long, rows: Iterator[DimChange],
        timerValues: TimerValues): Iterator[Scd2Version] = {
      val out = scala.collection.mutable.ArrayBuffer[Scd2Version]()
      var c = Option(cur.get())
      rows.toArray.sortBy(_.seq).foreach { r =>
        c match {
          case None =>
            c = Some(OpenVersion(1L, r.acctbal, r.mktsegment, r.seq))
            out += Scd2Version(key, 1L, r.acctbal, r.mktsegment, r.seq,
              None, is_current = true, as_of = r.seq)
          case Some(v) if v.acctbal == r.acctbal && v.mktsegment == r.mktsegment =>
          // no-op restatement: the batch twin's `chg` filter drops these;
          // here they fold away without an emission or a state write
          case Some(v) =>
            out += Scd2Version(key, v.version, v.acctbal, v.mktsegment,
              v.valid_from, Some(r.seq), is_current = false, as_of = r.seq)
            c = Some(OpenVersion(v.version + 1L, r.acctbal, r.mktsegment, r.seq))
            out += Scd2Version(key, v.version + 1L, r.acctbal, r.mktsegment,
              r.seq, None, is_current = true, as_of = r.seq)
        }
      }
      c.foreach(cur.update)
      out.iterator
    }
  }
}
