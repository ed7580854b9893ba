package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Idempotent alert delivery — closes the reference's exactly-once delta.
  *
  * The reference checkpoints state exactly-once but publishes alerts to
  * Kafka at-least-once (StreamSentinelJob.java:156): after a crash between
  * a successful publish and the next checkpoint, the replayed batch sends
  * the same alerts again. Spark's Kafka sink has the same contract. The
  * reference itself defines alert IDENTITY as (ruleName, key, timestamp)
  * (Alert.java:191-200 equals/hashCode), which is what makes the gap
  * closable: delivery can be made idempotent by (a) deduping each batch on
  * that identity and (b) refusing to re-deliver a batch that was already
  * delivered under the same micro-batch id.
  *
  * Protocol per (batch, batchId):
  *   1. ledger hit? (`<ledger>/<batchId>` exists) -> skip: this batch was
  *      fully delivered by a previous incarnation of the query and Spark
  *      is replaying it only because it died before writing its OWN commit
  *      log entry — the exact window that produces duplicates in a naive
  *      sink.
  *   2. dedup the batch on the reference's alert identity, keeping the
  *      lowest event_id per identity (deterministic, order-independent).
  *   3. `deliver` the deduped frame (Kafka producer / parquet append /
  *      anything).
  *   4. atomically create the ledger marker (create-no-overwrite).
  *
  * A crash between 3 and 4 re-delivers once — that residual window is
  * closable only by a transactional target (Kafka transactions, Delta);
  * on every Spark-side replay path (crash between 4 and Spark's commit,
  * the common case) delivery is exactly-once. The ledger lives under the
  * query's checkpoint location, so deleting the checkpoint resets both
  * together; markers are O(1) bytes per micro-batch, same growth rate as
  * Spark's own commit log. Identity dedup runs distributed (hash agg on
  * the identity key) — no driver materialization of the batch.
  */
object AlertSink {

  /** Reference alert identity — Alert.java:191-200. */
  private val identityCols = Seq("rule_name", "key", "ts_sec")

  /** Batch-level dedup on alert identity: one row per (rule_name, key,
    * ts_sec), the one with the smallest event_id (min_by collapses
    * map-side; no window, no sort). Schema is preserved. */
  def dedupIdentity(batch: DataFrame): DataFrame = {
    val others = batch.columns.filterNot(identityCols.contains)
    batch.groupBy(identityCols.map(col): _*)
      .agg(min_by(struct(others.map(col): _*), col("event_id")).as("r"))
      .select(batch.columns.map(c =>
        if (identityCols.contains(c)) col(c) else col(s"r.$c")): _*)
  }

  /** Wrap `deliver` in the idempotence protocol above. The returned
    * function is what `foreachBatch` runs. */
  def idempotent(ledgerDir: String, deliver: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    BatchLedger.once(ledgerDir, batch, batchId) {
      deliver(dedupIdentity(batch), batchId)
    }
  }

  /** Start an exactly-once alert delivery query: alerts (the typed frame
    * from [[StreamingDetectors.alerts]]) -> identity dedup -> `deliver`,
    * checkpointed at `checkpointDir` with the delivery ledger beside the
    * offset log. */
  def startExactlyOnce(alerts: DataFrame, checkpointDir: String,
      triggerMs: Long, deliver: (DataFrame, Long) => Unit): StreamingQuery =
    alerts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(idempotent(s"$checkpointDir/_graft_delivery_ledger", deliver))
      .start()
}

/** The marker half of the AlertSink protocol, reusable by any
  * `foreachBatch` body with side effects (alert delivery, base-table
  * growth): run `body` only if `<ledgerDir>/<batchId>` does not exist,
  * then atomically create it (create-no-overwrite). A crash between
  * `body` and the marker re-runs the body once on replay — the residual
  * window only a transactional target closes; every Spark-side replay
  * after the marker (crash before Spark's own commit-log write, the
  * common case) is skipped. */
object BatchLedger {
  def once(ledgerDir: String, batch: DataFrame, batchId: Long)(body: => Unit): Unit = {
    val fs = new Path(ledgerDir).getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    val marker = new Path(ledgerDir, batchId.toString)
    if (!fs.exists(marker)) {
      body
      fs.mkdirs(new Path(ledgerDir))
      fs.create(marker, false).close()
    }
  }
}
