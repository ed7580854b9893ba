package graft.streaming

import graft.operators.Analytics
import org.apache.spark.sql.DataFrame

/** Streaming twin of [[graft.operators.Analytics.seasonalAlerts]] — the
  * train-offline / score-online split: the (event_type, hour-of-day)
  * baseline is a BATCH-trained artifact (exact integer moments,
  * [[Analytics.seasonalBaseline]], refreshed on whatever cadence the
  * deployment retrains), and the stream side is a STATELESS stream-static
  * broadcast join + the division-free 3-sigma test, shared verbatim with
  * the batch query via [[Analytics.seasonalScore]] so the two scorers
  * cannot drift.
  *
  * No state store, no watermark, no output-mode constraints: every
  * micro-batch scores independently against the broadcast baseline —
  * the cheapest possible continuous detector, and the missing diurnal
  * companion to the stateful trailing-window rules in
  * [[StreamingDetectors]].
  *
  * Scale posture: the baseline is |event types| x 24 rows regardless of
  * corpus size — broadcast is free forever; the stream side is a pure
  * map stage (no exchange at all on the event stream).
  *
  * The `stream` frame needs the raw event columns
  * (event_id, event_type, ts_sec, value). */
object StreamingSeasonal {

  def alerts(stream: DataFrame, baseline: DataFrame): DataFrame =
    Analytics.seasonalScore(Analytics.seasonalPrep(stream), baseline)
}
