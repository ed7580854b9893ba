package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermark-bounded stream-stream joins — the streaming twin of the
  * batch as-of/attribution joins in [[graft.operators.Analytics]].
  *
  * Scale design: a stream-stream inner join keeps BOTH sides in the state
  * store until the watermark plus the join interval passes — the interval
  * bound below is what makes state finite (an unconstrained stream-stream
  * equi-join would buffer both streams forever). With the time bound,
  * each side's state holds at most (watermark delay + attribution window)
  * of data per key, evicted continuously as the watermark advances; the
  * join key is hash-partitioned exactly like a batch shuffle join, so the
  * operator scales horizontally with executors.
  */
object StreamingJoins {

  /** Click attribution: each click joins the impression for the same ad
    * that happened at most `windowSec` seconds BEFORE it. Both sides
    * watermarked by `delay`; the two-sided time bound lets Spark evict
    * impression state once `imp_ts + windowSec` is older than the click
    * watermark, and click state symmetrically. */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      delay: String = "10 seconds", windowSec: Int = 30): DataFrame = {
    val i = impressions.withWatermark("imp_ts", delay)
    val c = clicks.withWatermark("click_ts", delay)
    i.join(c, expr(
      s"""ad_id = click_ad_id AND
         |click_ts >= imp_ts AND
         |click_ts <= imp_ts + INTERVAL $windowSec SECONDS""".stripMargin))
  }
}
