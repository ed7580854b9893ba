package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Corpus.corpusDrift]] — the ingest
  * gate: every micro-batch of incoming documents has its token
  * distribution compared against the BASE corpus's (a batch-trained,
  * broadcast artifact, same train-offline/score-online split as
  * [[StreamingSeasonal]]), and terms whose 1e-6 fixed-point share moved
  * beyond `thresholdFp` are emitted with the batch they arrived in. A
  * template flood or scraper loop trips the alarm in the batch that
  * carries it, BEFORE the corpus absorbs it.
  *
  * Stateless: per-batch term counts are batch-local (flatMapGroups-free,
  * one aggregate inside the micro-batch), the base is a broadcast map
  * bounded by the vocabulary. Uses foreachBatch composition — the
  * aggregate-within-batch semantics (vs a running aggregate) is exactly
  * what "this batch drifted" means. */
object StreamingDrift {

  /** Base-side artifact: (term, share_fp) over the base corpus. */
  def baseShares(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(Dedup.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    counts.crossJoin(broadcast(counts.agg(sum("c").as("n"))))
      .select(col("term"), expr("(c * 1000000) div n").as("base_share_fp"))
  }

  /** Score ONE micro-batch of documents against the broadcast base:
    * emitted rows are (term, c_batch, batch_share_fp, base_share_fp,
    * drift_fp) for drift_fp > thresholdFp. Call from foreachBatch. */
  def scoreBatch(batchDocs: DataFrame, base: DataFrame,
      thresholdFp: Long, minCount: Long = 5L): DataFrame = {
    val counts = batchDocs
      .select(explode(Dedup.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c_batch"))
      .filter(col("c_batch") >= minCount)
    counts
      .crossJoin(broadcast(counts.agg(sum("c_batch").as("n_batch"))))
      .withColumn("batch_share_fp", expr("(c_batch * 1000000) div n_batch"))
      .join(broadcast(base), Seq("term"), "left")
      .withColumn("base_share_fp", coalesce(col("base_share_fp"), lit(0L)))
      .withColumn("drift_fp",
        abs(col("batch_share_fp") - col("base_share_fp")))
      .filter(col("drift_fp") > thresholdFp)
      .select("term", "c_batch", "batch_share_fp", "base_share_fp", "drift_fp")
  }
}
