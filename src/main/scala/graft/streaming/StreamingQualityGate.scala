package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.TextAnalysis.lmPerplexity]] — the
  * fluency gate on the INGEST path: the bigram LM trains OFFLINE on the
  * base corpus (same train-offline/score-online split as
  * [[StreamingDrift]] / [[StreamingSeasonal]]), its per-bigram-type
  * surprisal table becomes a broadcast artifact, and every micro-batch
  * of incoming documents is scored and gated against a bits-per-bigram
  * ceiling before it can enter the corpus. Word salad scores high
  * surprisal in the batch that carries it.
  *
  * Out-of-vocabulary backoff mirrors the model's own smoothing: a seen
  * w1 with an unseen w2 costs the add-½ floor for that context
  * (num = 1, den = 2·c1 + V); an unseen w1 costs ceil(log2 V) — the
  * uniform-over-vocabulary surprisal. Both come from the SAME integer
  * shift formula as the batch operator, so scoring a document the model
  * trained on reproduces the batch bits EXACTLY (pinned by spec).
  *
  * Stateless per batch: the model is bounded by the base bigram-type
  * vocabulary and broadcast; per-batch work is one explode + two
  * broadcast joins + a doc-key aggregate inside the micro-batch. At
  * 100 TB vocabulary the broadcast side would become a term-keyed
  * shuffle join or a top-V pruned model — the shape swap is local to
  * [[scoreBatch]]. */
object StreamingQualityGate {

  /** ceil(−log2(num/den)) for 1 ≤ num ≤ den, the engine-portable shift
    * formula (no left shift — overflow-free at any scale). */
  private def bits(num: Column, den: Column): Column = {
    val sft = (length(bin(den)) - length(bin(num))).cast("int")
    when(num > call_function("shiftright", den - 1, sft), sft.cast("long"))
      .otherwise(sft.cast("long") + 1L)
  }

  /** (doc_id, w1, w2) bigram rows — the same slice/zip extraction as the
    * batch operator. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Batch-side training: the per-bigram-type surprisal artifact
    * (w1, w2, bits) plus the per-context OOV floor (w1, oov_bits).
    * Persist or `localCheckpoint` the results; both broadcast at score
    * time. */
  def lmArtifacts(baseDocs: DataFrame): (DataFrame, DataFrame) = {
    val b = bigrams(baseDocs)
    val bc = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bc.groupBy("w1").agg(sum("c12").as("c1"))
    val vv = b.agg(countDistinct(col("w2")).as("v"))
    val model = bc.join(c1, "w1").crossJoin(broadcast(vv))
      .select(col("w1"), col("w2"),
        bits(col("c12") * 2L + 1L, col("c1") * 2L + col("v")).as("bits"))
    val fallback = c1.crossJoin(broadcast(vv))
      .select(col("w1"), bits(lit(1L), col("c1") * 2L + col("v")).as("oov_bits"))
    (model, fallback)
  }

  /** The unseen-context surprisal: ceil(log2 V) — uniform over the
    * vocabulary. One bounded driver value, computed once at train
    * time. */
  def oovBits(baseDocs: DataFrame): Long = {
    val v = bigrams(baseDocs).agg(countDistinct(col("w2"))).collect()(0).getLong(0)
    64L - java.lang.Long.numberOfLeadingZeros(math.max(v - 1, 1)) // ceil(log2 v)
  }

  /** Score ONE micro-batch against the broadcast artifacts: emits
    * (doc_id, n_bigrams, total_bits, bits_per_bigram, pass) where pass
    * is the bits-per-bigram ceiling test, integer cross-multiplied
    * (total_bits ≤ maxBitsFp · n / 1e6 avoided — the compare is
    * `total_bits * 1e6 <= maxBitsFp * n`). Call from foreachBatch. */
  def scoreBatch(batchDocs: DataFrame, model: DataFrame, fallback: DataFrame,
      oov: Long, maxBitsFp: Long): DataFrame =
    bigrams(batchDocs)
      .join(broadcast(model), Seq("w1", "w2"), "left")
      .join(broadcast(fallback), Seq("w1"), "left")
      .withColumn("b",
        coalesce(col("bits"), col("oov_bits"), lit(oov)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("b").as("total_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        (col("total_bits").cast("double") / col("n_bigrams")).as("bits_per_bigram"),
        (col("total_bits") * 1000000L <= lit(maxBitsFp) * col("n_bigrams"))
          .as("pass"))
}
