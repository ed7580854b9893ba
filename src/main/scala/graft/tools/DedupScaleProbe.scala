package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only ADVERSARIAL scale probe for the sketch-dedup and ANN families
  * (round-7 evidence; results recorded in SCALE_NOTES.md). Two derived
  * corpora are written under /tmp and probed against the base dir:
  *
  *  - `x<M>` — M salted copies of the corpus. Every token of copy i gets a
  *    copy-specific prefix (`zq<i>`), a BIJECTIVE map on token sequences:
  *    within a copy the whole shingle/jaccard/simhash structure of the
  *    original corpus is preserved, while ANY cross-copy 3-shingle overlap
  *    is impossible (every shingle contains salted tokens). The dedup
  *    output therefore grows EXACTLY M-fold — a clean linear-scaling
  *    yardstick with none of the quadratic output growth true duplication
  *    would cause. Embeddings are copied with remapped vec_ids (queries
  *    `vec_id < 10` and IVF seeds 100..107 live in copy 0 only).
  *
  *  - `hot` — the base corpus plus `hotN` near-identical variants of one
  *    long template (distinct tail token per variant: NOT exact dups, so
  *    they survive canonicalization and flood the simhash index with
  *    identical/near-identical signatures — the templated-crawl pathology
  *    from VERDICT r6). The probe times `dedup_simhash` and prints the
  *    pair count: with the distinct-signature candidate join the bucket
  *    work is output-sized, where the old per-document join did
  *    O(hotN²) candidate comparisons per chunk table.
  *
  * Usage: runMain graft.tools.DedupScaleProbe [baseDir] [mult] [hotN]
  */
object DedupScaleProbe {

  private def salted(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      docs
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L))
        .withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"zq$i$$1"))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val hotN = if (args.length > 2) args(2).toInt else 2000
    val out = "/tmp/graft_dedup_probe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.sources.Sessions
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val xDir = s"$out/x$mult"
    salted(docs, mult).write.mode(SaveMode.Overwrite)
      .parquet(s"$xDir/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until mult).map(i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$xDir/embeddings.parquet")

    // hot corpus: base + hotN near-identical variants of the longest doc
    val template = docs.orderBy(length(col("text")).desc, col("doc_id"))
      .select("text").as[String].head()
    val hotDir = s"$out/hot"
    val variants = spark.range(hotN)
      .select((col("id") + 2000000000L).as("doc_id"),
        concat(lit(template), lit(" uniquetail"), col("id")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val docCols = docs.columns
    docs.unionByName(
        variants.select(docCols.filter(variants.columns.contains).map(col): _*),
        allowMissingColumns = true)
      .write.mode(SaveMode.Overwrite).parquet(s"$hotDir/documents.parquet")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, dir: String): Double = {
      val t = time(graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      t
    }

    val family = Seq("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_clusters", "dedup_canonical", "chunk_dedup",
      "corpus_decontaminate", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_multiprobe")
    family.foreach { n =>
      val a = run(n, base)
      val b = run(n, xDir)
      println(f"PROBE x$mult%-3d $n%-24s base=$a%8.2fs x$mult=$b%8.2fs ratio=${b / a}%6.2fx")
    }

    // adversarial hot-signature flood: time + output size
    val tHot = time {
      val n = graft.operators.Dedup.simhashPairs(spark, hotDir).count()
      println(s"PROBE hot dedup_simhash pairs=$n (expect ~ hotN^2/2 = ${hotN.toLong * (hotN - 1) / 2} + base pairs)")
    }
    println(f"PROBE hot dedup_simhash $hotN%d near-identical variants: $tHot%8.2fs")
    spark.stop()
  }
}
