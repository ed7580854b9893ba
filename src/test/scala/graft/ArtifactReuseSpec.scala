package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Pins the trained-artifact persistence contract (VERDICT r9 item 7):
  * one session trains and saves the ANN artifacts (IVF centroids + PQ
  * codebooks); a COLD JVM (simulated by clearing every in-JVM training
  * cache) with `spark.graft.ann.artifactDir` set must answer the IVF
  * family identically WITHOUT running a single training job. Also pins
  * the fallback: with the conf unset, the cleared caches retrain and
  * still produce the same results (parquet round-trips doubles exactly,
  * and training is a pure function of the fixture dir).
  */
class ArtifactReuseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("cold-JVM artifact reuse: identical results, zero training runs") {
    val art = java.nio.file.Files.createTempDirectory("annart").toString
    // warm path: train in-JVM, record results, persist the artifacts
    val ivfTrained = rows(Similarity.annIvfTopk(spark, dir))
    val pqTrained = rows(Similarity.annIvfPqTopk(spark, dir))
    val rrTrained = rows(Similarity.annIvfPqRerank(spark, dir))
    Similarity.saveIndexArtifacts(spark, dir, art)
    assert(ivfTrained.nonEmpty && pqTrained.nonEmpty && rrTrained.nonEmpty)

    // cold JVM: caches emptied, artifact dir wired in
    Similarity.clearTrainingCaches()
    spark.conf.set("spark.graft.ann.artifactDir", art)
    try {
      val before = Similarity.trainingRuns.get()
      assert(rows(Similarity.annIvfTopk(spark, dir)) == ivfTrained)
      assert(rows(Similarity.annIvfPqTopk(spark, dir)) == pqTrained)
      assert(rows(Similarity.annIvfPqRerank(spark, dir)) == rrTrained)
      assert(Similarity.trainingRuns.get() == before,
        "artifact-backed session must not retrain")
    } finally spark.conf.unset("spark.graft.ann.artifactDir")

    // fallback: cleared caches + no artifact conf -> retrains, same
    // results (training is deterministic in the fixture dir)
    Similarity.clearTrainingCaches()
    val before = Similarity.trainingRuns.get()
    assert(rows(Similarity.annIvfTopk(spark, dir)) == ivfTrained)
    assert(Similarity.trainingRuns.get() > before,
      "without artifacts the engine must fall back to training")
  }

  test("missing artifact path falls back to training instead of failing") {
    val empty = java.nio.file.Files.createTempDirectory("annartempty").toString
    Similarity.clearTrainingCaches()
    spark.conf.set("spark.graft.ann.artifactDir", empty)
    try {
      assert(Similarity.annIvfTopk(spark, dir).count() > 0)
    } finally spark.conf.unset("spark.graft.ann.artifactDir")
  }
}
