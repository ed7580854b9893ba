package graft

import org.apache.spark.sql.DataFrame

/** The r18 size-gated single-task solves (PageRank, PCA power) must be
  * OUTPUT-IDENTICAL to the distributed loops they shortcut — same
  * contract CorpusSpec pins for the connected-components gate. Each test
  * runs the same query with the gate disabled (conf = 0) and enabled and
  * compares the full row sets exactly (the PCA row is all-double; its
  * local solve is bit-exact by construction — fixed-point long sums
  * inter-row, ascending-index IEEE folds within-row — so == is the
  * right comparison, not a tolerance). */
class GateParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("typeMarkovRank: single-task solve == distributed loop") {
    val gated = rows(graft.operators.Graph.typeMarkovRank(spark, dir))
    val loop = withConf("spark.graft.pagerank.localSolveRows", "0") {
      rows(graft.operators.Graph.typeMarkovRank(spark, dir))
    }
    assert(gated == loop)
  }

  test("hostFrontierRank: single-task solve == distributed loop") {
    val gated = rows(graft.operators.Crawl.hostFrontierRank(spark, dir))
    val loop = withConf("spark.graft.pagerank.localSolveRows", "0") {
      rows(graft.operators.Crawl.hostFrontierRank(spark, dir))
    }
    assert(gated == loop)
  }

  test("pcaPower: single-task solve == distributed iteration, bit-exact") {
    val gated = rows(graft.operators.Similarity.pcaPower(spark, dir))
    val loop = withConf("spark.graft.pca.localSolveRows", "0") {
      rows(graft.operators.Similarity.pcaPower(spark, dir))
    }
    assert(gated == loop)
  }
}
