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

  test("simhashDocs fused loop == the declarative shingle/vote pipeline") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    // the pre-r18 declarative form, reconstructed verbatim: one
    // (doc_id, sh, h) row per shingle, 60 vote sums, packed projection
    val th = graft.operators.Dedup.shingleRows(
        graft.operators.Dedup.canonicalDocs(docs))
      .withColumn("h",
        conv(substring(md5(concat(lit("sim"), lit(":"), col("sh"))), 1, 15),
          16, 10).cast("long"))
    val bits = 60 // Dedup.simhashBits
    val voteAggs = (0 until bits).map { b =>
      sum(expr(s"CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END")).as(s"v$b")
    }
    val packed = (0 until bits).map { b =>
      s"(CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    val reference = th.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
      .withColumn("simhash", expr(packed))
      .select("doc_id", "simhash")
    val fused = graft.operators.Dedup.simhashDocs(spark, dir)
    assert(rows(fused) == rows(reference))
    assert(fused.count() > 0)
  }

  test("pcaPower: single-task solve == distributed iteration, bit-exact") {
    val gated = rows(graft.operators.Similarity.pcaPower(spark, dir))
    val loop = withConf("spark.graft.pca.localSolveRows", "0") {
      rows(graft.operators.Similarity.pcaPower(spark, dir))
    }
    assert(gated == loop)
  }
}
