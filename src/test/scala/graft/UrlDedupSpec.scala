package graft

import graft.operators.{Corpus, Multimodal}
import org.apache.spark.sql.functions._

/** Pins the URL-canonicalization channel: every normalization rule is
  * load-bearing (each decorated raw form maps to the exact canonical
  * string, and forms differing in a MEANINGFUL component stay apart),
  * the fixture groups are exactly the derived page triples, and
  * crossmodal clustering merges a pair no content channel connects —
  * the URL-only merge the third channel exists for. */
class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Corpus.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("each normalization rule maps its decorated form to the same canonical") {
    val want = "http://example.com/page/7?b=2&id=7"
    val got = canon(
      "http://example.com/page/7?b=2&id=7",              // already canonical
      "HTTP://example.com/page/7?b=2&id=7",              // scheme case
      "http://EXAMPLE.COM/page/7?b=2&id=7",              // host case
      "http://www.example.com/page/7?b=2&id=7",          // www strip
      "http://example.com:80/page/7?b=2&id=7",           // default port
      "http://example.com/page/7/?b=2&id=7",             // trailing slash
      "http://example.com/page/7?b=2&id=7#sec",          // fragment
      "http://example.com/page/7?id=7&b=2",              // param order
      "http://example.com/page/7?b=2&utm_source=x&id=7", // utm strip
      "http://example.com/page/7?fbclid=abc&b=2&id=7",   // fbclid strip
      "http://example.com/page/7?b=2&id=7&gclid=z9")     // gclid strip
    got.foreach(c => assert(c == want, s"got $c"))
    // meaningful differences must SURVIVE normalization
    val distinct = canon(
      "https://example.com/page/7?b=2&id=7",       // scheme is semantic
      "http://example.com:8080/page/7?b=2&id=7",   // non-default port
      "http://example.com/Page/7?b=2&id=7",        // path case is semantic
      "http://example.com/page/7?b=3&id=7",        // param value
      "http://example.com/page/7?id=7",             // param set
      "http://sub.example.com/page/7?b=2&id=7")    // different host
    assert((distinct :+ want).distinct.size == distinct.size + 1)
    // https default port strips; empty query drops the '?'
    assert(canon("HTTPS://www.example.com:443/x/?utm_source=a#f") ==
      Seq("https://example.com/x"))
  }

  test("fixture groups are exactly the page triples, keeper = min doc_id") {
    val rows = Corpus.urlDedup(spark, dir)
      .select("doc_id", "keeper", "n_docs").as[(Long, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (doc, keeper, n) =>
      assert(doc % 20 < 3, s"doc $doc is not a triple member")
      val pid = doc / 20
      assert(keeper == pid * 20, s"doc $doc keeper $keeper")
      // full triples of 3 except possibly the corpus tail
      assert(n == 3L || (n == 2L && pid == rows.map(_._1).max / 20))
    }
    // the 85% with unique decorated urls must NOT appear
    assert(rows.map(_._1).toSet ==
      (0L until 500L).filter(_ % 20 < 3).toSet)
  }

  test("host profile: doc counts conserve, dup docs == the dedup channel's rows") {
    val prof = Corpus.urlHostProfile(spark, dir)
      .select("host", "n_docs", "n_pages", "n_dup_docs", "dup_share_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    // every doc lands in exactly one (host, lang) cell
    assert(prof.map(_._2).sum == 500L)
    // the dup population IS url_dedup's row set, partitioned by host
    assert(prof.map(_._4).sum == Corpus.urlDedup(spark, dir).count())
    // the unique-URL host never dedups; the page host always has some
    val byHost = prof.groupBy(_._1)
    assert(byHost("news.example.com").forall(_._4 == 0L))
    assert(byHost("example.com").map(_._4).sum > 0L)
    // ppm share is the exact floor division per cell
    prof.foreach { case (_, n, _, d, ppm) => assert(ppm == d * 1000000L / n) }
  }

  test("channel overlap: counts conserve; each marginal matches its source channel") {
    val rows = Corpus.dedupChannelOverlap(spark, dir)
      .select("in_text", "in_phash", "in_url", "n_docs")
      .as[(Int, Int, Int, Long)].collect()
    assert(rows.map(_._4).sum == 500L, "cells must conserve to the corpus")
    // the url marginal is exactly url_dedup's doc population
    assert(rows.filter(_._3 == 1).map(_._4).sum ==
      Corpus.urlDedup(spark, dir).count())
    // the phash marginal is exactly the distinct pair-member population
    val ph = Multimodal.phashDedup(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(rows.filter(_._2 == 1).map(_._4).sum == ph.size.toLong)
    // at least one doc is caught by NO channel and one by some channel
    assert(rows.exists(r => r._1 == 0 && r._2 == 0 && r._3 == 0 && r._4 > 0))
    assert(rows.exists(r => r._1 + r._2 + r._3 > 0 && r._4 > 0))
  }

  test("crossmodal clusters merge a pair connected by NO content channel") {
    // text-cluster members (non-singleton) and phash-pair members
    val textDup = Corpus.dedupClusters(spark, dir)
      .groupBy("cluster_id").agg(count(lit(1)).as("n"),
        collect_list("doc_id").as("ds"))
      .filter(col("n") > 1).select(explode(col("ds")).as("doc_id"))
      .as[Long].collect().toSet
    val phashDup = Multimodal.phashDedup(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    val content = textDup ++ phashDup
    // first full triple with no member in any content channel
    val pid = (0L to 24L).find(p =>
      !content(20 * p) && !content(20 * p + 1) && !content(20 * p + 2))
      .getOrElse(fail("no content-clean triple among the 25 pages"))
    val cm = Corpus.crossmodalClusters(spark, dir)
      .filter(col("doc_id").isin(20 * pid, 20 * pid + 1, 20 * pid + 2))
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(cm.length == 3)
    assert(cm.map(_._2).distinct.length == 1,
      "the URL triple must land in ONE crossmodal cluster")
    assert(cm.head._2 == 20 * pid, "component min is the triple keeper")
    assert(cm.forall(_._3 >= 3L))
  }
}
