package graft

import graft.operators.{Dedup, Retrieval}
import org.apache.spark.sql.functions._

/** Behavioral pins for the BM25 retrieval operator. Hash-exactness vs
  * DuckDB is the oracle gate's job; here we pin the ranking semantics
  * and the scale-critical plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = Retrieval.bm25Topk(spark, dir)
    .as[(Int, Long, Long)].collect()

  test("at most k rows per query, scores positive, ranking total order") {
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.length <= 10, s"query $qid overflowed k")
      assert(rs.forall(_._3 > 0L), s"query $qid has non-positive scores")
      // returned in (score desc, doc_id asc) total order per query
      val sorted = rs.sortBy(r => (-r._3, r._2)).toSeq
      assert(rs.toSeq == sorted, s"query $qid not rank-ordered")
    }
  }

  test("every hit actually contains at least one of its query's terms") {
    val docTerms = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val q = Map(
      0 -> Set("spark", "window", "agg"),
      1 -> Set("customer", "query", "join"),
      2 -> Set("vector", "stream", "hash"),
      3 -> Set("merge", "sort", "scan", "filter"))
    rows.foreach { case (qid, docId, _) =>
      assert(docTerms(docId).exists(q(qid)),
        s"doc $docId returned for query $qid without any query term")
    }
  }

  test("a doc hit is monotone in tf: duplicating a matched doc's terms outranks it") {
    // constructed corpus: same doc length, higher tf of the query term
    // must score strictly higher (tf saturation grows monotonically)
    val docs = Seq(
      (0L, "spark alpha beta gamma delta"),
      (1L, "spark spark beta gamma delta"),
      (2L, "alpha beta gamma delta zeta"))
    val tf = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term") === "spark")
      .groupBy("doc_id").agg(count(lit(1)).as("tf"))
      .as[(Long, Long)].collect().toMap
    assert(tf(1L) > tf(0L)) // sanity on the fixture construction
  }

  test("bm25_prf: expansion terms come from the pseudo-relevant set, never the query") {
    val queryTerms = Set("spark", "window", "agg", "customer", "query", "join",
      "vector", "stream", "hash", "merge", "sort", "scan", "filter")
    val exp = Retrieval.bm25Prf(spark, dir)
      .as[(Int, String, Long, Long)].collect()
    assert(exp.nonEmpty)
    assert(exp.forall(e => !queryTerms(e._2)), "query term leaked into expansion")
    exp.groupBy(_._1).foreach { case (qid, es) =>
      assert(es.length <= 5, s"query $qid overflow")
      assert(es.toSeq == es.sortBy(e => (-e._4, e._2)).toSeq, s"query $qid order")
    }
    // every expansion term occurs in at least one of its query's top docs
    val top = rows.map(r => (r._1, r._2)).groupBy(_._1)
    val docToks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    exp.foreach { case (qid, term, tfR, _) =>
      val occurrences = top(qid).map(_._2)
        .map(d => docToks(d).count(_ == term)).sum
      assert(occurrences == tfR, s"query $qid term $term tf mismatch")
    }
  }

  test("phrase_topk: every hit is a true adjacent occurrence; longer phrase is stricter") {
    val hits = Retrieval.phraseTopk(spark, dir)
      .as[(Int, Long, Long, Long)].collect()
    assert(hits.nonEmpty)
    val phrases = Map(
      0 -> Seq("table", "hash"), 1 -> Seq("part", "filter"),
      2 -> Seq("slow", "hash", "batch"), 3 -> Seq("part", "filter", "scan"))
    val docToks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    hits.foreach { case (qid, doc, n, firstPos) =>
      val toks = docToks(doc)
      val ph = phrases(qid)
      val occ = toks.indices.filter(i =>
        i + ph.length <= toks.length && toks.slice(i, i + ph.length) == ph)
      assert(occ.length.toLong == n, s"query $qid doc $doc: $n vs ${occ.length}")
      assert(occ.headOption.map(_.toLong).contains(firstPos),
        s"query $qid doc $doc first_pos $firstPos vs ${occ.headOption}")
    }
    // "part filter scan" must be a (strict) subset of "part filter" docs,
    // with never-larger per-doc occurrence counts — the selectivity pin
    val short = hits.filter(_._1 == 1).map(h => h._2 -> h._3).toMap
    val long = hits.filter(_._1 == 3).map(h => h._2 -> h._3).toMap
    assert(long.nonEmpty, "3-word phrase found nothing at fixture scale")
    // the top-k cut can hide a doc from `short`, so only compare counts
    // where both rankings kept the doc
    long.foreach { case (d, n) =>
      short.get(d).foreach(ns =>
        assert(n <= ns, s"doc $d: extending the phrase raised its count"))
    }
  }

  test("plan: two corpus scans only, bounded-heap top-k, broadcasts, no global sort") {
    val df = Retrieval.bm25Topk(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
    def nodes(op: String): Int =
      s"""\\(\\d+\\) $op\n""".r.findAllIn(plan).length
    // the deliberate two scans (totals + tf) and NOT a third for df —
    // df is a window count over the tf set, not an aggregate branch
    assert(nodes("Scan parquet ") == 2, plan)
    // query table broadcasts; no shuffle joins anywhere
    assert(nodes("BroadcastHashJoin") >= 1, plan)
    assert(nodes("SortMergeJoin") == 0 && nodes("ShuffledHashJoin") == 0, plan)
  }
}
