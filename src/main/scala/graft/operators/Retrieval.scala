package graft.operators

import graft.plans.TopKPerKey
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the `documents` corpus — the ranking half of
  * a training-data pipeline's "find documents like / about X" loop
  * (eval-set curation, targeted domain boosting, decontamination triage
  * all start from a term query against the corpus).
  *
  * Scoring is the BM25 family (Robertson et al., TREC-3) with one
  * cross-engine-exactness substitution: the idf factor is the RATIONAL
  * odds `(N - df + 0.5) / (df + 0.5)` rather than its logarithm. `ln`
  * is a transcendental with no bit-level agreement guarantee between
  * libm implementations (the same reason `token_rarity` uses
  * floor-log2 via `bin()`), while the odds form is pure IEEE +,*,/ —
  * bit-identical in any engine given the same expression tree. The
  * ranking is the idf-steepened BM25 ordering; the tf saturation and
  * length normalization are standard (k1 = 1.2, b = 0.75).
  *
  * Determinism contract: every per-(doc, term) score is computed by the
  * SAME arithmetic tree in Spark and DuckDB (division and multiply are
  * correctly rounded by IEEE 754, so equal trees give equal bits), then
  * quantized to 1e-6 fixed-point BIGINT. Only the LONGS are summed
  * across terms — float summation order never matters.
  *
  * Scale shape (the 100 TB posture):
  *  - Two column-pruned scans of `documents`, both local map work: one
  *    for corpus totals (collapses map-side to one row per partition),
  *    one exploding tokens with the query-term filter applied BEFORE
  *    the (doc_id, term) aggregate — only rows matching query terms
  *    ever reach an exchange, everything else dies in the scan stage.
  *    (Same deliberate two-scan tradeoff as
  *    [[TextAnalysis.tokenRarity]]: sharing one explode would force
  *    every token row through the wire.)
  *  - The doc length rides the explode as a carried column, so no
  *    doc-level join is needed to length-normalize.
  *  - df is a window count over the already-tiny tf set (one exchange of
  *    query-term matches — see the in-code note on why a second
  *    aggregate branch would force a third corpus scan); the query
  *    table and the corpus totals broadcast.
  *  - Final ranking is the native bounded-heap [[TopKPerKey]]: each
  *    task emits at most k rows per query_id before the exchange, so a
  *    query matching half the corpus crosses the wire as k x tasks
  *    rows, not as its full posting list.
  */
object Retrieval {

  private val k = 10

  /** The fixed query workload: (query_id, term). Terms are free-text —
    * anything [[Dedup.tokens]] can emit; unknown terms simply match
    * nothing (df = 0 rows never reach scoring). */
  private val queryTerms: Seq[(Int, String)] = Seq(
    0 -> "spark", 0 -> "window", 0 -> "agg",
    1 -> "customer", 1 -> "query", 1 -> "join",
    2 -> "vector", 2 -> "stream", 2 -> "hash",
    3 -> "merge", 3 -> "sort", 3 -> "scan", 3 -> "filter")

  private val distinctTerms: Seq[String] = queryTerms.map(_._2).distinct

  /** BM25 top-k documents per query. Output: (query_id, doc_id,
    * score_fp) where score_fp is the 1e-6 fixed-point BM25 score. */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))

    // corpus totals: 1 row, broadcast into the scoring stage
    val tot = docs.agg(
      count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("total_tokens"))

    // (doc_id, dl, term, tf) for query terms only — the isin filter runs
    // inside the scan stage, before any exchange
    val tf = docs
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    // document frequency as a WINDOW count over the tf rows, not a
    // second aggregate branch: a `tf.groupBy(term)` leg gets column-
    // pruned into a non-canonically-equal subtree, so exchange reuse
    // cannot fire and the corpus would be scanned+exploded a third time
    // (observed in the executed plan). The window costs one exchange of
    // the tiny query-term-matched set instead of a corpus scan.
    val wdf = Window.partitionBy("term")
    val tfd = tf.withColumn("df", count(lit(1)).over(wdf))
    val q = queryTerms.toDF("query_id", "term")

    // the per-(doc, term) score tree — mirrored token-for-token in
    // bm25TopkSql; see the determinism contract above
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val avgdl = col("total_tokens").cast("double") / col("n_docs").cast("double")
    val den = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))
    val sFp = floor(idf * ((col("tf").cast("double") * lit(2.2)) / den) *
      lit(1000000.0) + lit(0.5)).cast("long")

    val scored = tfd
      .join(broadcast(q), "term")
      .crossJoin(broadcast(tot))
      .withColumn("s_fp", sFp)
      .groupBy("query_id", "doc_id").agg(sum("s_fp").as("score_fp"))

    TopKPerKey.topK(scored, Seq(col("query_id")),
      Seq(col("score_fp").desc, col("doc_id").asc), k)
      .select("query_id", "doc_id", "score_fp")
  }

  val bm25TopkSql: String = {
    val qVals = queryTerms.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val inList = distinctTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${Dedup.tokensSql("text")} AS toks FROM documents),
       |tot AS (SELECT count(*) AS n_docs,
       |  CAST(sum(len(toks)) AS BIGINT) AS total_tokens FROM t),
       |d AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
       |q(query_id, term) AS (VALUES $qVals),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM d
       |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |s AS (SELECT q.query_id, tf.doc_id,
       |  CAST(floor(
       |    ((CAST(tot.n_docs - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
       |    * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |        + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE)
       |          / (CAST(tot.total_tokens AS DOUBLE) / CAST(tot.n_docs AS DOUBLE))))))
       |    * 1000000.0 + 0.5) AS BIGINT) AS s_fp
       |  FROM tf JOIN df USING (term) JOIN q USING (term) CROSS JOIN tot),
       |a AS (SELECT query_id, doc_id,
       |  CAST(sum(s_fp) AS BIGINT) AS score_fp FROM s GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY score_fp DESC, doc_id) AS rn FROM a)
       |SELECT query_id, doc_id, score_fp FROM r WHERE rn <= $k""".stripMargin
  }

  /** [[bm25TopkSql]]'s CTE chain with its final SELECT stripped, reused
    * as the shared prefix by the PRF / RRF / MMR oracles. Fails loudly
    * (at object init, i.e. in every spec run) if the strip pattern no
    * longer matches — a silent no-op here would emit syntactically
    * invalid oracle SQL with no compile-time signal. */
  private lazy val bm25CtePrefix: String = {
    val stripped = bm25TopkSql.replaceFirst(
      "(?s)SELECT query_id, doc_id, score_fp FROM r WHERE rn <= \\d+$", "")
    require(stripped != bm25TopkSql,
      "bm25TopkSql's final SELECT changed — update bm25CtePrefix's strip pattern")
    stripped.stripSuffix("\n")
  }

  // ---- pseudo-relevance feedback -----------------------------------------

  private val prfK = 5

  /** Query EXPANSION by pseudo-relevance feedback (Rocchio/RM-style):
    * take each query's BM25 top-k as the pseudo-relevant set, mine the
    * terms that characterize it — ranked by (tf within the set) x (the
    * same rational-odds idf, quantized to a 1e-6 fixed-point LONG so the
    * product is exact integer math) — and emit the top-5 non-query terms
    * per query. The output IS the expanded query a second retrieval pass
    * runs with; feeding it back through [[bm25Topk]]'s machinery is the
    * classic two-pass RM3 loop.
    *
    * Scale shape: the pseudo-relevant doc set is k x |queries| rows —
    * broadcast against one scan+explode of the corpus (the doc_id
    * semi-filter runs scan-side); document frequency needs the one
    * vocabulary-keyed aggregate (map-combinable, key space = vocab);
    * final ranking is the bounded heap. Nothing quadratic, no sorts. */
  def bm25Prf(spark: SparkSession, dir: String): DataFrame = {
    val topDocs = bm25Topk(spark, dir).select("query_id", "doc_id")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val toks = docs.select(col("doc_id"), explode(col("toks")).as("term"))
    // corpus-wide document frequency + corpus size for the idf weight
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfAll = toks.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    // tf of every term inside each query's pseudo-relevant set
    val tfR = toks.join(broadcast(topDocs), "doc_id")
      .groupBy("query_id", "term").agg(count(lit(1)).as("tf_r"))
    val wFp = floor(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) * lit(1000000.0) + lit(0.5)).cast("long")
    val scored = tfR
      .filter(!col("term").isin(distinctTerms: _*))
      .join(dfAll, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("w_fp", col("tf_r") * wFp)
      .select("query_id", "term", "tf_r", "w_fp")
    TopKPerKey.topK(scored, Seq(col("query_id")),
      Seq(col("w_fp").desc, col("term").asc), prfK)
      .select("query_id", "term", "tf_r", "w_fp")
  }

  val bm25PrfSql: String = {
    val inList = distinctTerms.map(t => s"'$t'").mkString(", ")
    // the bm25TopkSql chain, re-used verbatim up to its ranked CTE `r`
    val base = bm25CtePrefix
    s"""$base,
       |top AS (SELECT query_id, doc_id FROM r WHERE rn <= $k),
       |tk AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |nd AS (SELECT count(*) AS n_docs FROM t),
       |dfall AS (
       |  SELECT term, count(*) AS df
       |  FROM (SELECT DISTINCT doc_id, term FROM tk) GROUP BY 1
       |), tfr AS (
       |  SELECT top.query_id, tk.term, count(*) AS tf_r
       |  FROM tk JOIN top USING (doc_id) GROUP BY 1, 2
       |), sc AS (
       |  SELECT tfr.query_id, tfr.term, tfr.tf_r,
       |    tfr.tf_r * CAST(floor(
       |      ((CAST(nd.n_docs - dfall.df AS DOUBLE) + 0.5)
       |        / (CAST(dfall.df AS DOUBLE) + 0.5)) * 1000000.0 + 0.5) AS BIGINT)
       |      AS w_fp
       |  FROM tfr JOIN dfall USING (term) CROSS JOIN nd
       |  WHERE tfr.term NOT IN ($inList)
       |), pr AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY w_fp DESC, term) AS prn FROM sc
       |)
       |SELECT query_id, term, tf_r, w_fp FROM pr WHERE prn <= $prfK""".stripMargin
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009)
    * — the two-leg production search: the LEXICAL leg is [[bm25Topk]];
    * the SEMANTIC leg embeds each query's best lexical hit (the
    * "more-like-this" pivot — doc_id and vec_id share one id space in
    * the fixtures, as in any corpus whose embeddings are derived from
    * its documents) and ranks the corpus by cosine around it. RRF then
    * fuses by rank alone — score scales of BM25 fixed-point and cosine
    * never meet, which is the whole reason RRF is the default fusion —
    * as Σ 1e9 div (60 + rank): INTEGER division of integer ranks, so
    * the fusion is bit-exact cross-engine with zero float ops.
    *
    * Scale shape: the lexical leg is bm25's (posting-list agg + bounded
    * heap); the seed set is |queries| rows broadcast; the semantic leg
    * here is ONE broadcast-NLJ pass over the vectors through the heap
    * (the audit-exact form — at index scale the same leg runs through
    * the trained IVF index like [[Similarity.knnGraph]]); the fusion
    * touches 2k rows per query. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val lexRanked = bm25Topk(spark, dir)
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score_fp").desc, col("doc_id"))))
      .select("query_id", "doc_id", "rank")
    val seeds = lexRanked.filter(col("rank") === 1)
      .select(col("query_id"), col("doc_id").as("seed_id"))
    val vn = Similarity.vecs(spark, dir)
    val sv = seeds.join(vn, seeds("seed_id") === vn("vec_id"))
      .select(col("query_id"), col("seed_id"), col("v").as("qv"), col("norm").as("qn"))
    val sem = vn.crossJoin(broadcast(sv))
      .filter(col("vec_id") =!= col("seed_id"))
      .withColumn("sim_r",
        Similarity.simRound(Similarity.dot(col("qv"), col("v")) /
          (col("qn") * col("norm"))))
    val semRanked = TopKPerKey.topK(sem, Seq(col("query_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), k)
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("sim_r").desc, col("vec_id"))))
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    val fused = lexRanked
      .select(col("query_id"), col("doc_id"), col("rank"),
        lit(1L).as("il"), lit(0L).as("is"))
      .unionByName(semRanked.select(col("query_id"), col("doc_id"), col("rank"),
        lit(0L).as("il"), lit(1L).as("is")))
      .withColumn("c", expr("CAST(1000000000 AS BIGINT) div (60 + rank)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("rrf_fp"), max("il").as("in_lex"), max("is").as("in_sem"))
    TopKPerKey.topK(fused, Seq(col("query_id")),
        Seq(col("rrf_fp").desc, col("doc_id").asc), k)
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("rrf_fp").desc, col("doc_id"))))
      .select("query_id", "rank", "doc_id", "rrf_fp", "in_lex", "in_sem")
  }

  val hybridRrfSql: String = {
    val base = bm25CtePrefix
    s"""$base,
       |lexr AS (SELECT query_id, doc_id, rn AS lrank FROM r WHERE rn <= $k),
       |${Similarity.vecsSql},
       |seed AS (SELECT query_id, doc_id AS seed_id FROM lexr WHERE lrank = 1),
       |sv AS (
       |  SELECT s.query_id, s.seed_id, vn.v AS qv, vn.norm AS qn
       |  FROM seed s JOIN vn ON vn.vec_id = s.seed_id
       |), ds AS (
       |  SELECT sv.query_id, c.vec_id,
       |    ${Similarity.simRoundSql(
             "list_sum(list_transform(list_zip(sv.qv, c.v), x -> x[1] * x[2]))" +
             " / (sv.qn * c.norm)")} AS sim_r
       |  FROM vn c CROSS JOIN sv WHERE c.vec_id <> sv.seed_id
       |), semr AS (
       |  SELECT query_id, vec_id AS doc_id, srank FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_r DESC, vec_id) AS srank
       |    FROM ds)
       |  WHERE srank <= $k
       |), u AS (
       |  SELECT query_id, doc_id, lrank AS urank,
       |    CAST(1 AS BIGINT) AS il, CAST(0 AS BIGINT) AS iss FROM lexr
       |  UNION ALL
       |  SELECT query_id, doc_id, srank AS urank,
       |    CAST(0 AS BIGINT) AS il, CAST(1 AS BIGINT) AS iss FROM semr
       |), f AS (
       |  SELECT query_id, doc_id,
       |    CAST(sum(1000000000 // (60 + urank)) AS BIGINT) AS rrf_fp,
       |    max(il) AS in_lex, max(iss) AS in_sem
       |  FROM u GROUP BY 1, 2
       |), fr AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_fp DESC, doc_id) AS "rank"
       |  FROM f
       |)
       |SELECT query_id, "rank", doc_id, rrf_fp, in_lex, in_sem
       |FROM fr WHERE "rank" <= $k""".stripMargin
  }

  // ---- positional phrase search ------------------------------------------

  private val phraseK = 10

  /** The phrase workload: exact-adjacency queries of mixed length; query
    * 3 extends query 1 by one word — the longer phrase must be the
    * (much) more selective one, which the spec pins. */
  private val phraseQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("table", "hash"),
    1 -> Seq("part", "filter"),
    2 -> Seq("slow", "hash", "batch"),
    3 -> Seq("part", "filter", "scan"))

  /** EXACT-PHRASE search over a positional index — the retrieval feature
    * term-bag BM25 cannot express ("part filter" ≠ a document containing
    * `part` and `filter` far apart). Postings are (doc, term, pos); a
    * phrase w0..wL-1 matches at base position a iff slot i's word sits
    * at pos a+i for every i.
    *
    * The textbook plan is L-1 positional self-joins (`p0 JOIN p1 ON
    * pos1 = pos0+1 ...`) — a join CHAIN whose depth grows with phrase
    * length. This instead uses the anchor trick: each posting row that
    * matches phrase slot `i` votes for anchor `pos - i`, and a full
    * match is an anchor whose vote count equals the phrase length —
    * (query, doc, anchor, slot) is unique by construction (pos is
    * determined by anchor+slot), so a plain count(*) suffices, no
    * distinct. ONE hash aggregate replaces the join chain regardless of
    * phrase length.
    *
    * Scale shape: the phrase vocabulary filter runs inside the scan
    * (posting rows for non-query terms never leave the stage); the
    * anchor aggregate is map-combinable; per-doc occurrence counts are
    * a second tiny aggregate over matched anchors only; ranking is the
    * native bounded heap. A phrase matching half the corpus crosses the
    * wire as k x tasks rows. */
  def phraseTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val vocab = phraseQueries.flatMap(_._2).distinct
    val slots = phraseQueries
      .flatMap { case (id, ws) => ws.zipWithIndex.map { case (w, i) => (id, i.toLong, w) } }
      .toDF("query_id", "slot", "term")
    val plens = phraseQueries.map { case (id, ws) => (id, ws.length.toLong) }
      .toDF("query_id", "plen")
    val posts = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
      .filter(col("term").isin(vocab: _*))
    val anchors = posts.join(broadcast(slots), "term")
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("slot")).as("anchor"))
      .agg(count(lit(1)).as("hits"))
    val matches = anchors.join(broadcast(plens), "query_id")
      .filter(col("hits") === col("plen"))
    val byDoc = matches.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min("anchor").as("first_pos"))
    TopKPerKey.topK(byDoc, Seq(col("query_id")),
        Seq(col("n_occurrences").desc, col("doc_id").asc), phraseK)
      .select("query_id", "doc_id", "n_occurrences", "first_pos")
  }

  val phraseTopkSql: String = {
    val qVals = phraseQueries.flatMap { case (id, ws) =>
      ws.zipWithIndex.map { case (w, i) => s"($id, $i, '$w')" } }.mkString(", ")
    val plVals = phraseQueries.map { case (id, ws) => s"($id, ${ws.length})" }
      .mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${Dedup.tokensSql("text")} AS toks FROM documents),
       |p AS (SELECT doc_id, unnest(toks) AS term,
       |  unnest(generate_series(0, len(toks) - 1)) AS pos FROM t),
       |q(query_id, slot, term) AS (VALUES $qVals),
       |pl(query_id, plen) AS (VALUES $plVals),
       |an AS (
       |  SELECT q.query_id, p.doc_id, p.pos - q.slot AS anchor,
       |    count(*) AS hits
       |  FROM p JOIN q ON p.term = q.term
       |  GROUP BY 1, 2, 3
       |), m AS (
       |  SELECT an.query_id, an.doc_id, an.anchor
       |  FROM an JOIN pl USING (query_id) WHERE an.hits = pl.plen
       |), d AS (
       |  SELECT query_id, doc_id, count(*) AS n_occurrences,
       |    CAST(min(anchor) AS BIGINT) AS first_pos
       |  FROM m GROUP BY 1, 2
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY n_occurrences DESC, doc_id) AS rn FROM d
       |)
       |SELECT query_id, doc_id, n_occurrences, first_pos
       |FROM r WHERE rn <= $phraseK""".stripMargin
  }

  // ---- MMR diversified rerank --------------------------------------------

  private val mmrK = 5        // reranked results per query
  private val mmrLambdaNum = 7L // lambda = 0.7 as the exact 7/3 integer split
  private val mmrCompNum = 3L

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) of
    * each query's BM25 shortlist — the diversity stage every production
    * retrieval pipeline runs between recall and the consumer: greedily
    * pick the candidate maximizing lambda*relevance −
    * (1−lambda)*max-similarity-to-already-picked, so near-duplicate hits
    * stop crowding out coverage. All-integer scoring: BM25 relevance
    * normalizes per query to 1e-6 fixed point (integer div by the
    * query's max), candidate-pair cosines quantize to 1e-6 longs via the
    * ANN family's rounding tree, and the MMR objective is
    * `7*rel − 3*maxsim` (lambda = 0.7 exactly) with doc_id ascending as
    * the tie-break — bit-identical cross-engine, no float comparison
    * anywhere.
    *
    * Scale shape: recall (the BM25 leg) and the candidate-pair cosine
    * grid both run distributed; what reaches the driver is the shortlist
    * itself — k×|queries| rows and k²×|queries| sims, BOUNDED BY
    * CONSTRUCTION (the same boundedness contract as the BPE trainer's
    * 1-row-per-round collect). The greedy loop is O(k²) per query on
    * that shortlist — the classic head-node rerank stage; corpus size
    * never touches it. The DuckDB oracle replays the greedy EXACTLY as
    * [[mmrK]] unrolled select-round CTEs. */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy("query_id")
    val cand = bm25Topk(spark, dir)
      .withColumn("max_fp", max("score_fp").over(w))
      .withColumn("rel_norm_u", expr("score_fp * 1000000L div max_fp"))
    val vn = Similarity.vecs(spark, dir)
    val cv = cand.join(vn, cand("doc_id") === vn("vec_id"))
      .select(col("query_id"), col("doc_id"), col("rel_norm_u"),
        col("v"), col("norm"))
    val o = cv.select(col("query_id").as("q2"), col("doc_id").as("d2"),
      col("v").as("v2"), col("norm").as("n2"))
    val simU = floor(Similarity.dot(col("v"), col("v2")) /
      (col("norm") * col("n2")) * lit(1000000.0) + lit(0.5)).cast("long")
    val sims = cv.join(o, col("query_id") === col("q2") && col("doc_id") =!= col("d2"))
      .select(col("query_id"), col("doc_id").as("d1"), col("d2"), simU.as("sim_u"))
      .as[(Int, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(r => r._3 -> r._4).toMap).toMap
    val pool = cv.select(col("query_id"), col("doc_id"), col("rel_norm_u"))
      .as[(Int, Long, Long)].collect()
    val out = pool.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      var remaining = cs.map(c => c._2 -> c._3).sortBy(_._1).toBuffer
      val picked = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long)]()
      for (r <- 1 to math.min(mmrK, remaining.size)) {
        val scored = remaining.map { case (d, rel) =>
          val ms =
            if (picked.isEmpty) 0L
            else picked.map(p => sims((qid, d))(p._3)).max
          (d, rel, ms, mmrLambdaNum * rel - mmrCompNum * ms)
        }
        val best = scored.minBy(s => (-s._4, s._1))
        picked += ((qid, r, best._1, best._4, best._2, best._3))
        remaining = remaining.filterNot(_._1 == best._1)
      }
      picked
    }
    out.toDF("query_id", "rank", "doc_id", "mmr_u", "rel_norm_u", "max_sim_u")
  }

  val mmrRerankSql: String = {
    val base = bm25CtePrefix
    val sb = new StringBuilder
    sb ++= s"""$base,
       |lex AS (SELECT query_id, doc_id, score_fp FROM r WHERE rn <= $k),
       |cn AS (
       |  SELECT query_id, doc_id,
       |    CAST(score_fp * 1000000 // max(score_fp) OVER (PARTITION BY query_id)
       |      AS BIGINT) AS rel_norm_u
       |  FROM lex
       |),
       |${Similarity.vecsSql},
       |cv AS (
       |  SELECT cn.query_id, cn.doc_id, cn.rel_norm_u, vn.v, vn.norm
       |  FROM cn JOIN vn ON vn.vec_id = cn.doc_id
       |),
       |sims AS (
       |  SELECT x.query_id, x.doc_id AS d1, y.doc_id AS d2,
       |    CAST(floor(
       |      list_sum(list_transform(list_zip(x.v, y.v), z -> z[1] * z[2]))
       |      / (x.norm * y.norm) * 1000000.0 + 0.5) AS BIGINT) AS sim_u
       |  FROM cv x JOIN cv y
       |    ON x.query_id = y.query_id AND x.doc_id <> y.doc_id
       |),
       |s1 AS (
       |  SELECT query_id, doc_id, $mmrLambdaNum * rel_norm_u AS mmr_u,
       |    rel_norm_u, CAST(0 AS BIGINT) AS max_sim_u, 1 AS "rank"
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel_norm_u DESC, doc_id) AS srn FROM cv)
       |  WHERE srn = 1
       |), sel1 AS (SELECT * FROM s1)""".stripMargin
    for (r <- 2 to mmrK) {
      sb ++= s""",
       |m$r AS (
       |  SELECT c.query_id, c.doc_id, c.rel_norm_u, max(si.sim_u) AS ms
       |  FROM (SELECT cv.* FROM cv
       |        ANTI JOIN sel${r - 1} USING (query_id, doc_id)) c
       |  JOIN sims si ON si.query_id = c.query_id AND si.d1 = c.doc_id
       |  JOIN sel${r - 1} sl ON sl.query_id = si.query_id AND sl.doc_id = si.d2
       |  GROUP BY 1, 2, 3
       |), s$r AS (
       |  SELECT query_id, doc_id, mmr_u, rel_norm_u, max_sim_u, $r AS "rank"
       |  FROM (SELECT query_id, doc_id,
       |      $mmrLambdaNum * rel_norm_u - $mmrCompNum * ms AS mmr_u,
       |      rel_norm_u, ms AS max_sim_u,
       |      row_number() OVER (PARTITION BY query_id ORDER BY
       |        $mmrLambdaNum * rel_norm_u - $mmrCompNum * ms DESC, doc_id) AS srn
       |    FROM m$r)
       |  WHERE srn = 1
       |), sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    }
    sb ++= s"""
       |SELECT query_id, "rank", doc_id, mmr_u, rel_norm_u, max_sim_u
       |FROM sel$mmrK""".stripMargin
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> (bm25Topk _),
    "bm25_prf" -> (bm25Prf _),
    "hybrid_rrf" -> (hybridRrf _),
    "phrase_topk" -> (phraseTopk _),
    "mmr_rerank" -> (mmrRerank _),
  )

  val oracles: Map[String, String] = Map(
    "bm25_topk" -> bm25TopkSql,
    "bm25_prf" -> bm25PrfSql,
    "hybrid_rrf" -> hybridRrfSql,
    "phrase_topk" -> phraseTopkSql,
    "mmr_rerank" -> mmrRerankSql,
  )
}
