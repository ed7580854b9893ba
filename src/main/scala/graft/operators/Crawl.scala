package graft.operators

import graft.plans.TopKPerKey
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl governance — the decisions a large-scale crawler makes BEFORE
  * it spends fetch budget, completing the URL channel's story upstream
  * of [[Corpus.urlDedup]]: which URLs robots.txt permits (RFC 9309
  * longest-match semantics), which hosts deserve frontier priority
  * (PageRank over the host link graph, Page et al. 1999), and what the
  * web "calls" each host (top anchor terms per link target — the
  * signal crawl schedulers and quality filters both read).
  *
  * Fixture synthesis: the driver's documents table carries no frontier,
  * robots rules, or link graph, so all three are derived DETERMINISTICALLY
  * from doc_id over a 53-host domain (`h<k>.example.org`, k = doc_id %
  * 53; 53 prime so the multiplicative link maps spread). A deployment
  * replaces [[frontier]] / [[robotsRules]] / the link derivation with
  * its real crawl tables; every operator downstream of the synthesis is
  * shape-generic.
  *
  * Scale shapes (the 100 TB posture of each):
  *  - [[robotsFilter]]: rules are per-HOST and small (real robots files
  *    cap at a few hundred lines) — a broadcast hash join against the
  *    frontier with the prefix test inside the join, then ONE
  *    map-combinable agg keyed by the url row. No sort, no window, no
  *    shuffle of the frontier beyond the verdict agg.
  *  - [[hostFrontierRank]]: the DATA-scale work is reducing the
  *    doc-level link derivation to the (src, dst, w) HOST graph — one
  *    hash agg; the 10 power iterations then run on the aggregated
  *    graph (|hosts|^2 worst case, not the corpus), integer fixed-point
  *    throughout, `localCheckpoint` per round to keep lineage flat —
  *    the same discipline as [[Graph.typeMarkovRank]].
  *  - [[anchorTopk]]: map-combinable (host, term) count agg, then the
  *    native bounded-heap [[TopKPerKey]] operator — at most k rows per
  *    host cross the exchange, never the full term distribution of a
  *    hot host.
  *
  * Exactness: PageRank uses the repo-standard integer fixed point
  * (ranks 1e-12, edge probabilities 1e-6, floor division in both
  * engines — see [[Graph.typeMarkovRank]]'s overflow-headroom note);
  * robots verdicts and anchor counts are pure integer/string ops, so
  * every oracle is hash-exact. */
object Crawl {

  private val H = 53L                // host-domain size (prime)
  private val SCALE = 1000000000000L // 1e-12 fixed-point rank
  private val PSCALE = 1000000L      // 1e-6 fixed-point edge probability
  private val iters = 10
  private val anchorK = 3

  private def hostOf(k: Column): Column =
    concat(lit("h"), k, lit(".example.org"))

  /** Deterministic crawl frontier: every document becomes one candidate
    * URL on host h(doc_id % 53) with a path class (doc_id % 5) chosen so
    * every robots rule below is load-bearing: /private (blanket
    * disallow), /private/pub (longest-match Allow override), /public
    * and bare /page (no rule), /tmp (host-conditional disallow). */
  private[graft] def frontier(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        hostOf(col("doc_id") % H).as("host"),
        (col("doc_id") % 5L).as("v"))
      .withColumn("path",
        when(col("v") === 0L, concat(lit("/private/page"), col("doc_id")))
          .when(col("v") === 1L, concat(lit("/private/pub/page"), col("doc_id")))
          .when(col("v") === 2L, concat(lit("/public/page"), col("doc_id")))
          .when(col("v") === 3L, concat(lit("/tmp/page"), col("doc_id")))
          .otherwise(concat(lit("/page"), col("doc_id"))))
      .select("doc_id", "host", "path")

  // NOTE: interpolated into stripMargin'd oracles — no leading '|' lines.
  private val frontierSql: String =
    """SELECT doc_id,
      |  'h' || (doc_id % 53) || '.example.org' AS host,
      |  CASE doc_id % 5
      |    WHEN 0 THEN '/private/page' || doc_id
      |    WHEN 1 THEN '/private/pub/page' || doc_id
      |    WHEN 2 THEN '/public/page' || doc_id
      |    WHEN 3 THEN '/tmp/page' || doc_id
      |    ELSE '/page' || doc_id END AS path
      |FROM documents""".stripMargin

  /** Deterministic robots rule set, one row per (host, path-prefix,
    * allow-bit). Every host disallows /private but Allow-overrides
    * /private/pub (the longest-match case RFC 9309 §2.2.2 specifies);
    * every 7th host additionally disallows /tmp; every 13th host
    * carries a full block (`Disallow: /`) — which longest-match still
    * pierces for /private/pub, the subtlety naive implementations get
    * wrong. */
  private[graft] def robotsRules(spark: SparkSession): DataFrame = {
    val hosts = spark.range(H)
      .select(col("id").as("k"), hostOf(col("id")).as("host"))
    val everyHost = hosts.select(col("k"), col("host"),
        explode(array(
          struct(lit("/private").as("rule_path"), lit(0L).as("is_allow")),
          struct(lit("/private/pub").as("rule_path"), lit(1L).as("is_allow")))).as("r"))
      .select(col("k"), col("host"), col("r.rule_path"), col("r.is_allow"))
    val tmp = hosts.filter(col("k") % 7L === 0L)
      .select(col("k"), col("host"), lit("/tmp").as("rule_path"), lit(0L).as("is_allow"))
    val block = hosts.filter(col("k") % 13L === 0L)
      .select(col("k"), col("host"), lit("/").as("rule_path"), lit(0L).as("is_allow"))
    everyHost.unionByName(tmp).unionByName(block).drop("k")
  }

  private val robotsRulesSql: String =
    """SELECT host, rule_path, is_allow FROM (
      |  SELECT range AS k, 'h' || range || '.example.org' AS host FROM range(53)
      |) h CROSS JOIN LATERAL (
      |  SELECT '/private' AS rule_path, CAST(0 AS BIGINT) AS is_allow
      |  UNION ALL SELECT '/private/pub', 1
      |  UNION ALL SELECT '/tmp', 0 WHERE h.k % 7 = 0
      |  UNION ALL SELECT '/', 0 WHERE h.k % 13 = 0
      |) r""".stripMargin

  /** RFC 9309 robots verdict per frontier URL: among the host's rules
    * whose path-prefix matches, the LONGEST wins; on a length tie Allow
    * wins; no match means allowed. One row per URL with the winning
    * rule (null when no rule matched) and the crawl verdict.
    *
    * The winner is selected with `max_by` on `2*len(rule) + is_allow` —
    * an integer that encodes exactly the RFC's (length, allow) order;
    * rule paths are unique per host so the key is collision-free among
    * a URL's matches. */
  def robotsFilter(spark: SparkSession, dir: String): DataFrame =
    robotsVerdict(frontier(Tables.documents(spark, dir)), robotsRules(spark))

  /** The verdict core over ANY (doc_id, host, path) frontier and
    * (host, rule_path, is_allow) rule table — split out so the
    * ScalaCheck property can drive random rule sets through the same
    * plan the fixture query runs (RobotsPropertySpec). */
  private[graft] def robotsVerdict(f: DataFrame, rules: DataFrame): DataFrame = {
    val rank = (length(col("rule_path")).cast("long") * 2L + col("is_allow")).as("rank")
    val j = f.join(broadcast(rules),
      f("host") === rules("host") && f("path").startsWith(rules("rule_path")),
      "left")
      .select(f("doc_id"), f("host"), f("path"), rules("rule_path"), rank)
    j.groupBy("doc_id", "host", "path")
      .agg(max_by(col("rule_path"), col("rank")).as("rule_path"),
        coalesce(max(col("rank")) % 2L === 1L, lit(true)).as("allowed"))
  }

  val robotsFilterSql: String =
    s"""WITH f AS ($frontierSql),
       |rules AS ($robotsRulesSql),
       |j AS (
       |  SELECT f.doc_id, f.host, f.path, r.rule_path,
       |    length(r.rule_path) * 2 + r.is_allow AS rank
       |  FROM f LEFT JOIN rules r
       |    ON f.host = r.host AND starts_with(f.path, r.rule_path)
       |)
       |SELECT doc_id, host, path,
       |  max_by(rule_path, rank) AS rule_path,
       |  coalesce(max(rank) % 2 = 1, TRUE) AS allowed
       |FROM j GROUP BY 1, 2, 3""".stripMargin

  /** Doc-derived host link graph: each document contributes two
    * directed host edges, src = h(doc_id % 53) to h((7*doc_id + 11) %
    * 53) and to h((31*doc_id + 5) % 53) (distinct multiplicative maps
    * so in/out degree vary across hosts); self-loops dropped, weights
    * by multiplicity. */
  private def hostEdges(docs: DataFrame): DataFrame = {
    val src = hostOf(col("doc_id") % H).as("src")
    val e1 = docs.select(src, hostOf((col("doc_id") * 7L + 11L) % H).as("dst"))
    val e2 = docs.select(src, hostOf((col("doc_id") * 31L + 5L) % H).as("dst"))
    e1.unionByName(e2).filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Crawl-priority PageRank of frontier hosts (damping 0.85, 10 power
    * iterations, all-integer fixed point — see [[Graph.typeMarkovRank]]
    * for the exactness argument). Node set = hosts present in the
    * frontier; contributions to a non-frontier host leak like dangling
    * mass, identically in both engines. Output: (host, rank_fp) in
    * 1e-12 fixed point. */
  def hostFrontierRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val edges = hostEdges(docs)
    val out = edges.groupBy("src").agg(sum("w").as("out"))
    val p = edges.join(out, "src")
      .withColumn("p", expr(s"(w * $PSCALE) div out"))
      .localCheckpoint()
    val nodes = docs.select(hostOf(col("doc_id") % H).as("node"))
      .distinct().localCheckpoint()

    // host-domain cardinality: a bounded driver scalar (the aggregated
    // host domain, not the corpus) feeding the teleport constant — the
    // same adjudicated pattern as typeMarkovRank's node count
    val n = nodes.count()
    // size-gated single-task solve, same gate + exactness argument as
    // typeMarkovRank (PageRankLocal scaladoc); the general loop below
    // is the past-the-gate path
    graft.plans.PageRankLocal.solve(p, nodes, iters, SCALE, PSCALE, n) match {
      case Some(r) =>
        return r.select(col("node").as("host"), col("r").as("rank_fp"))
      case None => ()
    }
    val r0 = SCALE / n
    val teleport = (15L * r0) / 100L

    var ranks = nodes.withColumn("r", lit(r0))
    for (_ <- 0 until iters) {
      val contrib = p.join(ranks, p("src") === ranks("node"))
        .select(col("dst"), expr(s"(r * p) div $PSCALE").as("ct"))
        .groupBy("dst").agg(sum("ct").as("contrib"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node").as("host"), col("r").as("rank_fp"))
  }

  val hostFrontierRankSql: String =
    s"""WITH RECURSIVE d AS (SELECT doc_id FROM documents),
       |ed AS (
       |  SELECT src, dst, count(*) AS w FROM (
       |    SELECT 'h' || (doc_id % 53) || '.example.org' AS src,
       |      'h' || ((doc_id * 7 + 11) % 53) || '.example.org' AS dst FROM d
       |    UNION ALL
       |    SELECT 'h' || (doc_id % 53) || '.example.org',
       |      'h' || ((doc_id * 31 + 5) % 53) || '.example.org' FROM d
       |  ) WHERE src <> dst GROUP BY 1, 2
       |),
       |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY 1),
       |p AS (
       |  SELECT ed.src, ed.dst, (ed.w * $PSCALE) // o.outw AS p
       |  FROM ed JOIN o USING (src)
       |),
       |nodes AS (
       |  SELECT DISTINCT 'h' || (doc_id % 53) || '.example.org' AS node FROM d
       |),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |it(i, node, r) AS (
       |  SELECT 0, node, (SELECT $SCALE // n FROM nn) FROM nodes
       |  UNION ALL
       |  SELECT i, node, r FROM (
       |    SELECT coalesce(c.i, max(c.i) OVER ()) + 1 AS i, n2.node,
       |      (SELECT (15 * ($SCALE // n)) // 100 FROM nn)
       |        + (85 * coalesce(c.contrib, 0)) // 100 AS r
       |    FROM nodes n2 LEFT JOIN (
       |      SELECT it.i AS i, p.dst, CAST(sum((it.r * p.p) // $PSCALE) AS BIGINT) AS contrib
       |      FROM it JOIN p ON it.node = p.src
       |      WHERE it.i < $iters
       |      GROUP BY 1, 2
       |    ) c ON c.dst = n2.node
       |  ) WHERE i IS NOT NULL
       |)
       |SELECT node AS host, CAST(r AS BIGINT) AS rank_fp
       |FROM it WHERE i = $iters""".stripMargin

  /** Top anchor terms per link-target host: every document "links" to
    * h((7*doc_id + 11) % 53) (the first [[hostEdges]] map) with anchor
    * term = its first token; counts per (host, term), then the top 3
    * terms per host by (count desc, term asc) through the bounded-heap
    * [[TopKPerKey]] operator. Output: (host, anchor, cnt). */
  def anchorTopk(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val anchors = docs.select(
        hostOf((col("doc_id") * 7L + 11L) % H).as("host"),
        // try_element_at, NOT element_at: under the session default
        // ANSI mode an empty token array (punctuation-only / non-latin
        // text — real in any crawl corpus) would ABORT the job where
        // the oracle's (list)[1] returns NULL; try_ restores the
        // null-then-filter semantics both engines share (r14 review)
        try_element_at(Dedup.tokens(col("text")), lit(1)).as("anchor"))
      .filter(col("anchor").isNotNull)
    val counts = anchors.groupBy("host", "anchor").agg(count(lit(1)).as("cnt"))
    TopKPerKey.topK(counts, Seq(col("host")),
        Seq(col("cnt").desc, col("anchor").asc), anchorK)
      .select("host", "anchor", "cnt")
  }

  val anchorTopkSql: String =
    s"""WITH a AS (
       |  SELECT 'h' || ((doc_id * 7 + 11) % 53) || '.example.org' AS host,
       |    (${Dedup.tokensSql("text")})[1] AS anchor
       |  FROM documents
       |), c AS (
       |  SELECT host, anchor, count(*) AS cnt FROM a
       |  WHERE anchor IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT host, anchor, cnt FROM (
       |  SELECT host, anchor, cnt, row_number() OVER (
       |    PARTITION BY host ORDER BY cnt DESC, anchor) AS rn FROM c
       |) WHERE rn <= $anchorK""".stripMargin

  /** Fetch-budget apportionment — the decision the governance trio
    * exists to feed: split a global budget of [[budgetB]] fetches
    * across hosts proportional to [[hostFrontierRank]], by Hamilton's
    * largest-remainder method (exact integers: floor shares + one +1
    * bonus per leftover unit, remainders ranked (rem desc, host asc)),
    * then cap each host at its robots-ALLOWED URL count — a quota the
    * crawler can actually spend. Cap overflow is reported as unspent
    * (`quota < base+bonus`), not redistributed: water-filling is an
    * iteration of this same operator a deployment loops to a fixed
    * point, and one pass keeps the oracle a single window.
    *
    * Scale shape: everything after the two substrate aggs is
    * HOST-domain sized, and the one global ordering Hamilton needs — the
    * largest-remainder selection — is BUDGET-bounded, not host-bounded:
    * the leftover R = B - Σ floor(share) is < B by construction, so the
    * top-B remainders (TakeOrdered: per-partition bounded heaps merged
    * on the driver, `orderBy.limit` — no single-task global sort, no
    * full-domain shuffle) already contain every bonus recipient. The
    * row_number that turns them into ranks runs over ≤ B rows (a
    * CONSTANT), and the bonus set broadcast-joins back to the host
    * table. An open 10^8-host web domain therefore never serializes
    * through one window task (the r14 watch item); the totals legs are
    * 1-row broadcasts. Output: (host, allowed_n, rank_fp, quota). */
  def crawlBudgetAlloc(spark: SparkSession, dir: String): DataFrame = {
    val allowed = robotsFilter(spark, dir)
      .groupBy("host")
      .agg(sum(when(col("allowed"), 1L).otherwise(0L)).as("allowed_n"))
    val ranks = hostFrontierRank(spark, dir)
    val j = ranks.join(allowed, "host")
    val tot = j.agg(sum("rank_fp").as("r_total"))
    val based = j.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($budgetB * rank_fp) div r_total"))
      .withColumn("rem", expr(s"($budgetB * rank_fp) % r_total"))
    val spent = based.agg(sum("base").as("b_spent"))
    // top-B remainders via TakeOrdered (bounded heaps), ranked over the
    // resulting <= B rows; rank > leftover (or absent) earns no bonus —
    // identical to ranking ALL hosts, since leftover < B
    val topRem = based.select("host", "rem")
      .orderBy(col("rem").desc, col("host").asc).limit(budgetB.toInt)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("host").asc)
    val ranked = topRem.withColumn("rn", row_number().over(w))
      .select("host", "rn")
    based.crossJoin(broadcast(spent))
      .join(broadcast(ranked), Seq("host"), "left")
      .select(col("host"), col("allowed_n"), col("rank_fp"),
        least(col("base") +
            when(col("rn").isNotNull &&
              col("rn") <= lit(budgetB) - col("b_spent"), 1L).otherwise(0L),
          col("allowed_n")).as("quota"))
  }

  private val budgetB = 1000L

  val crawlBudgetAllocSql: String =
    s"""WITH r AS ($hostFrontierRankSql),
       |al AS (
       |  SELECT host, CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
       |    AS allowed_n
       |  FROM ($robotsFilterSql) GROUP BY 1
       |),
       |j AS (SELECT r.host, al.allowed_n, r.rank_fp FROM r JOIN al USING (host)),
       |t AS (SELECT CAST(sum(rank_fp) AS BIGINT) AS r_total FROM j),
       |b AS (
       |  SELECT j.*, ($budgetB * rank_fp) // r_total AS base,
       |    ($budgetB * rank_fp) % r_total AS rem
       |  FROM j CROSS JOIN t
       |),
       |s AS (SELECT CAST(sum(base) AS BIGINT) AS b_spent FROM b)
       |SELECT host, allowed_n, rank_fp,
       |  least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, host)
       |    <= $budgetB - b_spent THEN 1 ELSE 0 END, allowed_n) AS quota
       |FROM b CROSS JOIN s""".stripMargin

  /** Crawl-trap detector — the governance check that catches infinite
    * URL spaces (calendar pages, session ids, faceted-search
    * explosions) before they eat the fetch budget: collapse every
    * digit run in the path to `N` (the URL "template"), then per host
    * compare distinct URLs against distinct templates. A host whose
    * url:template ratio explodes is enumerating a template, not
    * publishing content. Ratio in 1e-6 fixed point (integer division;
    * both engines floor), flagged above [[trapRatioFp]].
    *
    * Scale shape: the template is a scan-side regexp (no shuffle of
    * raw paths beyond the distinct agg); distinct URLs and distinct
    * templates reduce through one (host, template) agg each —
    * map-combinable, key space bounded by the host's real template
    * count, which is exactly what a trap host inflates and what the
    * operator exists to surface. Output one row per host. */
  def crawlTrapDetect(spark: SparkSession, dir: String): DataFrame = {
    val f = trapLog(Tables.documents(spark, dir))
      .withColumn("tmpl", regexp_replace(col("path"), "[0-9]+", "N"))
    val perHost = f.groupBy("host").agg(
      countDistinct(col("path")).as("n_urls"),
      countDistinct(col("tmpl")).as("n_templates"))
    perHost.select(col("host"), col("n_urls"), col("n_templates"),
      expr(s"(n_urls * $PSCALE) div n_templates").as("ratio_fp"),
      (expr(s"(n_urls * $PSCALE) div n_templates") > trapRatioFp).as("trap"))
  }

  /** Fetch-log synthesis for the trap detector, SEPARATE from
    * [[frontier]] (whose per-doc-unique paths would flag every host):
    * every 3rd host enumerates a calendar template (`/cal/page<doc>`,
    * one fresh URL per fetch — the trap), the rest serve a 4-page
    * static site. */
  private def trapLog(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), hostOf(col("doc_id") % H).as("host"))
      .withColumn("path",
        when((col("doc_id") % H) % 3L === 0L,
          concat(lit("/cal/page"), col("doc_id")))
          // pmod keeps the index in 1..4 for ANY doc_id sign (Spark's %
          // keeps the dividend's sign, so `% 4 + 1` could compute 0 for
          // doc_id % 4 == -1 — an index even try_element_at aborts on
          // under ANSI; try_ only suppresses OUT-OF-BOUND indices).
          // Identical to the oracle's `doc_id % 4` on the fixture's
          // non-negative ids. (r15 review)
          .otherwise(element_at(
            array(lit("/about"), lit("/contact"), lit("/index"), lit("/news")),
            (pmod(col("doc_id"), lit(4L)) + 1L).cast("int"))))
      .select("host", "path")

  private val trapRatioFp = 3L * PSCALE / 2L // 1.5 urls per template

  val crawlTrapDetectSql: String =
    s"""WITH f AS (
       |  SELECT host, path, regexp_replace(path, '[0-9]+', 'N', 'g') AS tmpl
       |  FROM (
       |    SELECT 'h' || (doc_id % 53) || '.example.org' AS host,
       |      CASE WHEN (doc_id % 53) % 3 = 0 THEN '/cal/page' || doc_id
       |        ELSE (['/about', '/contact', '/index', '/news'])[(doc_id % 4) + 1]
       |      END AS path
       |    FROM documents
       |  )
       |),
       |p AS (
       |  SELECT host, count(DISTINCT path) AS n_urls,
       |    count(DISTINCT tmpl) AS n_templates
       |  FROM f GROUP BY 1
       |)
       |SELECT host, n_urls, n_templates,
       |  (n_urls * $PSCALE) // n_templates AS ratio_fp,
       |  (n_urls * $PSCALE) // n_templates > $trapRatioFp AS trap
       |FROM p""".stripMargin

  /** Change-rate recrawl scheduling (the decision studied by Cho &
    * Garcia-Molina, "Effective Page Refresh Policies", 2003 — here in
    * the exact-integer inverse-frequency form): treat the events table
    * as a fetch log (user_id = page, ts order = fetch order,
    * floor(value/100) = the content-signature band each fetch
    * observed), count a CHANGE whenever consecutive fetches of a page
    * disagree, and schedule the next revisit at BASE * fetches /
    * changes seconds, ceiling-clamped at 30 days. No floor clamp: a
    * page changes at most once per fetch, so the raw interval is >
    * BASE by algebra — only the stable-page ceiling is reachable
    * (RecrawlClampSpec-style constructed log in CrawlSpec pins it; the
    * fixture's churny pages exercise the open interval).
    *
    * Exactness: no logarithms (a float `ln` is not cross-engine stable
    * at a fixed-point quantization boundary) — the signature band is
    * one IEEE divide+floor on the same stored double in both engines,
    * and everything after is integer. Scale shape: the change scan is
    * one hash exchange on page feeding an in-partition window `lag`
    * (the [[Graph.typeMarkovRank]] transition-extraction shape), then
    * a map-combinable page agg; no joins. Output one row per page. */
  def recrawlSchedule(spark: SparkSession, dir: String): DataFrame =
    recrawlFrom(fetchLog(spark, dir))

  /** The events table read as a fetch log: (page, sig, ts_sec, event_id). */
  private[graft] def fetchLog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("page"),
        floor(col("value") / lit(100.0)).cast("long").as("sig"),
        col("ts_sec"), col("event_id"))

  /** Core scoring over a (page, sig, ts_sec, event_id) fetch log —
    * split out so specs can drive constructed logs through the clamp.
    * Lean path (r15, closing the r14 ADVICE note): the batch schedule
    * needs only (n, x), so it skips [[pageState]]'s second (descending)
    * window sort and the edge-signature columns — those exist for the
    * boundary merges of the incremental/streaming forms, which keep the
    * full partial state. */
  private[graft] def recrawlFrom(log: DataFrame): DataFrame = {
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("page").orderBy(col("ts_sec"), col("event_id"))
    scheduleFrom(log
      .withColumn("prev", lag("sig", 1).over(wa))
      .groupBy("page").agg(
        count(lit(1)).as("n_fetches"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("sig"), 1L)
          .otherwise(0L)).as("n_changes")))
  }

  /** Per-page reduction of one fetch-log SLICE: fetch count `n`,
    * internal consecutive-change count `x`, both edge signatures (for
    * boundary merges across slices), and the slice's last-fetch order
    * key — the partial state every recrawl form (batch, incremental,
    * streaming) reduces through. One page-keyed exchange; both edge
    * row_numbers share the window sort. */
  private[graft] def pageState(log: DataFrame): DataFrame = {
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("page").orderBy(col("ts_sec"), col("event_id"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy("page").orderBy(col("ts_sec").desc, col("event_id").desc)
    log
      .withColumn("prev", lag("sig", 1).over(wa))
      .withColumn("rn_a", row_number().over(wa))
      .withColumn("rn_d", row_number().over(wd))
      .groupBy("page").agg(
        count(lit(1)).as("n"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("sig"), 1L)
          .otherwise(0L)).as("x"),
        max(when(col("rn_a") === 1, col("sig"))).as("first_sig"),
        max(when(col("rn_d") === 1, col("sig"))).as("last_sig"),
        max(when(col("rn_d") === 1, col("ts_sec"))).as("last_ts"),
        max(when(col("rn_d") === 1, col("event_id"))).as("last_eid"))
  }

  /** The shared schedule projection over (page, n_fetches, n_changes). */
  private[graft] def scheduleFrom(counts: DataFrame): DataFrame =
    counts.select(col("page"), col("n_fetches"), col("n_changes"),
      expr(s"(n_changes * $PSCALE) div n_fetches").as("change_rate_fp"),
      least(expr(s"($recrawlBaseSec * n_fetches) div greatest(n_changes, 1L)"),
        lit(2592000L)).as("interval_sec"))

  private val recrawlBaseSec = 86400L

  /** Incremental recrawl-state merge — the daily form: the first 80%
    * of the fetch timeline is the PERSISTED per-page state (fetch
    * count, change count, last signature), the last 20% is today's
    * batch; merging adds the batch's internal changes plus ONE
    * boundary comparison (state's last signature vs the batch's first)
    * per page both sides touch. The oracle is the FULL recompute
    * ([[recrawlScheduleSql]]) — the merge must be hash-exact against
    * it, the same merge==recompute theorem every other incremental
    * family pins. The 80/20 cutoff is exact integer arithmetic on the
    * ts range, identical in both engines.
    *
    * Scale shape: base-state extraction and batch scoring are each the
    * same page-keyed window shape as [[recrawlFrom]]; the merge is one
    * page-keyed full outer join — in production against a persisted
    * state table 1/corpus-th the fetch log's size, and the batch side
    * is a day's crawl, typically broadcastable per shard. */
  def recrawlIncremental(spark: SparkSession, dir: String): DataFrame = {
    val log = fetchLog(spark, dir)
    val cut = log.agg(
      expr("min(ts_sec) + (4 * (max(ts_sec) - min(ts_sec))) div 5").as("cut"))
    val tagged = log.crossJoin(broadcast(cut))
    val base = pageState(tagged.filter(col("ts_sec") <= col("cut")))
      .select(col("page"), col("n").as("bn"), col("x").as("bx"), col("last_sig"))
    val batch = pageState(tagged.filter(col("ts_sec") > col("cut")))
      .select(col("page"), col("n").as("nn"), col("x").as("nx"), col("first_sig"))
    scheduleFrom(base.join(batch, Seq("page"), "full_outer")
      .select(col("page"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("nn"), lit(0L))).as("n_fetches"),
        (coalesce(col("bx"), lit(0L)) + coalesce(col("nx"), lit(0L)) +
          when(col("last_sig").isNotNull && col("first_sig").isNotNull &&
            col("last_sig") =!= col("first_sig"), 1L).otherwise(0L)).as("n_changes")))
  }

  val recrawlScheduleSql: String =
    s"""WITH f AS (
       |  SELECT user_id AS page,
       |    CAST(floor(value / 100.0) AS BIGINT) AS sig,
       |    epoch_ns(ts) // 1000000000 AS ts_sec, event_id
       |  FROM events WHERE user_id IS NOT NULL
       |),
       |c AS (
       |  SELECT page, sig, lag(sig) OVER (
       |    PARTITION BY page ORDER BY ts_sec, event_id) AS prev
       |  FROM f
       |),
       |p AS (
       |  SELECT page, count(*) AS n_fetches,
       |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> sig
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
       |  FROM c GROUP BY 1
       |)
       |SELECT page, n_fetches, n_changes,
       |  (n_changes * $PSCALE) // n_fetches AS change_rate_fp,
       |  least(($recrawlBaseSec * n_fetches) // greatest(n_changes, 1),
       |    2592000) AS interval_sec
       |FROM p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "robots_filter" -> (robotsFilter _),
    "host_frontier_rank" -> (hostFrontierRank _),
    "anchor_topk" -> (anchorTopk _),
    "crawl_budget_alloc" -> (crawlBudgetAlloc _),
    "crawl_trap_detect" -> (crawlTrapDetect _),
    "recrawl_schedule" -> (recrawlSchedule _),
    "recrawl_incremental" -> (recrawlIncremental _),
  )

  val oracles: Map[String, String] = Map(
    "robots_filter" -> robotsFilterSql,
    "host_frontier_rank" -> hostFrontierRankSql,
    "anchor_topk" -> anchorTopkSql,
    "crawl_budget_alloc" -> crawlBudgetAllocSql,
    "crawl_trap_detect" -> crawlTrapDetectSql,
    "recrawl_schedule" -> recrawlScheduleSql,
    // the incremental merge must be hash-exact against the FULL recompute
    "recrawl_incremental" -> recrawlScheduleSql,
  )
}
