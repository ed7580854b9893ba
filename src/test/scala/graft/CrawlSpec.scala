package graft

import graft.operators.Crawl
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the crawl-governance semantics:
  *  - robots verdicts follow RFC 9309 longest-match (Allow overrides a
  *    shorter Disallow; a full-block host is still pierced by the
  *    longer /private/pub Allow; ties cannot arise in the fixture);
  *  - the host PageRank conserves fixed-point mass up to the documented
  *    truncation/dangling leak and never produces a non-positive rank;
  *  - the bounded-heap anchor top-k emits exactly the window-plan rows. */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("robots_filter verdict table matches RFC 9309 longest-match by hand") {
    val rows = Crawl.robotsFilter(spark, dir)
      .select("doc_id", "allowed", "rule_path")
      .as[(Long, Boolean, Option[String])].collect()
    assert(rows.length == 500)
    rows.foreach { case (doc, allowed, rule) =>
      val k = doc % 53
      val full = k % 13 == 0
      val tmpBlocked = k % 7 == 0
      (doc % 5, full) match {
        case (0, _) => // /private/pageN: blanket disallow everywhere
          assert(!allowed && rule.contains("/private"), s"doc $doc")
        case (1, _) => // /private/pub/pageN: longest-match Allow wins,
          // EVEN on a full-block host — the RFC subtlety
          assert(allowed && rule.contains("/private/pub"), s"doc $doc")
        case (2, f) => // /public/pageN: only '/' can match
          assert(allowed == !f, s"doc $doc")
          assert(rule == (if (f) Some("/") else None), s"doc $doc")
        case (3, f) => // /tmp/pageN: host-conditional disallow beats '/'
          if (tmpBlocked) assert(!allowed && rule.contains("/tmp"), s"doc $doc")
          else {
            assert(allowed == !f, s"doc $doc")
            assert(rule == (if (f) Some("/") else None), s"doc $doc")
          }
        case (_, f) => // bare /pageN: only '/' can match
          assert(allowed == !f, s"doc $doc")
          assert(rule == (if (f) Some("/") else None), s"doc $doc")
      }
    }
    // both verdicts are populated (the fixture exercises both branches)
    assert(rows.count(_._2) > 0 && rows.count(!_._2) > 0)
  }

  test("host_frontier_rank conserves fixed-point mass and stays positive") {
    val ranks = Crawl.hostFrontierRank(spark, dir)
      .select("host", "rank_fp").as[(String, Long)].collect()
    assert(ranks.length == 53) // sf0.001 has 500 docs -> all 53 hosts hit
    assert(ranks.forall(_._2 > 0L))
    // mass <= SCALE (teleport + damped contributions can only lose mass
    // to integer truncation and dangling leak, never create it), and the
    // leak is bounded: at damping 0.85 the surviving mass stays > 0.15
    val total = ranks.map(_._2).sum
    assert(total <= 1000000000000L, s"mass created: $total")
    assert(total > 150000000000L, s"mass over-leaked: $total")
    // ranks differentiate (the multiplicative maps skew in-degree)
    assert(ranks.map(_._2).distinct.length > 10)
  }

  test("crawl_budget_alloc: Hamilton apportionment conserves the budget") {
    val rows = Crawl.crawlBudgetAlloc(spark, dir)
      .select("host", "allowed_n", "rank_fp", "quota")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 53)
    rows.foreach { case (h, allowedN, rankFp, quota) =>
      assert(quota >= 0L && quota <= allowedN, s"$h quota $quota > cap $allowedN")
      assert(rankFp > 0L)
    }
    // uncapped Hamilton shares sum EXACTLY to the budget; the robots cap
    // can only forfeit budget, never create it
    val spent = rows.map(_._4).sum
    assert(spent <= 1000L, s"overspent: $spent")
    // the fixture's caps bind somewhere (~19 allowed URLs/host at sf0.001
    // vs ~19 quota units/host), so spent < B proves the cap leg runs;
    // if nothing capped, spent == B proves conservation. Either way the
    // uncapped reconstruction must hit B exactly:
    val ranksTotal = rows.map(_._3).sum
    val base = rows.map(r => 1000L * r._3 / ranksTotal)
    val leftover = 1000L - base.sum
    assert(leftover >= 0 && leftover < rows.length,
      s"largest-remainder leftover out of range: $leftover")
  }

  test("crawl_trap_detect flags exactly the calendar-template hosts") {
    val rows = Crawl.crawlTrapDetect(spark, dir)
      .select("host", "n_urls", "n_templates", "ratio_fp", "trap")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(rows.length == 53)
    rows.foreach { case (host, nUrls, nTmpl, ratioFp, trap) =>
      val k = host.stripPrefix("h").takeWhile(_.isDigit).toLong
      if (k % 3 == 0) {
        // calendar host: every fetch a fresh URL over ONE template
        assert(nTmpl == 1L && trap && ratioFp == nUrls * 1000000L, s"$host")
      } else {
        // 4-page static site: ratio exactly 1.0
        assert(nUrls <= 4L && nUrls == nTmpl && ratioFp == 1000000L && !trap,
          s"$host")
      }
    }
  }

  test("recrawl_schedule: integer intervals respect the ceiling and formula") {
    val rows = Crawl.recrawlSchedule(spark, dir)
      .select("page", "n_fetches", "n_changes", "interval_sec")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (page, n, x, iv) =>
      assert(x >= 0 && x < n, s"page $page: changes $x of $n fetches")
      val raw = 86400L * n / math.max(x, 1L)
      assert(iv == math.min(raw, 2592000L), s"page $page")
      assert(iv > 86400L || n == 1L, s"page $page: raw interval > BASE by algebra")
    }
    // the fixture's value column churns across the band edge, so the
    // OPEN interval occurs; intervals differentiate across pages
    assert(rows.exists(_._4 < 2592000L))
    assert(rows.map(_._4).distinct.length > 5)
  }

  test("recrawl ceiling: a never-changing page parks at 30 days") {
    // constructed fetch log: page 1 stable for 40 fetches (raw interval
    // 86400*40 > 30 d -> ceiling); page 2 alternates every fetch (raw
    // 86400*40/39 ~ 1.026 d, open)
    val log = (0 until 40).flatMap { i =>
      Seq((1L, 7L, i.toLong, i.toLong), (2L, (i % 2).toLong, i.toLong, 100L + i))
    }.toDF("page", "sig", "ts_sec", "event_id")
    val got = Crawl.recrawlFrom(log)
      .select("page", "n_changes", "interval_sec")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 0L, 2592000L)))
    assert(got(1) == ((2L, 39L, 86400L * 40L / 39L)))
  }

  test("anchor_topk survives token-empty documents (ANSI element_at trap)") {
    // a punctuation-only / non-latin doc tokenizes to an empty array;
    // under the session default ANSI mode a bare element_at would abort
    // the job — the operator must null-and-drop it like the oracle does
    val tmp = java.nio.file.Files.createTempDirectory("crawl_empty").toString
    try {
      Seq(
        (0L, "real words here", "en", "web", 15L),
        (1L, "!!! ... ???", "en", "web", 11L),
        (2L, "", "en", "web", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val rows = Crawl.anchorTopk(spark, tmp)
        .as[(String, String, Long)].collect()
      assert(rows.length == 1 && rows.head._2 == "real")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("recrawl_incremental merge == full recompute (boundary flip exact)") {
    val full = Crawl.recrawlSchedule(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val merged = Crawl.recrawlIncremental(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(merged == full)
    assert(merged.nonEmpty)
  }

  test("anchor_topk equals the window-plan rows, at most k per host") {
    val native = Crawl.anchorTopk(spark, dir)
    val counts = native.groupBy("host").count()
      .select("count").as[Long].collect()
    assert(counts.forall(_ <= 3L))
    // reference plan: full window sort + row_number filter
    val base = graft.sources.Tables.documents(spark, dir).select(
        concat(lit("h"), (col("doc_id") * 7L + 11L) % 53L, lit(".example.org")).as("host"),
        try_element_at(graft.operators.Dedup.tokens(col("text")), lit(1)).as("anchor"))
      .filter(col("anchor").isNotNull)
      .groupBy("host", "anchor").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("host").orderBy(col("cnt").desc, col("anchor").asc)
    val windowed = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("host", "anchor", "cnt")
    val got = native.as[(String, String, Long)].collect().toSet
    val want = windowed.as[(String, String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
