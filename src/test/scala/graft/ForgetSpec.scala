package graft

import graft.operators.{Dedup, Forget, Similarity}
import graft.streaming.{StreamingEmbeddingDedup, StreamingIncrementalDedup,
  StreamingSpanDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten through the persisted dedup bases
  * ([[Forget]]): after an artifact-level delete, a RE-RUN incremental
  * dedup must never reference a deleted doc — not as a hit partner, not
  * as a span suppressor, not as an embedding pair — and (with corpus
  * access) a digest whose keeper died but whose text survives is
  * re-keyed, not forgotten. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // ≥3 tokens (shingles) and ≥10 tokens (spans) where the case needs them
  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val tB = "one two three four five six seven eight nine ten eleven"
  private val tC = "red green blue cyan magenta yellow black white gray pink"

  test("forgotten text stops hitting; re-run dedup references no deleted doc") {
    val base = docsDf(1L -> tA, 2L -> tB, 3L -> tC)
    val baseDir = tmp("graft-forget-incr")
    StreamingIncrementalDedup.initBase(base, baseDir)

    // forget doc 2 (sole owner of tB), no corpus access -> fp dropped
    Forget.forgetIncrementalBase(spark, baseDir, Seq(2L).toDF("doc_id"))

    val dig = spark.read.parquet(s"$baseDir/digests")
    val sh = spark.read.parquet(s"$baseDir/shingles")
    assert(dig.filter(col("base_doc_id") === 2L).count() == 0)
    assert(sh.filter(col("doc_id") === 2L).count() == 0)
    assert(dig.count() == 2) // tA, tC remain

    // a new doc repeating the forgotten text must come back CLEAN
    var hits = Set.empty[(Long, Long)]
    val onBatch = StreamingIncrementalDedup.onBatch(baseDir, growBase = true,
      (h, _) => hits ++= h.select("doc_id", "base_doc_id")
        .as[(Long, Long)].collect())
    onBatch(docsDf(100L -> tB), 0L)
    assert(hits.isEmpty, s"forgotten text must not hit: $hits")
    // ...and in grow mode it re-enters the base as novel under ITS id
    val regrown = spark.read.parquet(s"$baseDir/digests")
      .filter(col("fp") === md5(lit(tB)))
      .select("base_doc_id").as[Long].collect().toSeq
    assert(regrown == Seq(100L), s"tB must re-enter under doc 100: $regrown")

    // while a still-known text keeps hitting its (surviving) keeper
    hits = Set.empty
    onBatch(docsDf(101L -> tA), 1L)
    assert(hits == Set((101L, 1L)))
  }

  test("keeper with a surviving copy is re-keyed, never referenced again") {
    // doc 1 and doc 5 share tA; 1 is the keeper. Forget 1 WITH corpus
    // access -> fp re-keys to 5; shingle rows move to 5.
    val corpus = docsDf(1L -> tA, 2L -> tB, 5L -> tA)
    val baseDir = tmp("graft-forget-rekey")
    StreamingIncrementalDedup.initBase(corpus, baseDir)

    val survivors = corpus.filter(col("doc_id") =!= 1L)
    Forget.forgetIncrementalBase(spark, baseDir, Seq(1L).toDF("doc_id"),
      rekeyFrom = Some(survivors))

    val dig = spark.read.parquet(s"$baseDir/digests")
    val sh = spark.read.parquet(s"$baseDir/shingles")
    assert(dig.filter(col("base_doc_id") === 1L).count() == 0)
    assert(sh.filter(col("doc_id") === 1L).count() == 0)
    val tAKeeper = dig.filter(col("fp") === md5(lit(tA)))
      .select("base_doc_id").as[Long].collect().toSeq
    assert(tAKeeper == Seq(5L), s"tA must re-key to 5: $tAKeeper")
    // shingle rows re-emitted under the new keeper, same content
    assert(sh.filter(col("doc_id") === 5L).count() ==
      Dedup.shingleRows(docsDf(5L -> tA)).count())

    // a fresh copy of tA now hits the RE-KEYED keeper, not the deleted doc
    var hits = Set.empty[(Long, Long)]
    StreamingIncrementalDedup.onBatch(baseDir, growBase = false,
      (h, _) => hits ++= h.select("doc_id", "base_doc_id")
        .as[(Long, Long)].collect())(docsDf(102L -> tA), 0L)
    assert(hits == Set((102L, 5L)), s"must hit the new keeper: $hits")
  }

  test("span base: killed-only spans dropped, survivor-attested spans kept") {
    // tA owned solely by doc 1; tB attested by docs 2 AND 3
    val corpus = docsDf(1L -> tA, 2L -> tB, 3L -> tB)
    val baseDir = tmp("graft-forget-span")
    StreamingSpanDedup.initBase(corpus, baseDir)
    val before = spark.read.parquet(s"$baseDir/spans").count()

    Forget.forgetSpanBase(spark, baseDir,
      killedDocs = corpus.filter(col("doc_id") === 1L),
      survivors = corpus.filter(col("doc_id") =!= 1L))

    val spans = spark.read.parquet(s"$baseDir/spans")
    val tASpans = Dedup.spanRows(docsDf(1L -> tA)).select("h")
    val tBSpans = Dedup.spanRows(docsDf(2L -> tB)).select("h")
    assert(spans.join(tASpans, Seq("h"), "left_semi").count() == 0,
      "doc 1's spans must be forgotten")
    assert(spans.join(tBSpans, Seq("h"), "left_semi").count() ==
      tBSpans.count(), "survivor-attested spans must remain")
    assert(spans.count() < before)

    // re-run: a new doc repeating the forgotten span text keeps ALL its
    // tokens (first-occurrence semantics restart), while tB is still cut
    val keptA = Dedup.spanCleanAgainstBase(docsDf(200L -> tA),
        spark.read.parquet(s"$baseDir/spans"))
      .select("n_tokens", "kept_tokens").as[(Long, Long)].collect().head
    assert(keptA._2 == keptA._1,
      s"forgotten span must no longer suppress new text: $keptA")
    val keptB = Dedup.spanCleanAgainstBase(docsDf(201L -> tB),
        spark.read.parquet(s"$baseDir/spans"))
      .select("n_tokens", "kept_tokens").as[(Long, Long)].collect().head
    assert(keptB._2 < keptB._1,
      s"still-attested span must keep cleaning: $keptB")
  }

  test("embedding base: deleted vectors pair with nothing after forget") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val baseDir = tmp("graft-forget-emb")
    StreamingEmbeddingDedup.initBase(spark, dir,
      Similarity.normalized(emb), baseDir)

    val killIds = Seq.range(0L, 50L).toDF("vec_id")
    Forget.forgetEmbeddingBase(spark, baseDir, killIds)
    val cells = spark.read.parquet(s"$baseDir/cells")
    assert(cells.filter(col("vec_id") < 50L).count() == 0)
    assert(cells.count() > 0)

    // re-probing an exact copy of a deleted vector (sim 1.0 with it)
    // finds no partner among the deleted ids
    val probe = Similarity.cellIndex(
      Similarity.normalized(emb.filter(col("vec_id") === 7L)
        .withColumn("vec_id", col("vec_id") + 100000L)),
      spark.read.parquet(s"$baseDir/centroids"))
    val pairs = Similarity.pairsAgainstBase(probe,
      spark.read.parquet(s"$baseDir/cells"))
    val partners = pairs.select("v2").as[Long].collect().toSet
    assert(!partners.exists(_ < 50L),
      s"no pair may reference a deleted vector: $partners")
  }

  test("url base: killed keeper re-keyed with corpus access, dropped without") {
    import graft.streaming.StreamingUrlDedup
    def urlsDf(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "url")
    // docs 1 and 5 share a canonical URL (different decorations); 1 is
    // the keeper. Doc 2's URL is owned solely by 2.
    val corpus = urlsDf(
      1L -> "http://example.com/a?x=1",
      2L -> "http://example.com/b?y=2",
      5L -> "HTTP://WWW.example.com:80/a?utm_source=z&x=1#f")

    // WITH corpus access: forget 1 -> a re-keys to 5
    val d1 = tmp("graft-forget-url-rekey")
    StreamingUrlDedup.initBase(corpus, d1)
    Forget.forgetUrlBase(spark, d1, Seq(1L).toDF("doc_id"),
      rekeyFrom = Some(corpus.filter(col("doc_id") =!= 1L)))
    val canon1 = spark.read.parquet(s"$d1/canon")
    assert(canon1.filter(col("base_doc_id") === 1L).count() == 0)
    val aKeeper = canon1.filter(col("canon_url") === "http://example.com/a?x=1")
      .select("base_doc_id").as[Long].collect().toSeq
    assert(aKeeper == Seq(5L), s"url must re-key to 5: $aKeeper")
    // a decorated re-crawl hits the RE-KEYED keeper, not the deleted doc
    var hits = Set.empty[(Long, Long)]
    StreamingUrlDedup.onBatch(d1, growBase = false,
      (h, _) => hits ++= h.select("doc_id", "base_doc_id")
        .as[(Long, Long)].collect())(
      urlsDf(300L -> "http://EXAMPLE.com/a?x=1&gclid=q"), 0L)
    assert(hits == Set((300L, 5L)), s"must hit the new keeper: $hits")

    // WITHOUT corpus access: forget 2 -> url dropped, re-enters as novel
    val d2 = tmp("graft-forget-url-drop")
    StreamingUrlDedup.initBase(corpus, d2)
    Forget.forgetUrlBase(spark, d2, Seq(2L).toDF("doc_id"))
    assert(spark.read.parquet(s"$d2/canon")
      .filter(col("base_doc_id") === 2L).count() == 0)
    hits = Set.empty
    StreamingUrlDedup.onBatch(d2, growBase = true,
      (h, _) => hits ++= h.select("doc_id", "base_doc_id")
        .as[(Long, Long)].collect())(
      urlsDf(400L -> "http://example.com/b?y=2"), 0L)
    assert(hits.isEmpty, s"forgotten url must not hit: $hits")
    val regrown = spark.read.parquet(s"$d2/canon")
      .filter(col("canon_url") === "http://example.com/b?y=2")
      .select("base_doc_id").as[Long].collect().toSeq
    assert(regrown == Seq(400L), s"url must re-enter under doc 400: $regrown")
  }

  test("cdc base: killed keeper dropped or re-keyed; content re-enters as novel") {
    import graft.streaming.StreamingCdc
    // doc 1 sole owner of tA's chunks; docs 2 and 5 share tB's (keeper 2)
    val corpus = docsDf(1L -> tA, 2L -> tB, 5L -> tB)

    // WITHOUT corpus access: tA's digests dropped, re-enter under 100
    val d1 = tmp("graft-forget-cdc-drop")
    StreamingCdc.initBase(corpus, d1)
    Forget.forgetCdcBase(spark, d1, Seq(1L).toDF("doc_id"))
    assert(spark.read.parquet(s"$d1/chunks")
      .filter(col("base_doc") === 1L).count() == 0)
    var matches = Set.empty[(Long, Long)]
    StreamingCdc.onBatch(d1, growBase = true,
      (m, _) => matches ++= m.select("doc_id", "base_doc")
        .as[(Long, Long)].collect())(docsDf(100L -> tA), 0L)
    assert(matches.isEmpty, s"forgotten chunks must not match: $matches")
    assert(spark.read.parquet(s"$d1/chunks")
      .filter(col("base_doc") === 100L).count() > 0,
      "tA's chunks must re-enter under doc 100")

    // WITH corpus access: forget keeper 2 -> tB's digests re-key to 5
    val d2 = tmp("graft-forget-cdc-rekey")
    StreamingCdc.initBase(corpus, d2)
    Forget.forgetCdcBase(spark, d2, Seq(2L).toDF("doc_id"),
      rekeyFrom = Some(corpus.filter(col("doc_id") =!= 2L)))
    val chunks2 = spark.read.parquet(s"$d2/chunks")
    assert(chunks2.filter(col("base_doc") === 2L).count() == 0)
    matches = Set.empty
    StreamingCdc.onBatch(d2, growBase = false,
      (m, _) => matches ++= m.select("doc_id", "base_doc")
        .as[(Long, Long)].collect())(docsDf(101L -> tB), 0L)
    assert(matches.nonEmpty && matches.forall(_._2 == 5L),
      s"must match the re-keyed keeper only: $matches")
  }

  test("winnow base: forgotten doc's fingerprints vanish, survivors still attribute") {
    import graft.streaming.StreamingWinnow
    val corpus = docsDf(1L -> tA, 2L -> tB, 3L -> tB)
    val d = tmp("graft-forget-winnow")
    StreamingWinnow.initBase(corpus, d)
    Forget.forgetWinnowBase(spark, d, Seq(1L).toDF("doc_id"))
    assert(spark.read.parquet(s"$d/fps")
      .filter(col("doc_id") === 1L).count() == 0)
    // a fresh copy of tA attributes to NOTHING; tB still attributes to
    // both surviving carriers
    var m = Set.empty[(Long, Long)]
    val body = StreamingWinnow.onBatch(d, growBase = false,
      (mm, _) => m ++= mm.select("batch_doc", "base_doc")
        .as[(Long, Long)].collect())
    body(docsDf(200L -> tA), 0L)
    assert(m.isEmpty, s"forgotten fingerprints must not attribute: $m")
    body(docsDf(201L -> tB), 1L)
    assert(m == Set((201L, 2L), (201L, 3L)), s"survivors must attribute: $m")
  }

  test("recrawl state: forgotten page leaves the schedule, re-enters as new") {
    import graft.streaming.StreamingRecrawl
    def logDf(rows: (Long, Long, Long, Long)*): DataFrame =
      rows.toDF("page", "sig", "ts_sec", "event_id")
    val d = tmp("graft-forget-recrawl")
    // page 3: two fetches, one change; page 8: one fetch
    StreamingRecrawl.initBase(
      logDf((3L, 1L, 0L, 0L), (3L, 2L, 10L, 1L), (8L, 1L, 0L, 2L)), d)
    Forget.forgetRecrawlState(spark, d, Seq(3L).toDF("page"))
    val sched = StreamingRecrawl.schedule(spark, d)
    assert(sched.filter(col("page") === 3L).count() == 0,
      "forgotten page must leave the schedule")
    assert(sched.filter(col("page") === 8L).count() == 1,
      "surviving page must keep its schedule")
    // a later fetch of the forgotten page re-enters with FRESH history:
    // n=1 and NO boundary flip against the forgotten signature
    var got: Option[(Long, Long)] = None
    StreamingRecrawl.onBatch(d, (s, _) =>
      got = Some(s.filter(col("page") === 3L)
        .select("n_fetches", "n_changes").as[(Long, Long)].collect().head))(
      logDf((3L, 5L, 20L, 3L)), 0L)
    assert(got.contains((1L, 0L)),
      s"page must re-enter as new (n=1, x=0): $got")
  }

  test("crossmodal labels: killed component-min relabels; cut vertex splits with edges") {
    import graft.streaming.StreamingCrossmodal
    def edgesDf(rows: (Long, Long)*): DataFrame = rows.toDF("d1", "d2")
    def labelRows(df: DataFrame): Set[(Long, Long)] =
      df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    // component A: chain 1-2-3 (label 1); component B: 10-11 (label 10)
    val baseLabels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("doc_id", "cluster_id")

    // forget 1 (the component min) WITH edges: survivors re-close to 2;
    // the untouched component passes through
    val d1 = tmp("graft-forget-xm-min")
    StreamingCrossmodal.initBase(baseLabels, d1)
    Forget.forgetCrossmodalLabels(spark, d1, Seq(1L).toDF("doc_id"),
      survEdges = Some(edgesDf(2L -> 3L, 10L -> 11L)))
    assert(labelRows(StreamingCrossmodal.labels(spark, d1)) ==
      Set((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L)))

    // forget 2 (a CUT VERTEX) WITH edges: docs 1 and 3 split into
    // singletons (absent == singleton, the read contract)
    val d2 = tmp("graft-forget-xm-cut")
    StreamingCrossmodal.initBase(baseLabels, d2)
    Forget.forgetCrossmodalLabels(spark, d2, Seq(2L).toDF("doc_id"),
      survEdges = Some(edgesDf(10L -> 11L)))
    assert(labelRows(StreamingCrossmodal.labels(spark, d2)) ==
      Set((10L, 10L), (11L, 10L)))

    // forget 1 WITHOUT edges: the artifact cannot see splits — the
    // conservative keep-together relabel to the min survivor
    val d3 = tmp("graft-forget-xm-noedges")
    StreamingCrossmodal.initBase(baseLabels, d3)
    Forget.forgetCrossmodalLabels(spark, d3, Seq(1L).toDF("doc_id"))
    assert(labelRows(StreamingCrossmodal.labels(spark, d3)) ==
      Set((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L)))

    // the rewritten base keeps streaming: an edge re-attaching the
    // split-off 3 to component B merges them under min id 3
    var delta = Set.empty[(Long, Long)]
    StreamingCrossmodal.onBatch(d2,
      (df, _) => delta = labelRows(df))(edgesDf(3L -> 10L), 5L)
    assert(delta == Set((3L, 3L), (10L, 3L), (11L, 3L)), s"delta: $delta")
    assert(labelRows(StreamingCrossmodal.labels(spark, d2)) ==
      Set((3L, 3L), (10L, 3L), (11L, 3L)))
  }
}
