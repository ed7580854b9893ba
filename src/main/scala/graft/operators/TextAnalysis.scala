package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: per-document
  * statistics / quality score, n-gram-lexicon language ID, token counting,
  * and content fingerprinting. All are single-pass narrow projections —
  * no shuffle at all except where a group-by is the point — so they scale
  * linearly with input splits.
  *
  * Determinism: every ratio is a division of exact integers (counts), so
  * doubles match across engines bit-for-bit; fingerprints are md5-derived.
  */
object TextAnalysis {

  import Dedup.{tokens, tokensSql}

  private[operators] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is",
    "that", "it", "for")

  /** Tiny per-language function-word lexicons for the heuristic language
    * ID (the classic stopword-hit approach; at scale you'd plug a real
    * n-gram model into the same shape). */
  private val langLexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein",
      "eine", "zu", "nicht", "auf"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it",
      "for", "on", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es",
      "los", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "dans", "que",
      "pour", "les", "des"),
  )

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(
      array(words.map(lit): _*), t)))

  private def countInSql(toks: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toks, t -> list_contains($arr, t)))"
  }

  /** Per-document statistics + a rational-arithmetic quality score in
    * [0,1]: length component x type-token-ratio component x stopword
    * component (each a clipped integer ratio — deterministic in IEEE). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    textStatsOf(Tables.documents(spark, dir))

  /** [[textStats]] over an arbitrary (doc_id, text, ...) frame — lets
    * pipeline compositions (e.g. [[Corpus.corpusClean]]) run the same
    * stats pass post-filter without a second scan or a join. */
  def textStatsOf(docs: DataFrame): DataFrame = {
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop", countIn(col("toks"), stopwords).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("avg_token_len",
        (col("len_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        (least(col("n_tokens"), lit(100L)).cast("double") / 100.0) *
          least(col("ttr") * 2.0, lit(1.0)) *
          (lit(0.5) + least(col("stop_ratio") * 2.0, lit(0.5))))
      .select("doc_id", "len_chars", "n_tokens", "n_distinct", "n_stop",
        "ttr", "stop_ratio", "avg_token_len", "quality_score")
  }

  /** CTE chain `t, s` + final-select body for the stats pass, with a
    * pluggable source relation — single source of truth for
    * [[textStatsSql]] and composed-pipeline oracles. */
  private[operators] def textStatsCtes(src: String): String = {
    val stops = countInSql("toks", stopwords)
    s"""t AS (
       |  SELECT doc_id, text, ${tokensSql("text")} AS toks FROM $src
       |), s AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS len_chars,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST($stops AS BIGINT) AS n_stop
       |  FROM t WHERE len(toks) > 0
       |)""".stripMargin
  }

  private[operators] val textStatsSelect: String =
    """SELECT doc_id, len_chars, n_tokens, n_distinct, n_stop,
      |  CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
      |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
      |  CAST(len_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
      |  (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0) *
      |    least(CAST(n_distinct AS DOUBLE) / n_tokens * 2.0, 1.0) *
      |    (0.5 + least(CAST(n_stop AS DOUBLE) / n_tokens * 2.0, 0.5)) AS quality_score
      |FROM s""".stripMargin

  val textStatsSql: String =
    s"""WITH ${textStatsCtes("documents")}
       |$textStatsSelect""".stripMargin

  /** Heuristic language ID: per-language function-word hit counts, argmax
    * with a fixed priority order (de > en > es > fr) on ties. The `lang`
    * column rides along so downstream can measure agreement.
    *
    * Shape: explode tokens ONCE and count hits with conditional aggregates
    * against the lexicons. The fold-of-withColumns version computed each
    * score as a higher-order-function expression that Catalyst's
    * projection collapse then inlined into every CASE branch — the
    * interpreted tokenization ran ~16x per row (measured 91x at a 10x
    * scale probe). Exploding costs one shuffle but tokenizes once. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .filter(col("t") =!= "")
    val scoreCols = langLexicons.map { case (code, lex) =>
      count(when(col("t").isInCollection(lex), 1)).as(s"s_$code")
    }
    val scores = toks.groupBy("doc_id").agg(scoreCols.head, scoreCols.tail: _*)
    docs.select("doc_id", "lang")
      .join(scores, Seq("doc_id"), "left")
      .na.fill(0L, langLexicons.map { case (c, _) => s"s_$c" })
      .withColumn("pred_lang",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
          col("s_de") >= col("s_fr"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .select("doc_id", "lang", "pred_lang", "s_de", "s_en", "s_es", "s_fr")
  }

  val langIdSql: String = {
    val cols = langLexicons.map { case (code, lex) =>
      s"CAST(${countInSql("toks", lex)} AS BIGINT) AS s_$code"
    }.mkString(",\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, lang, ${tokensSql("text")} AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, lang,
       |    $cols
       |  FROM t
       |)
       |SELECT doc_id, lang,
       |  CASE
       |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |    WHEN s_es >= s_fr THEN 'es'
       |    ELSE 'fr' END AS pred_lang,
       |  s_de, s_en, s_es, s_fr
       |FROM s""".stripMargin
  }

  /** Token counting two ways: whitespace tokens and regex word/number
    * pieces (the BPE-ish pre-tokenization shape).
    *
    * All three counts come from ONE byte scan
    * ([[graft.functions.TokenCounts]], codegen'd) instead of three regex
    * `split` passes — this was the bench's most expensive query and the
    * regex passes were pure duplicated CPU (VERDICT r8 item 7). Count
    * semantics are unchanged (TokenKernelSpec pins kernel == regex on the
    * fixture and on adversarial strings); the regex formulation remains
    * the oracle's side ([[tokenCountSql]]). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tc", graft.functions.TextExprs.tokenCounts(col("text")))
      .select(col("doc_id"),
        col("tc").getItem(0).as("n_ws_tokens"),
        col("tc").getItem(1).as("n_word_pieces"),
        col("tc").getItem(2).as("n_digit_runs"))

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
       |    AS n_ws_tokens,
       |  CAST(len(${tokensSql("text")}) AS BIGINT) AS n_word_pieces,
       |  CAST(len(list_filter(string_split_regex(lower(text), '[^0-9]+'), x -> x <> '')) AS BIGINT)
       |    AS n_digit_runs
       |FROM documents""".stripMargin

  /** Content fingerprints: full md5, a 60-bit integer prefix (join-friendly
    * key), and a normalized-text md5 (whitespace-insensitive). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("md5_hex", md5(col("text")))
      .withColumn("fp60",
        conv(substring(col("md5_hex"), 1, 15), 16, 10).cast("long"))
      .withColumn("norm_md5", md5(concat_ws(" ", tokens(col("text")))))
      .select("doc_id", "md5_hex", "fp60", "norm_md5")

  val fingerprintSql: String =
    s"""SELECT doc_id, md5(text) AS md5_hex,
       |  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp60,
       |  md5(list_aggregate(${tokensSql("text")}, 'string_agg', ' ')) AS norm_md5
       |FROM documents""".stripMargin

  private val chunkSize = 200
  private val chunkStride = 150

  /** Fixed-size overlapping character chunks — the standard LLM
    * training-data windowing step (size 200, stride 150 here; at scale the
    * same shape carries token-budgeted chunks). Chunk starts are 0,
    * stride, 2*stride, ... while start < len, so every document yields
    * ceil(len/stride) chunks and consecutive chunks overlap by
    * size - stride chars. Pure explode of a generated offset sequence: no
    * shuffle, output partitioning follows the input splits, and chunk
    * count per row is bounded by len/stride (no skew amplification). */
  def docChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .withColumn("i",
        explode(sequence(lit(0L), floor((length(col("text")) - 1) / chunkStride).cast("long"))))
      .withColumn("chunk_id", col("i"))
      .withColumn("start", col("i") * chunkStride)
      .withColumn("chunk_text",
        substring(col("text"), (col("start") + 1).cast("int"), lit(chunkSize)))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .select("doc_id", "chunk_id", "start", "chunk_len", "chunk_text")

  val docChunksSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, (length(text) - 1) // $chunkStride)) AS i
       |  FROM documents WHERE length(text) > 0
       |)
       |SELECT doc_id, i AS chunk_id, i * $chunkStride AS "start",
       |  CAST(length(substr(text, CAST(i * $chunkStride + 1 AS BIGINT), $chunkSize)) AS BIGINT) AS chunk_len,
       |  substr(text, CAST(i * $chunkStride + 1 AS BIGINT), $chunkSize) AS chunk_text
       |FROM c""".stripMargin

  /** Cross-document CHUNK dedup — boilerplate detection: chunks (the
    * [[docChunks]] grid) whose exact text recurs, with occurrence and
    * distinct-document counts plus a deterministic keeper — the
    * lexicographically smallest (doc_id, chunk_id), as a `min` over the
    * ordered struct (both engines order structs field-by-field; ADVICE r6
    * killed the old `doc_id*1000+chunk_id` packing, which silently
    * corrupted keepers for documents past chunk_id 999 — and the oracle,
    * computing the same packing, could never catch it). Headers, nav
    * bars, and license blocks dominate this table in a real crawl; a
    * cleaning pass drops non-keeper occurrences. One groupBy on the
    * chunk digest — the md5 keeps full chunk text out of the shuffle. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    docChunks(spark, dir)
      .groupBy(md5(col("chunk_text")).as("chunk_md5"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"),
        min(struct(col("doc_id"), col("chunk_id"))).as("keeper"))
      .filter(col("n_occurrences") > 1)
      .select(col("chunk_md5"), col("n_occurrences"), col("n_docs"),
        col("keeper.doc_id").as("keeper_doc_id"),
        col("keeper.chunk_id").as("keeper_chunk_id"))

  val chunkDedupSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, (length(text) - 1) // $chunkStride)) AS i
       |  FROM documents WHERE length(text) > 0
       |), ch AS (
       |  SELECT doc_id, i AS chunk_id,
       |    substr(text, CAST(i * $chunkStride + 1 AS BIGINT), $chunkSize) AS chunk_text
       |  FROM c
       |), g AS (
       |  SELECT md5(chunk_text) AS chunk_md5, count(*) AS n_occurrences,
       |    count(DISTINCT doc_id) AS n_docs,
       |    min({'doc_id': doc_id, 'chunk_id': chunk_id}) AS keeper
       |  FROM ch GROUP BY 1
       |)
       |SELECT chunk_md5, n_occurrences, n_docs,
       |  keeper.doc_id AS keeper_doc_id, keeper.chunk_id AS keeper_chunk_id
       |FROM g WHERE n_occurrences > 1""".stripMargin

  private val keywordsPerDoc = 3

  /** Keyword extraction: top-3 most frequent non-stopword terms (len >= 3)
    * per document, by count desc then term asc. Integer counts only — no
    * tf-idf floats, whose libm log differs across engines at the ulp
    * level. One explode + one (doc_id, term) count + one per-doc top-k
    * window: two hash shuffles on keys that can't concentrate (doc_id is
    * unique; (doc_id, term) is finer). */
  def docKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("term"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(length(col("term")) >= 3 && !col("term").isInCollection(stopwords))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= keywordsPerDoc)
      .select("doc_id", "rank", "term", "cnt")
  }

  val docKeywordsSql: String = {
    val stops = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
       |), f AS (
       |  SELECT doc_id, term, count(*) AS cnt FROM t
       |  WHERE length(term) >= 3 AND NOT list_contains($stops, term)
       |  GROUP BY doc_id, term
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, term) AS "rank"
       |  FROM f
       |)
       |SELECT doc_id, "rank", term, cnt FROM r WHERE "rank" <= $keywordsPerDoc""".stripMargin
  }

  /** Repetition signals — the classic LLM corpus quality filters
    * (duplicate-line fraction and most-frequent-bigram mass, the
    * Gopher-rules shape): heavily repeated boilerplate scores high on
    * both and gets culled before training.
    *
    * Contract: documents with zero non-blank lines emit NO row (same
    * convention as [[textStats]]' n_tokens > 0 filter) — a culling
    * consumer must inner-join and treat absence as reject, not keep.
    *
    * Line stats are pure array expressions (no shuffle); the bigram mode
    * goes through explode + (doc_id, bigram) count + per-doc max — the
    * docKeywords shape, two hash shuffles on keys that cannot
    * concentrate. Fractions are exact integer ratios. */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("ls",
        filter(transform(split(col("text"), "\n"), l => trim(l)), l => l =!= ""))
      .withColumn("n_lines", size(col("ls")).cast("long"))
      .filter(col("n_lines") > 0)
      .withColumn("n_distinct_lines",
        size(array_distinct(col("ls"))).cast("long"))
      .withColumn("dup_line_frac",
        lit(1.0) - col("n_distinct_lines").cast("double") / col("n_lines"))
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
    docs.join(bg, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0,
          col("top_bigram_n").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0)))
      .select("doc_id", "n_lines", "n_distinct_lines", "dup_line_frac",
        "n_bigrams", "top_bigram_n", "top_bigram_frac")
  }

  val docRepetitionSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
       |      x -> x <> '') AS ls
       |  FROM documents
       |), l AS (
       |  SELECT doc_id, text,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_distinct(ls)) AS BIGINT) AS n_distinct_lines
       |  FROM d WHERE len(ls) > 0
       |), t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM l
       |), bgx AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
       |  FROM t WHERE len(toks) >= 2
       |), bc AS (
       |  SELECT doc_id, bg, count(*) AS c FROM bgx GROUP BY 1, 2
       |), bs AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |    CAST(max(c) AS BIGINT) AS top_bigram_n
       |  FROM bc GROUP BY 1
       |)
       |SELECT l.doc_id, n_lines, n_distinct_lines,
       |  1.0 - CAST(n_distinct_lines AS DOUBLE) / n_lines AS dup_line_frac,
       |  coalesce(n_bigrams, 0) AS n_bigrams,
       |  coalesce(top_bigram_n, 0) AS top_bigram_n,
       |  CASE WHEN coalesce(n_bigrams, 0) > 0
       |    THEN CAST(top_bigram_n AS DOUBLE) / n_bigrams ELSE 0.0 END
       |    AS top_bigram_frac
       |FROM l LEFT JOIN bs ON l.doc_id = bs.doc_id""".stripMargin

  private val vocabK = 50

  /** Corpus-wide vocabulary head: top-50 terms by total occurrence count
    * (ties broken by term), with document frequency — the first step of
    * any tokenizer/vocab build. Shape at 100 TB: one explode, one
    * groupBy(term) with map-side partial aggregation (the shuffle carries
    * one row per (partition, term), not per token), distinct doc counting
    * via Spark's two-phase distinct-agg expand, and the final top-k is
    * TakeOrdered (per-partition heap + k-row driver merge), never a
    * global sort. */
  def vocabTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n_total"), countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_total").desc, col("term"))
      .limit(vocabK)

  val vocabTopkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
       |)
       |SELECT term, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
       |FROM t GROUP BY 1
       |ORDER BY n_total DESC, term LIMIT $vocabK""".stripMargin

  // PII scrub patterns — a deliberately RE2-and-Java-compatible subset
  // (explicit char classes, no \s/\w whose definitions differ between
  // engines; the md5 oracle would catch any divergence).
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[A-Za-z0-9./_%#?=&;:~+-]+"

  /** PII scrubbing — the redaction pass an LLM corpus runs before
    * training: URLs then emails replaced with placeholder tokens
    * (URL first, so an email-looking userinfo inside a URL is already
    * gone). Match counts are taken on the ORIGINAL text. Pure per-row
    * projection: no shuffle, scales with input splits; the md5 of the
    * scrubbed text makes the transform oracle-checkable without shipping
    * the full cleaned corpus through the compare. */
  def corpusScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_urls",
        size(regexp_extract_all(col("text"), lit(urlRe), lit(0))).cast("long"))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("text"), urlRe, "<URL>"),
          emailRe, "<EMAIL>"))
      .withColumn("clean_len", length(col("clean")).cast("long"))
      .withColumn("clean_md5", md5(col("clean")))
      .select("doc_id", "n_emails", "n_urls", "clean_len", "clean_md5")

  val corpusScrubSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$urlRe')) AS BIGINT) AS n_urls,
       |  CAST(length(regexp_replace(regexp_replace(text, '$urlRe', '<URL>', 'g'),
       |    '$emailRe', '<EMAIL>', 'g')) AS BIGINT) AS clean_len,
       |  md5(regexp_replace(regexp_replace(text, '$urlRe', '<URL>', 'g'),
       |    '$emailRe', '<EMAIL>', 'g')) AS clean_md5
       |FROM documents""".stripMargin

  // ---- PII scrub v2: credit-card (Luhn), phone, IPv4 ---------------------

  /** Builds the scrub-v2 query for either dialect from ONE recipe, so the
    * Spark plan and the DuckDB oracle cannot drift: every construct that
    * differs between engines (higher-order list functions, regexp flags,
    * string casts) goes through the tiny per-dialect emitters below;
    * everything else is shared text. Patterns avoid backslash escapes
    * entirely (`[.]` instead of `\.`) so the same literal survives both
    * SQL string parsers, and avoid `\s`/`\w` whose definitions differ
    * between RE2 (DuckDB) and java.util.regex (Spark).
    *
    * The corpus fixture is digit-free (documents.parquet carries prose
    * tokens only), so the numeric-PII passes would never fire on raw
    * `text`; each doc is therefore augmented with DETERMINISTIC PII
    * derived from doc_id by the same integer arithmetic in both engines —
    * including a card number whose Luhn CHECK DIGIT is computed in-query
    * (so validation sees real variety), a same-digits card with a wrong
    * check digit that must survive scrubbing, and an IPv4 whose first
    * octet ranges over 0..299 so ~15% of docs carry an invalid address
    * that must also survive. That makes the oracle exercise the whole
    * validator, not just the regex.
    *
    * Scrub order: URL → email → card → phone → IPv4. URLs first (an
    * email-looking userinfo inside a URL is already gone — v1's rule);
    * cards before phones (a separator-grouped card could otherwise be
    * half-eaten by the phone pass). Card/IP candidates are regex matches
    * VALIDATED in a list filter — Luhn mod-10 over the reversed digit
    * string as pure integer math, octets <= 255 — and only validated
    * literals are replaced, longest-first (length-keyed descending sort)
    * so one candidate can never corrupt another's occurrence.
    *
    * 100 TB shape: identical to v1 — a pure per-row projection, no
    * shuffle, no join; the per-candidate validator lists are bounded by
    * the match count in one document. */
  private def scrubV2Sql(duck: Boolean, table: String,
      keepText: Boolean = false): String = {
    def cs(e: String) = if (duck) s"CAST($e AS VARCHAR)" else s"CAST($e AS STRING)"
    def xform(l: String, v: String, b: String) =
      if (duck) s"list_transform($l, $v -> $b)" else s"transform($l, $v -> $b)"
    def filt(l: String, v: String, b: String) =
      if (duck) s"list_filter($l, $v -> $b)" else s"filter($l, $v -> $b)"
    def sumL(l: String) =
      if (duck) s"list_sum($l)" else s"aggregate($l, 0, (a, x) -> a + x)"
    def sz(l: String) = if (duck) s"len($l)" else s"size($l)"
    def exAll(s: String, p: String) =
      if (duck) s"regexp_extract_all($s, '$p')"
      else s"regexp_extract_all($s, '$p', 0)"
    def repAll(s: String, p: String, r: String) =
      if (duck) s"regexp_replace($s, '$p', '$r', 'g')"
      else s"regexp_replace($s, '$p', '$r')"
    def foldRep(init: String, l: String, tok: String) =
      if (duck) s"list_reduce(list_prepend($init, $l), (a, x) -> replace(a, x, '$tok'))"
      else s"aggregate($l, $init, (a, x) -> replace(a, x, '$tok'))"
    def sortDesc(l: String) =
      if (duck) s"list_sort($l, 'DESC')" else s"sort_array($l, false)"
    def dedup(l: String) = if (duck) s"list_distinct($l)" else s"array_distinct($l)"
    def splitDots(s: String) =
      if (duck) s"string_split($s, '.')" else s"split($s, '[.]')"
    def seqTo(n: String) =
      if (duck) s"generate_series(1, $n)" else s"sequence(1, $n)"

    val urlRe2 = "https?://[A-Za-z0-9./_%#?=&;:~+-]+"
    val emailRe2 = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    val ccRe = "[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,4}"
    val phoneRe = "[0-9]{3}[ -][0-9]{3}[ -][0-9]{4}"
    val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

    /** Luhn weighted digit sum over string expr `b`, positions 1..n from
      * the RIGHT; a digit is doubled (9-capped) when its reversed index j
      * satisfies j % 2 == `dblWhen`. dblWhen=0 validates a full card
      * (check digit at j=1 undoubled); dblWhen=1 computes the sum a
      * 15-digit base needs its check digit for. */
    def luhnSum(b: String, dblWhen: Int, n: String): String = {
      val dig = s"(ascii(substring(reverse($b), j, 1)) - 48)"
      val term = s"CASE WHEN j % 2 = $dblWhen THEN " +
        s"CASE WHEN $dig * 2 > 9 THEN $dig * 2 - 9 ELSE $dig * 2 END " +
        s"ELSE $dig END"
      sumL(xform(seqTo(n), "j", term))
    }
    val ccDigits = "regexp_replace(c, '[^0-9]', ''" + (if (duck) ", 'g')" else ")")
    val luhnOk = s"length($ccDigits) >= 13 AND length($ccDigits) <= 16 " +
      s"AND (${luhnSum(ccDigits, 0, s"length($ccDigits)")}) % 10 = 0"
    val octOk =
      s"${sz(filt(splitDots("c"), "p", "CAST(p AS INT) <= 255"))} = 4"
    // longest-first replace order via a length-keyed descending sort —
    // lexicographic DESC alone would put '99…' before '100…'
    def longestFirst(l: String): String =
      xform(sortDesc(xform(dedup(l), "c",
        s"lpad(${cs("length(c)")}, 2, '0') || ':' || c")), "c", "substring(c, 4)")

    s"""WITH b AS (
       |  SELECT doc_id, text,
       |    lpad(${cs("doc_id % 900 + 100")}, 3, '0') AS d3,
       |    lpad(${cs("doc_id % 9000 + 1000")}, 4, '0') AS d4
       |  FROM $table
       |), p AS (
       |  SELECT doc_id, text, d3, d4, '45391488034' || d4 AS b15,
       |    CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN ' ' ELSE '-' END AS sep
       |  FROM b
       |), pc AS (
       |  SELECT *,
       |    '45391488034' || d4 ||
       |      ${cs(s"(10 - (${luhnSum("b15", 1, "15")}) % 10) % 10")} AS cc16
       |  FROM p
       |), aug AS (
       |  SELECT doc_id,
       |    text || ' contact user.' || ${cs("doc_id")} ||
       |    '@example.org via https://data.example.com/doc/' || ${cs("doc_id")} ||
       |    ' tel ' || d3 || '-555-' || d4 ||
       |    ' card ' || substring(cc16, 1, 4) || sep || substring(cc16, 5, 4) ||
       |      sep || substring(cc16, 9, 4) || sep || substring(cc16, 13, 4) ||
       |    ' alt ' || substring(cc16, 1, 15) ||
       |      ${cs("(CAST(substring(cc16, 16, 1) AS INT) + 5) % 10")} ||
       |    ' host ' || ${cs("doc_id % 300")} || '.17.' ||
       |      ${cs("doc_id % 256")} || '.' || ${cs("doc_id % 100")} AS t0
       |  FROM pc
       |), s1 AS (
       |  SELECT doc_id, ${sz(exAll("t0", urlRe2))} AS n_urls,
       |    ${repAll("t0", urlRe2, "<URL>")} AS t1 FROM aug
       |), s2 AS (
       |  SELECT doc_id, n_urls, ${sz(exAll("t1", emailRe2))} AS n_emails,
       |    ${repAll("t1", emailRe2, "<EMAIL>")} AS t2 FROM s1
       |), c3 AS (
       |  SELECT *, ${filt(exAll("t2", ccRe), "c", luhnOk)} AS cc_hits FROM s2
       |), s3 AS (
       |  SELECT doc_id, n_urls, n_emails, ${sz("cc_hits")} AS n_cards,
       |    ${foldRep("t2", longestFirst("cc_hits"), "<CARD>")} AS t3 FROM c3
       |), s4 AS (
       |  SELECT doc_id, n_urls, n_emails, n_cards,
       |    ${sz(exAll("t3", phoneRe))} AS n_phones,
       |    ${repAll("t3", phoneRe, "<PHONE>")} AS t4 FROM s3
       |), c5 AS (
       |  SELECT *, ${filt(exAll("t4", ipRe), "c", octOk)} AS ip_hits FROM s4
       |), s5 AS (
       |  SELECT doc_id, n_urls, n_emails, n_cards, n_phones,
       |    ${sz("ip_hits")} AS n_ips,
       |    ${foldRep("t4", longestFirst("ip_hits"), "<IP>")} AS t5 FROM c5
       |)
       |SELECT doc_id,
       |  CAST(n_urls AS BIGINT) AS n_urls, CAST(n_emails AS BIGINT) AS n_emails,
       |  CAST(n_cards AS BIGINT) AS n_cards, CAST(n_phones AS BIGINT) AS n_phones,
       |  CAST(n_ips AS BIGINT) AS n_ips,
       |  CAST(length(t5) AS BIGINT) AS clean_len, md5(t5) AS clean_md5${
         if (keepText) ",\n  t5 AS clean_text" else ""}
       |FROM s5""".stripMargin
  }

  private val scrubV2Nonce = new java.util.concurrent.atomic.AtomicLong()

  /** Spec entry: the scrub-v2 pipeline over an arbitrary (doc_id, text)
    * frame, with the cleaned text kept so boundary formats can be
    * asserted on directly (the query surface ships only its md5). */
  private[graft] def corpusScrubV2On(spark: SparkSession, docs: DataFrame)
      : DataFrame = {
    val v = s"graft_scrub2_docs_${scrubV2Nonce.incrementAndGet()}"
    docs.createOrReplaceTempView(v)
    try spark.sql(scrubV2Sql(duck = false, v, keepText = true))
    finally spark.catalog.dropTempView(v)
  }

  /** PII scrub v2 — [[corpusScrub]] widened with the three numeric-PII
    * passes a production corpus pipeline runs before training: Luhn-valid
    * card numbers, NANP-shaped phone numbers, and octet-valid IPv4
    * addresses (invalid candidates deliberately survive). See
    * [[scrubV2Sql]] for the validator design and the deterministic
    * PII augmentation that makes the digit-free fixture exercise it. */
  def corpusScrubV2(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_scrub2_docs_${scrubV2Nonce.incrementAndGet()}"
    Tables.documents(spark, dir).createOrReplaceTempView(v)
    try spark.sql(scrubV2Sql(duck = false, v))
    finally spark.catalog.dropTempView(v)
  }

  val corpusScrubV2Sql: String = scrubV2Sql(duck = true, "documents")

  private val bpeK = 20

  /** BPE-style merge candidates: the K most frequent ADJACENT token
    * pairs across the corpus — the statistic one round of byte-pair /
    * word-pair merge selection maximizes (counted per occurrence, not
    * per document, like a real BPE trainer). Shape at 100 TB: one
    * explode of size(toks)-1 pair strings per document, one partial-agg
    * groupBy(pair) shuffle, TakeOrdered top-k — the vocab_topk shape
    * over pairs. Spark arrays index 0-based vs DuckDB's 1-based lists,
    * so both sides use their explicit 1-based accessor (`element_at` /
    * `l[i]`); the empty guard differs because Spark's
    * `sequence(1, 0)` counts DOWN ([1, 0]) where DuckDB's
    * generate_series yields []. */
  def bpeTopMerges(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
      .select(explode(expr(
        "IF(size(toks) >= 2, transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))), " +
          "array())")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(bpeK)

  val bpeTopMergesSql: String =
    s"""WITH t AS (SELECT ${tokensSql("text")} AS toks FROM documents),
       |p AS (
       |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS pair
       |  FROM t
       |)
       |SELECT pair, count(*) AS n FROM p
       |GROUP BY 1 ORDER BY n DESC, pair LIMIT $bpeK""".stripMargin

  private val bpeRounds = 8
  private val bpeS = "\u0002" // token-start sentinel (never in [a-z0-9 ] tokens)
  private val bpeE = "\u0003" // token-end sentinel

  /** Iterative BPE trainer: [[bpeTopMerges]] is ONE round's candidate
    * statistic; this runs [[bpeRounds]] full merge-select-apply rounds
    * and emits the real MERGE TABLE (round, lhs, rhs, n) — the training
    * artifact a tokenizer ships. Each round: count adjacent pairs over
    * the current token stream, pick the most frequent (ties:
    * lexicographic smallest lhs, rhs — exact integer counts, ASCII-only
    * tokens, so both engines agree), then merge every occurrence
    * greedily left-to-right.
    *
    * The APPLY step is the subtle bit: the token stream is encoded as a
    * sentinel-delimited string (`\\x02 tok \\x03` per token — the
    * sentinels cannot occur in tokens, and merged tokens keep an
    * interior space, which is not a boundary), so one plain-string
    * `replace()` per round IS the greedy non-overlapping left-to-right
    * BPE merge, with identical semantics in Spark and DuckDB (a match
    * can never start inside a replacement: the pattern starts with
    * `\\x02 lhs \\x03` and "lhs rhs" != lhs). Tokens are [a-z0-9]+ so
    * pair literals embed in SQL with no escaping.
    *
    * 100 TB shape: per round, ONE map-side-combinable pair count whose
    * shuffle carries (distinct pairs) rows, one TakeOrdered(1), and one
    * scan-local string replace; the state is re-materialized per round
    * (cache here, checkpoint at scale) so round k never replays rounds
    * 0..k-1. Driver holds only the K merge rows — the classic
    * iterative-trainer shape (k-means, PQ codebooks) applied to BPE. */
  /** Shared trainer core for [[bpeMergeTable]] and [[bpeEncode]]:
    * returns the final sentinel-stream state (doc_id kept so the encode
    * path can attribute pieces) and the merge table. The returned state
    * is STILL CACHED — the sole caller ([[trainedBpe]]) re-materializes
    * it onto checkpoint blocks and unpersists the cache entry. */
  private def bpeTrain(spark: SparkSession, dir: String)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    // LAZY cache per round: the pair-count action below is the first
    // consumer and materializes it, so an up-front eager count() would
    // be a pure extra scan per round (8 of them). The parent round's
    // cache is only dropped AFTER the child materialized (prev/state
    // two-generation window) — unpersisting earlier would make the
    // child recompute the whole replace chain from the scan.
    var state = Tables.documents(spark, dir)
      .select(col("doc_id"), concat(lit(bpeS),
        array_join(tokens(col("text")), bpeE + bpeS), lit(bpeE)).as("s"))
      .filter(col("s") =!= bpeS + bpeE)
      .cache()
    var prev: DataFrame = null
    val toksCol = expr(
      s"filter(split(substring(s, 2, length(s) - 2), '$bpeE$bpeS'), x -> x <> '')")
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var round = 0
    var continue = true
    while (round < bpeRounds && continue) {
      val best = state.select(toksCol.as("toks"))
        .select(explode(expr(
          "IF(size(toks) >= 2, transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS lhs, element_at(toks, i + 1) AS rhs)), " +
            "array())")).as("p"))
        .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .groupBy("lhs", "rhs").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      // state is materialized now; the grandparent cache is safe to drop
      if (prev != null) { prev.unpersist(); prev = null }
      if (best.isEmpty) continue = false
      else {
        val (l, r, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round.toLong, l, r, n))
        val pat = bpeS + l + bpeE + bpeS + r + bpeE
        val rep = bpeS + l + " " + r + bpeE
        val next = state.select(col("doc_id"),
          expr(s"replace(s, '$pat', '$rep')").as("s")).cache()
        prev = state
        state = next
      }
      round += 1
    }
    if (prev != null) prev.unpersist()
    (state, merges.toSeq)
  }

  /** The trained (final state, merge table), memoized per (session, dir)
    * over locally-checkpointed blocks — the trainer is the single most
    * expensive repeated computation in the text family and BOTH its
    * consumers ([[bpeMergeTable]], [[bpeEncode]]) need the same run:
    * exactly the shared-artifact pattern of [[Dedup]]'s shingle index
    * (production materializes the trained tokenizer once; queries read
    * it). Survives the bench's `clearCache`, revalidated per serve,
    * evicted with the session. */
  private val bpeCache = new graft.util.SessionCache[
      ((DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]),
        Seq[(Long, String, String, Long)])](
    valid = (s, v) => graft.util.Ckpt.blocksPresent(s, v._1._2),
    dispose = v => v._1._2.unpersist(blocking = false))

  private def trainedBpe(spark: SparkSession, dir: String)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    val ((df, _), merges) = bpeCache.get(spark, dir) {
      val (state, merges) = bpeTrain(spark, dir)
      val mat = graft.util.Ckpt.materialize(state)
      state.unpersist()
      (mat, merges)
    }
    (df, merges)
  }

  def bpeMergeTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedBpe(spark, dir)._2.toDF("round", "lhs", "rhs", "n")
  }

  /** Tokenizer APPLICATION of the trained merge table — the other half
    * of the BPE loop beside [[bpeMergeTable]]: after the 8 train rounds
    * the sentinel stream IS the encoded corpus, so encoding is one
    * final scan-local split of the state — (doc_id, pos, piece) rows,
    * merged pieces carrying their interior space (e.g. "th e" as one
    * piece if (th, e) merged). In production the merge table is the
    * shipped artifact and this apply step is the same replace() chain
    * run under the FROZEN table — here they share one lineage, which is
    * exactly why they cannot disagree.
    *
    * 100 TB shape: identical to the trainer (its cost IS the trainer's)
    * plus one posexplode whose output rows are the encoded corpus — the
    * thing a training pipeline materializes anyway. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (state, _) = trainedBpe(spark, dir)
    val toksCol = expr(
      s"filter(split(substring(s, 2, length(s) - 2), '$bpeE$bpeS'), x -> x <> '')")
    state.select(col("doc_id"), posexplode(toksCol).as(Seq("pos", "piece")))
  }

  /** Oracle twin of [[bpeMergeTable]]: [[bpeRounds]] unrolled
    * select-apply rounds; `LEFT JOIN ON TRUE` keeps the state total if a
    * round has no pairs (the Spark side stops early, emitting the same
    * absent rows). */
  /** The unrolled train chain shared by [[bpeMergeTableSql]] and
    * [[bpeEncodeSql]]: CTEs t0..t{rounds} carry (doc_id, s) so the
    * encode oracle can attribute pieces; b0..b{rounds-1} are the
    * per-round winners. */
  private val bpeChainCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""t0 AS (
       |  SELECT doc_id, chr(2) || array_to_string(${tokensSql("text")}, chr(3) || chr(2))
       |    || chr(3) AS s
       |  FROM documents WHERE len(${tokensSql("text")}) >= 1
       |)""".stripMargin
    for (i <- 0 until bpeRounds) {
      sb ++= s""",
       |tk$i AS (
       |  SELECT string_split(substr(s, 2, length(s) - 2), chr(3) || chr(2)) AS toks
       |  FROM t$i
       |), p$i AS (
       |  SELECT toks[i] AS lhs, toks[i + 1] AS rhs
       |  FROM (SELECT toks, unnest(CASE WHEN len(toks) >= 2
       |    THEN generate_series(1, len(toks) - 1) ELSE [] END) AS i FROM tk$i)
       |), b$i AS (
       |  SELECT lhs, rhs, count(*) AS n FROM p$i
       |  GROUP BY 1, 2 ORDER BY n DESC, lhs, rhs LIMIT 1
       |), t${i + 1} AS (
       |  SELECT t.doc_id, CASE WHEN b.lhs IS NULL THEN t.s ELSE
       |    replace(t.s, chr(2) || b.lhs || chr(3) || chr(2) || b.rhs || chr(3),
       |      chr(2) || b.lhs || ' ' || b.rhs || chr(3)) END AS s
       |  FROM t$i t LEFT JOIN b$i b ON TRUE
       |)""".stripMargin
    }
    sb.toString
  }

  val bpeMergeTableSql: String =
    s"WITH $bpeChainCtes" + (0 until bpeRounds).map { i =>
      s"""
       |SELECT CAST($i AS BIGINT) AS round, lhs, rhs, n FROM b$i""".stripMargin
    }.mkString("", "\nUNION ALL", "")

  // NOTE: the chain is interpolated OUTSIDE any stripMargin — its `||`
  // concatenations at line starts would otherwise be eaten as margins
  val bpeEncodeSql: String =
    s"WITH $bpeChainCtes,\n" +
    s"""enc AS (
       |  SELECT doc_id,
       |    string_split(substr(s, 2, length(s) - 2), chr(3) || chr(2)) AS toks
       |  FROM t$bpeRounds
       |)
       |SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS piece
       |FROM (SELECT doc_id, toks, unnest(CASE WHEN len(toks) >= 1
       |  THEN generate_series(1, len(toks)) ELSE [] END) AS i FROM enc)""".stripMargin

  /** Tokenizer FERTILITY audit per language — the standard tokenizer
    * quality/fairness number (pieces per word; see e.g. the XLM-R and
    * NLLB tokenizer analyses): a language whose fertility stays high
    * after training pays proportionally more sequence length per word,
    * so vocabulary sizing decisions read exactly this table. Reported in
    * exact 1e-6 fixed point (integer div) alongside chars-per-piece
    * (the compression view of the same trade).
    *
    * Shape: piece counts come from the trained sentinel stream's
    * scan-local split ([[bpeEncode]]'s state, shared via the session
    * memo — the trainer runs once per session, not per query); words
    * and chars are one column-pruned scan of `documents`; the join keys
    * on doc_id and the per-language aggregate is map-combinable. Output
    * is |languages| rows. */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val (state, _) = trainedBpe(spark, dir)
    val piecesCol = expr(
      s"size(filter(split(substring(s, 2, length(s) - 2), '$bpeE$bpeS'), x -> x <> ''))")
    val pieces = state.select(col("doc_id"), piecesCol.cast("long").as("n_pieces"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_words"),
        length(array_join(col("toks"), "")).cast("long").as("n_chars"))
    docs.join(pieces, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("words"),
        sum("n_pieces").as("pieces"), sum("n_chars").as("chars"))
      .select(col("lang"), col("n_docs"), col("words"), col("pieces"),
        expr("pieces * 1000000L div words").as("pieces_per_word_fp"),
        expr("chars * 1000000L div pieces").as("chars_per_piece_fp"))
  }

  val bpeFertilitySql: String =
    s"WITH $bpeChainCtes,\n" +
    s"""enc AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(substr(s, 2, length(s) - 2), chr(3) || chr(2)),
       |                    x -> x <> '')) AS n_pieces
       |  FROM t$bpeRounds
       |), dw AS (
       |  SELECT doc_id, lang, len(toks) AS n_words,
       |    length(array_to_string(toks, '')) AS n_chars
       |  FROM (SELECT doc_id, lang, ${tokensSql("text")} AS toks FROM documents)
       |  WHERE len(toks) >= 1
       |)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS words,
       |  CAST(sum(n_pieces) AS BIGINT) AS pieces,
       |  CAST(sum(n_pieces) * 1000000 // sum(n_words) AS BIGINT) AS pieces_per_word_fp,
       |  CAST(sum(n_chars) * 1000000 // sum(n_pieces) AS BIGINT) AS chars_per_piece_fp
       |FROM dw JOIN enc USING (doc_id) GROUP BY 1""".stripMargin

  /** Per-document token-rarity profile — the CCNet-style "LM quality
    * filter" shape with an EXACT-arithmetic stand-in for the language
    * model: each token scores floor(log2(global count)) computed as
    * `length(bin(cnt)) - 1` (pure integer/bit ops — log2 itself is a
    * transcendental with no cross-engine rounding guarantee, bin() is
    * exact in both engines). Low mean = rare-token-heavy (OOV/garbage
    * candidates); min = the rarest token in the doc. Shape at 100 TB:
    * the corpus is deliberately scanned and exploded TWICE — once for
    * the vocab count (which collapses map-side to one row per
    * (partition, term), so its exchange carries almost nothing) and
    * once as the probe side of the term join. The alternative — one
    * explode shared through an explicit term repartition — was tried
    * and rejected: it forces EVERY token row through the wire, where
    * the recomputed scan+explode is a local, column-pruned, codegen'd
    * pass (and the vocab leg's pruned projection means its second scan
    * reads just `text`). The probe join itself adds no full-token
    * exchange while the counted vocab is broadcastable (pinned by
    * PlanInvariantSpec at test scale); past broadcast size it
    * degenerates to the one unavoidable term shuffle. The division
    * sum/n_tokens is the single double op, shaped identically in the
    * oracle. */
  def tokenRarity(spark: SparkSession, dir: String): DataFrame = {
    val toksRows = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val vocab = toksRows.groupBy("term").agg(count(lit(1)).as("cnt"))
    toksRows.join(vocab, "term")
      .withColumn("flog2", (length(bin(col("cnt"))) - 1).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("flog2").as("s_flog2"),
        min("flog2").as("min_flog2"))
      .select(col("doc_id"), col("n_tokens"),
        (col("s_flog2").cast("double") / col("n_tokens")).as("mean_flog2"),
        col("min_flog2"))
  }

  val tokenRaritySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
       |), v AS (
       |  SELECT term, count(*) AS cnt FROM t GROUP BY 1
       |), j AS (
       |  SELECT doc_id, CAST(length(bin(cnt)) - 1 AS BIGINT) AS flog2
       |  FROM t JOIN v USING (term)
       |)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(flog2) AS DOUBLE) / count(*) AS mean_flog2,
       |  min(flog2) AS min_flog2
       |FROM j GROUP BY 1""".stripMargin

  /** N-gram NOVELTY score — the cross-document companion to
    * [[docRepetition]]'s within-document signals (the RefinedWeb /
    * Gopher "duplicate n-gram fraction" family): per document, the
    * fraction of its distinct word-3-shingles that occur in NO other
    * document. Boilerplate-heavy docs score near 0, unique prose near 1;
    * a culling pass drops the low tail. Documents with fewer than 3
    * tokens have no shingles and emit NO row (same absence-is-reject
    * contract as [[textStats]]).
    *
    * Scale shape: shingle document frequency is one hash aggregate on
    * the shingle (map-side partial combine; the key space is the
    * shingle set, which cannot concentrate), one equi-join back on the
    * same key, and one per-doc aggregate. No windows, no driver state.
    * Exactness: novelty is ONE double division of two exact integers —
    * identical IEEE op in both engines. */
  def docNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleRows(Tables.documents(spark, dir))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles"))
  }

  val docNoveltySql: String =
    s"""WITH tt AS (
       |  SELECT doc_id, ${Dedup.tokensSql("text")} AS toks FROM documents
       |), shx AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql("toks")}) AS sh FROM tt
       |), d AS (
       |  SELECT sh, count(*) AS df FROM shx GROUP BY 1
       |)
       |SELECT shx.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |  CAST(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / count(*) AS novelty
       |FROM shx JOIN d USING (sh) GROUP BY 1""".stripMargin

  /** Token-length histogram in power-of-2 buckets (bucket = floor(log2 n)
    * via the same exact `length(bin(n)) - 1` bit math as [[tokenRarity]];
    * empty docs land in bucket -1) with document and token mass per
    * bucket — the planning statistic behind context-length choices and
    * [[graft.operators.Corpus.seqPacking]] bin sizing (how much of the
    * corpus is short-tail vs long documents, in tokens not chars).
    * Scale shape: scan-side projection, one hash aggregate; ~60 buckets
    * cross the shuffle whatever the corpus. */
  def docLengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tok",
        size(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
          .cast("long"))
      .withColumn("bucket", when(col("n_tok") === 0L, lit(-1L))
        .otherwise((length(bin(col("n_tok"))) - 1).cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"),
        min("n_tok").as("min_tokens"), max("n_tok").as("max_tokens"))

  val docLengthHistogramSql: String =
    s"""WITH t AS (
       |  SELECT CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents
       |), b AS (
       |  SELECT CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT)
       |    ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END AS bucket, n_tok
       |  FROM t
       |)
       |SELECT bucket, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       |  min(n_tok) AS min_tokens, max(n_tok) AS max_tokens
       |FROM b GROUP BY 1""".stripMargin

  /** Per-language quality-threshold CALIBRATION (the CCNet/Gopher move:
    * language-relative cutoffs, since absolute quality scores aren't
    * comparable across languages): exact q25/q50/q75 of
    * [[textStats]]' quality score per `lang`, the artifact a filtering
    * pass cuts against ("drop the bottom quartile of each language").
    *
    * Scale shape — exact quantiles WITHOUT a per-document sort: scores
    * quantize to 1e-6 fixed point, one map-side-combinable hash agg
    * builds the per-(lang, value) histogram, and the rank scan runs over
    * THAT (window partition size = distinct score values, bounded by the
    * quantization domain — never corpus-sized; a per-lang sort of doc
    * rows would serialize a billion-row language through one task). The
    * quantile is type-1 (value at rank floor((n-1)·p)+1 = the smallest
    * histogram value whose cumulative count reaches the rank), exact on
    * the quantized domain in both engines. */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val scored = textStatsOf(docs).select(col("doc_id"), col("quality_score"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("qs_u",
        floor(col("quality_score") * 1000000.0 + 0.5).cast("long"))
    val hist = scored.groupBy("lang", "qs_u").agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy("lang").orderBy("qs_u")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum("c").over(wcum))
    val n = hist.groupBy("lang").agg(sum("c").as("n_docs"))
    def qAt(p: Double, name: String) =
      (min(when(col("cum") >= floor((col("n_docs") - 1) * lit(p)) + 1,
        col("qs_u"))).cast("double") / 1000000.0).as(name)
    cum.join(n, "lang")
      .groupBy(col("lang"), col("n_docs"))
      .agg(qAt(0.25, "q25"), qAt(0.50, "q50"), qAt(0.75, "q75"))
      .select("lang", "n_docs", "q25", "q50", "q75")
  }

  val qualityCalibrationSql: String =
    s"""WITH ${textStatsCtes("documents")},
       |q AS (
       |$textStatsSelect
       |), l AS (
       |  SELECT d.lang,
       |    CAST(floor(q.quality_score * 1000000.0 + 0.5) AS BIGINT) AS qs_u
       |  FROM q JOIN documents d USING (doc_id)
       |), h AS (
       |  SELECT lang, qs_u, count(*) AS c FROM l GROUP BY 1, 2
       |), cu AS (
       |  SELECT lang, qs_u, c,
       |    sum(c) OVER (PARTITION BY lang ORDER BY qs_u
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM h
       |), n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs FROM h GROUP BY 1)
       |SELECT cu.lang, n.n_docs,
       |  CAST(min(CASE WHEN cum >= CAST(floor((n_docs - 1) * 0.25) AS BIGINT) + 1
       |    THEN qs_u END) AS DOUBLE) / 1000000.0 AS q25,
       |  CAST(min(CASE WHEN cum >= CAST(floor((n_docs - 1) * 0.5) AS BIGINT) + 1
       |    THEN qs_u END) AS DOUBLE) / 1000000.0 AS q50,
       |  CAST(min(CASE WHEN cum >= CAST(floor((n_docs - 1) * 0.75) AS BIGINT) + 1
       |    THEN qs_u END) AS DOUBLE) / 1000000.0 AS q75
       |FROM cu JOIN n USING (lang)
       |GROUP BY cu.lang, n.n_docs""".stripMargin

  private val tokVocabSize = 16
  private val tokOovId = tokVocabSize.toLong // ids 0..15 in-vocab, 16 = OOV
  private val tokMaxPos = 32

  /** Tokenizer APPLICATION — the text -> input_ids step every training
    * pipeline runs after vocabulary induction: rank the corpus's terms by
    * total occurrence (count desc, term asc — the deterministic tie-break),
    * keep the top [[tokVocabSize]] as ids 0..V-1, and encode the first
    * [[tokMaxPos]] token positions of every document as
    * (doc_id, pos, token_id) rows, unknown terms -> the OOV id V.
    *
    * Shape at 100 TB: term counting is one map-combinable hash agg; the
    * vocabulary cut is TakeOrdered (per-partition heap, V-row driver
    * merge — never a global sort), and the V-row id table re-ranks under a
    * window that costs one task over V rows. Encoding is a scan-side
    * posexplode capped at [[tokMaxPos]] per doc (bounded fan-out, no skew
    * amplification) + a broadcast left join against the V-row vocab — the
    * corpus never shuffles. Exploded (doc_id, pos, token_id) rows, not a
    * packed array column, so the result joins/filters columnar downstream
    * (and the hash oracle compares scalars). */
  def tokenIdsOf(docs: DataFrame): DataFrame = {
    val toks = docs.withColumn("toks", tokens(col("text")))
    val vocab = toks
      .select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(tokVocabSize)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    val ids = vocab.withColumn("token_id",
      (row_number().over(w) - 1).cast("long")).select("term", "token_id")
    toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
      .filter(col("pos") < tokMaxPos)
      .join(broadcast(ids), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(tokOovId)).as("token_id"))
  }

  def tokenIds(spark: SparkSession, dir: String): DataFrame =
    tokenIdsOf(Tables.documents(spark, dir))

  val tokenIdsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), vc AS (
       |  SELECT term, count(*) AS cnt
       |  FROM (SELECT unnest(toks) AS term FROM t) GROUP BY 1
       |), vr AS (
       |  SELECT term, row_number() OVER (ORDER BY cnt DESC, term) - 1 AS token_id
       |  FROM (SELECT * FROM vc ORDER BY cnt DESC, term LIMIT $tokVocabSize)
       |), tk AS (
       |  SELECT doc_id, s['pos'] AS pos, s['term'] AS term
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(
       |        generate_series(1, least(len(toks), $tokMaxPos)),
       |        i -> {'pos': CAST(i - 1 AS BIGINT), 'term': toks[i]})) AS s
       |    FROM t
       |  )
       |)
       |SELECT tk.doc_id, tk.pos, coalesce(vr.token_id, $tokOovId) AS token_id
       |FROM tk LEFT JOIN vr USING (term)""".stripMargin

  /** Bigram-LM fluency scoring — the CCNet-style "perplexity filter"
    * (Wenzek et al. 2020): train an add-½-smoothed bigram model on the
    * corpus itself, score every document by its average per-bigram
    * surprisal, and let the culling pass drop the high-perplexity tail
    * (gibberish, tables, word salad) and optionally the lowest-
    * perplexity head (boilerplate the LM has memorized).
    *
    * Cross-engine exactness — the same substitution as [[tokenRarity]]
    * and Retrieval's BM25, extended from counts to RATIONALS: `ln` has
    * no bit-agreement guarantee between libms, so the per-bigram
    * surprisal is the EXACT integer ceil(−log2 p) of the rational
    * p = (2·c12 + 1) / (2·c1 + V):
    *
    *   s    = length(bin(den)) − length(bin(num))   (bit-length gap)
    *   bits = s  if num·2^s ≥ den  else  s + 1
    *
    * where `num·2^s ≥ den` is evaluated shift-side as
    * `num > (den−1) >> s` — no left shift, so it cannot overflow at ANY
    * corpus size (num ≤ den always ⇒ s ≥ 0). Per-doc totals are pure
    * long sums; the two output averages are each ONE double division.
    * The integer-bit granularity is per OCCURRENCE — summed over a
    * document it separates fluent from disfluent text exactly as the
    * float score would (Spearman vs float logprob ≈ 1 at doc level) —
    * and the companion `mean_p` (1e-9 fixed-point mean probability)
    * carries the sub-bit signal.
    *
    * Scale shape: one token scan explodes bigram positions; model
    * counts (c12, c1) are hash aggregates on term keys (map-combined,
    * non-concentrating); scoring joins the DOC-DISTINCT bigram set
    * against the model on (w1,w2) then w1 — two term-keyed hash joins,
    * the standard "apply LM to corpus" plan. V is a 1-row broadcast.
    * Nothing driver-side; no payload wider than two terms crosses a
    * shuffle. */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val b = t.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bc.groupBy("w1").agg(sum("c12").as("c1"))
    val vv = b.agg(countDistinct(col("w2")).as("v"))
    val db = b.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
    val scored = db.join(bc, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vv))
      .withColumn("num", col("c12") * 2L + 1L)
      .withColumn("den", col("c1") * 2L + col("v"))
      .withColumn("sft", (length(bin(col("den"))) - length(bin(col("num")))).cast("int"))
      .withColumn("bits",
        when(col("num") > expr("shiftright(den - 1, sft)"), col("sft"))
          .otherwise(col("sft") + 1).cast("long"))
      .withColumn("p_fp",
        floor(col("num").cast("double") / col("den").cast("double")
          * 1000000000.0 + 0.5).cast("long"))
    scored.groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        sum(col("k") * col("bits")).as("total_bits"),
        sum(col("k") * col("p_fp")).as("s_pfp"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        (col("total_bits").cast("double") / col("n_bigrams")).as("bits_per_bigram"),
        (col("s_pfp").cast("double") / col("n_bigrams") / 1000000000.0).as("mean_p"))
  }

  val lmPerplexitySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), b AS (
       |  SELECT doc_id,
       |    unnest(toks[1:len(toks)-1]) AS w1,
       |    unnest(toks[2:len(toks)]) AS w2
       |  FROM t WHERE len(toks) >= 2
       |), bc AS (
       |  SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1
       |), vv AS (
       |  SELECT count(DISTINCT w2) AS v FROM b
       |), db AS (
       |  SELECT doc_id, w1, w2, count(*) AS k FROM b GROUP BY 1, 2, 3
       |), s AS (
       |  SELECT doc_id, k,
       |    c12 * 2 + 1 AS num, c1 * 2 + v AS den,
       |    length(bin(c1 * 2 + v)) - length(bin(c12 * 2 + 1)) AS sft
       |  FROM db JOIN bc USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv
       |), sc AS (
       |  SELECT doc_id, k,
       |    CAST(CASE WHEN num > ((den - 1) >> sft) THEN sft
       |      ELSE sft + 1 END AS BIGINT) AS bits,
       |    CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       |      * 1000000000.0 + 0.5) AS BIGINT) AS p_fp
       |  FROM s
       |)
       |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
       |  CAST(sum(k * bits) AS BIGINT) AS total_bits,
       |  CAST(sum(k * bits) AS DOUBLE) / sum(k) AS bits_per_bigram,
       |  CAST(sum(k * p_fp) AS DOUBLE) / sum(k) / 1000000000.0 AS mean_p
       |FROM sc GROUP BY 1""".stripMargin

  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality rule set (Rae et al. 2021, App. A1.1)
    * as a per-document flag REPORT — each rule its own boolean plus the
    * measured quantity, with `pass` = all rules, so a pipeline can both
    * filter and audit WHICH rule kills a document (the flag histogram is
    * how the thresholds get tuned on a new corpus):
    *
    *   1. 50 ≤ word count ≤ 100,000
    *   2. 3 ≤ mean word length ≤ 10
    *   3. symbol-to-word ratio (# and ellipsis) < 0.1
    *   4. < 90% of lines start with a bullet
    *   5. < 30% of lines end with an ellipsis
    *   6. ≥ 80% of words contain an alphabetic character
    *   7. ≥ 2 distinct Gopher stopwords present
    *
    * On this fixture corpus (space-separated word soup: no newlines, no
    * punctuation) rules 3–5 are exercised only by the oracle, not the
    * data; rule 1 splits the corpus ~55/45, and rule 7 REJECTS it
    * wholesale (the synthetic vocabulary contains only "the" from
    * Gopher's list, so n_stop_hits ≤ 1 everywhere and `pass` is
    * all-false) — which is precisely what the per-rule flags are for:
    * the histogram immediately shows WHICH threshold needs retuning
    * before the filter is pointed at a new domain.
    *
    * Exactness: words are whitespace tokens (Gopher counts words, not
    * the engine's [^a-z0-9] tokens); every threshold is an INTEGER
    * cross-multiplied inequality (3w ≤ chars ≤ 10w, 10·sym < w,
    * 10·bullets < 9·lines, 5·alpha ≥ 4·w) — no float compare crosses
    * engines; the two display ratios are one division each. Wordless
    * docs emit no row (absence-is-reject, as [[textStats]]).
    *
    * Scale shape: pure per-row projection + filter, no shuffle at all —
    * the 100 TB plan is scan→project→filter fused in one codegen
    * stage. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
    val lines = split(col("text"), "\n")
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), ws.as("ws"), lines.as("lines"))
      .withColumn("w", size(col("ws")).cast("long"))
      .filter(col("w") > 0L)
      .withColumn("chars",
        aggregate(col("ws"), lit(0L), (acc, x) => acc + length(x)))
      .withColumn("n_alpha",
        size(filter(col("ws"), x => x.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_bullet",
        size(filter(col("lines"), l =>
          ltrim(l).startsWith("-") || ltrim(l).startsWith("*") ||
            ltrim(l).startsWith("•"))).cast("long"))
      .withColumn("n_ell_end",
        size(filter(col("lines"), l =>
          rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("long"))
      .withColumn("n_sym",
        (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
          + (length(col("text"))
            - length(replace(col("text"), lit("..."), lit("")))) / 3
          + (length(col("text"))
            - length(replace(col("text"), lit("…"), lit(""))))).cast("long"))
      .withColumn("toks", array_distinct(transform(col("ws"), x => lower(x))))
      .withColumn("n_stop_hits",
        gopherStops.map(s => when(array_contains(col("toks"), s), 1L)
          .otherwise(0L)).reduce(_ + _))
    d.select(col("doc_id"), col("w").as("n_words"), col("n_lines"),
        (col("chars").cast("double") / col("w")).as("mean_word_len"),
        (col("n_alpha").cast("double") / col("w")).as("alpha_frac"),
        col("n_stop_hits"),
        (col("w") >= 50L && col("w") <= 100000L).as("ok_word_count"),
        (col("chars") >= col("w") * 3L && col("chars") <= col("w") * 10L)
          .as("ok_mean_word_len"),
        (col("n_sym") * 10L < col("w")).as("ok_symbol_ratio"),
        (col("n_bullet") * 10L < col("n_lines") * 9L).as("ok_bullet_lines"),
        (col("n_ell_end") * 10L < col("n_lines") * 3L).as("ok_ellipsis_lines"),
        (col("n_alpha") * 5L >= col("w") * 4L).as("ok_alpha_words"),
        (col("n_stop_hits") >= 2L).as("ok_stopwords"))
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_bullet_lines") &&
          col("ok_ellipsis_lines") && col("ok_alpha_words") &&
          col("ok_stopwords"))
  }

  val gopherRulesSql: String = {
    val stopSum = gopherStops
      .map(s => s"CASE WHEN list_contains(toks, '$s') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH d0 AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws,
       |    string_split(text, chr(10)) AS lines
       |  FROM documents
       |), d1 AS (
       |  SELECT doc_id, text, ws, lines,
       |    CAST(len(ws) AS BIGINT) AS w,
       |    CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS chars,
       |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
       |      AS BIGINT) AS n_alpha,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-')
       |      OR starts_with(ltrim(l), '*')
       |      OR starts_with(ltrim(l), '•'))) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
       |      OR ends_with(rtrim(l), '…'))) AS BIGINT) AS n_ell_end,
       |    CAST(length(text) - length(replace(text, '#', ''))
       |      + (length(text) - length(replace(text, '...', ''))) // 3
       |      + (length(text) - length(replace(text, '…', '')))
       |      AS BIGINT) AS n_sym,
       |    list_distinct(list_transform(ws, x -> lower(x))) AS toks
       |  FROM d0 WHERE len(ws) > 0
       |), d2 AS (
       |  SELECT *, CAST($stopSum AS BIGINT) AS n_stop_hits FROM d1
       |)
       |SELECT doc_id, w AS n_words, n_lines,
       |  CAST(chars AS DOUBLE) / w AS mean_word_len,
       |  CAST(n_alpha AS DOUBLE) / w AS alpha_frac,
       |  n_stop_hits,
       |  w >= 50 AND w <= 100000 AS ok_word_count,
       |  chars >= w * 3 AND chars <= w * 10 AS ok_mean_word_len,
       |  n_sym * 10 < w AS ok_symbol_ratio,
       |  n_bullet * 10 < n_lines * 9 AS ok_bullet_lines,
       |  n_ell_end * 10 < n_lines * 3 AS ok_ellipsis_lines,
       |  n_alpha * 5 >= w * 4 AS ok_alpha_words,
       |  n_stop_hits >= 2 AS ok_stopwords,
       |  (w >= 50 AND w <= 100000) AND (chars >= w * 3 AND chars <= w * 10)
       |    AND n_sym * 10 < w AND n_bullet * 10 < n_lines * 9
       |    AND n_ell_end * 10 < n_lines * 3 AND n_alpha * 5 >= w * 4
       |    AND n_stop_hits >= 2 AS pass
       |FROM d2""".stripMargin
  }

  private val cmsDepth = 4
  private val cmsWidth = 256L
  private val cmsTopK = 20

  /** Count-Min Sketch heavy-hitter AUDIT — third member of the portable
    * sketch-accuracy family ([[Dedup.minhashAccuracy]],
    * [[Analytics.hllDistinctAudit]]): build a 4×256 CMS over the term
    * stream, then report, for the top-20 EXACT heavy hitters, the
    * sketch estimate next to the truth. CMS never underestimates
    * (est ≥ exact, a hard invariant the oracle enforces row-by-row) and
    * overestimates by collision mass; `over` is what tells a 100 TB
    * deployment whether 4 KB of counters suffices for its skew
    * monitoring, BEFORE it swaps the exact vocab aggregate for the
    * sketch. Everything is integer arithmetic over [[Dedup.h60]] —
    * exactly reproducible in any engine, unlike library sketches.
    *
    * Scale shape: counters are a (depth×width)-bounded aggregate
    * (map-side combined; 1024 rows broadcast back); the exact top-k is
    * the [[vocabTopk]] TakeOrdered shape. The sketch side never
    * shuffles more than 1024 keys — that's the CMS deployment point:
    * per-executor partial counters merge by ADDITION. */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term"))
    val rows = (0 until cmsDepth).map { k =>
      terms.select(lit(k).as("k"),
        pmod(Dedup.h60(lit(s"cms$k"), col("term")), lit(cmsWidth)).as("bkt"))
    }.reduce(_.union(_))
    val counters = rows.groupBy("k", "bkt").agg(count(lit(1)).as("cnt"))
    val top = terms.groupBy("term").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("term")).limit(cmsTopK)
    val probes = (0 until cmsDepth).map { k =>
      top.select(col("term"), col("exact"), lit(k).as("k"),
        pmod(Dedup.h60(lit(s"cms$k"), col("term")), lit(cmsWidth)).as("bkt"))
    }.reduce(_.union(_))
    probes.join(broadcast(counters), Seq("k", "bkt"))
      .groupBy("term", "exact")
      .agg(min("cnt").as("est"))
      .select(col("term"), col("exact"), col("est"),
        (col("est") - col("exact")).as("over"))
  }

  val cmsHeavyHittersSql: String = {
    val rowSel = (0 until cmsDepth).map { k =>
      s"SELECT $k AS k, ${Dedup.h60Sql(s"'cms$k'", "term")} % $cmsWidth AS bkt FROM t"
    }.mkString("\n  UNION ALL ")
    val probeSel = (0 until cmsDepth).map { k =>
      s"SELECT term, exact, $k AS k, ${Dedup.h60Sql(s"'cms$k'", "term")} % $cmsWidth AS bkt FROM top"
    }.mkString("\n  UNION ALL ")
    s"""WITH t AS (
       |  SELECT unnest(${tokensSql("text")}) AS term FROM documents
       |), r AS (
       |  $rowSel
       |), counters AS (
       |  SELECT k, bkt, count(*) AS cnt FROM r GROUP BY 1, 2
       |), top AS (
       |  SELECT term, count(*) AS exact FROM t GROUP BY 1
       |  ORDER BY exact DESC, term LIMIT $cmsTopK
       |), p AS (
       |  $probeSel
       |)
       |SELECT term, exact, min(cnt) AS est, min(cnt) - exact AS over
       |FROM p JOIN counters USING (k, bkt)
       |GROUP BY 1, 2""".stripMargin
  }

  /** Tokenizer ROUND-TRIP audit — the integrity check every tokenizer
    * pipeline runs before training: decode(encode(doc)) must reproduce
    * the original token stream for EVERY document. BPE merges only glue
    * adjacent tokens (a piece "a b" decodes by construction), so a
    * mismatch here means merge-table corruption, a sentinel collision,
    * or an encode/train drift — the failure modes that silently poison
    * a corpus. Also reports the compression the merge table actually
    * bought (pieces per token < 1 iff merges fired).
    *
    * Decode is piece-concatenation with single spaces; comparison is by
    * md5 so full texts never cross the shuffle (the [[corpusScrub]]
    * idiom). Trained state is the memoized [[trainedBpe]] artifact —
    * the audit costs one join over it, not a retrain. */
  def bpeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val (state, _) = trainedBpe(spark, dir)
    val piecesCol = expr(
      s"filter(split(substring(s, 2, length(s) - 2), '$bpeE$bpeS'), x -> x <> '')")
    val enc = state.select(col("doc_id"), piecesCol.as("pieces"))
      .select(col("doc_id"), size(col("pieces")).cast("long").as("n_pieces"),
        md5(array_join(col("pieces"), " ")).as("rmd5"))
    val orig = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        md5(array_join(col("toks"), " ")).as("omd5"))
    enc.join(orig, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rmd5") === col("omd5"), 1L).otherwise(0L)).as("n_match"),
        sum("n_pieces").as("n_pieces"), sum("n_tokens").as("n_tokens"))
      .select(col("n_docs"), col("n_match"), col("n_pieces"), col("n_tokens"),
        (col("n_pieces").cast("double") / col("n_tokens")).as("pieces_per_token"))
  }

  // NOTE: bpeChainCtes must be concatenated AFTER stripMargin (the
  // bpeMergeTableSql idiom) — its lines starting with `||` would lose a
  // pipe to stripMargin if interpolated into this string first.
  val bpeRoundtripSql: String =
    s"WITH $bpeChainCtes,\n" +
    s"""enc AS (
       |  SELECT doc_id,
       |    list_filter(string_split(substr(s, 2, length(s) - 2),
       |      chr(3) || chr(2)), x -> x <> '') AS pieces
       |  FROM t$bpeRounds
       |), e2 AS (
       |  SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_pieces,
       |    md5(array_to_string(pieces, ' ')) AS rmd5
       |  FROM enc
       |), o AS (
       |  SELECT doc_id, CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |    md5(array_to_string(${tokensSql("text")}, ' ')) AS omd5
       |  FROM documents WHERE len(${tokensSql("text")}) >= 1
       |)
       |SELECT count(*) AS n_docs,
       |  CAST(sum(CASE WHEN rmd5 = omd5 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_pieces) AS DOUBLE) / sum(n_tokens) AS pieces_per_token
       |FROM e2 JOIN o USING (doc_id)""".stripMargin

  // --------------------------------------------- vocab coverage curve

  private val coverageSizes = Seq(16, 64, 256)

  /** Merge-vocabulary coverage curve — what share of the corpus's
    * adjacent-pair MASS the top-V merge vocabulary captures, at
    * V = 16 / 64 / 256: the measurement behind the BPE merge-count
    * decision (every covered pair is a merge that fires; the complement
    * is the stream still paying two tokens). The unit is the adjacent
    * token pair — the same stream [[bpeTopMerges]] ranks and
    * [[pmiCollocations]] scores — because the word-level curve is
    * degenerate on a templated corpus (31 distinct words cover 100% at
    * any V; 916 distinct pairs give a real curve). Exact integer pair
    * counts plus one double share per level.
    *
    * Shape: one map-combinable pair agg (pair-vocab-keyed, not
    * corpus-keyed); the top-V cut is the bounded heap at the largest V,
    * the smaller Vs are conditional sums over a rank window on those
    * 256 rows — the corpus never sorts. */
  def bpeCoverage(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(concat(col("bg.w1"), lit(" "), col("bg.w2")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val total = terms.agg(sum("n").as("total_tokens"),
      count(lit(1)).as("n_terms"))
    val top = graft.plans.TopKPerKey.topK(
        terms.withColumn("g", lit(1)),
        keys = Seq(col("g")),
        order = Seq(col("n").desc, col("term").asc), k = coverageSizes.max)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("n").desc, col("term"))))
    val perV = coverageSizes.map { v =>
      top.filter(col("rnk") <= v)
        .agg(sum("n").as("covered_tokens"), count(lit(1)).as("vocab_n"))
        .select(lit(v.toLong).as("v"), col("vocab_n"), col("covered_tokens"))
    }.reduce(_ unionAll _)
    perV.crossJoin(broadcast(total))
      .withColumn("share",
        col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
      .select("v", "vocab_n", "covered_tokens", "total_tokens", "n_terms", "share")
  }

  val bpeCoverageSql: String = {
    val legs = coverageSizes.map { v =>
      s"""SELECT $v AS v,
         |  CAST(sum(CASE WHEN rnk <= $v THEN 1 ELSE 0 END) AS BIGINT) AS vocab_n,
         |  CAST(sum(CASE WHEN rnk <= $v THEN n ELSE 0 END) AS BIGINT)
         |    AS covered_tokens
         |FROM ranked""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT ${tokensSql("text")} AS toks FROM documents
       |), terms AS (
       |  SELECT term, count(*) AS n FROM (
       |    SELECT unnest(toks[1:len(toks)-1]) || ' ' || unnest(toks[2:len(toks)])
       |      AS term
       |    FROM t WHERE len(toks) >= 2)
       |  GROUP BY 1
       |), total AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS total_tokens, count(*) AS n_terms
       |  FROM terms
       |), ranked AS (
       |  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM terms
       |), curve AS (
       |$legs
       |)
       |SELECT c.v, c.vocab_n, c.covered_tokens, t.total_tokens, t.n_terms,
       |  CAST(c.covered_tokens AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)
       |    AS share
       |FROM curve c CROSS JOIN total t""".stripMargin
  }

  /** Language-ID confusion matrix — the EVAL of [[langId]] against the
    * corpus's own ground-truth `lang` column: (true, predicted, n) cells
    * plus the per-cell share of the true language's docs in exact fixed
    * point. A classifier audit belongs next to the classifier: lexicon
    * drift or a tie-break bug shows up as off-diagonal mass here long
    * before downstream per-language calibration quietly degrades.
    * Shape: the langId scan + one (true, pred) hash agg + a tiny
    * per-true-language re-agg for the denominators. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
    val tot = cells.groupBy("lang").agg(sum("n").as("n_true"))
    cells.join(tot, "lang")
      .withColumn("share_fp", expr("(n * 1000000) div n_true"))
      .select("lang", "pred_lang", "n", "n_true", "share_fp")
  }

  val langIdConfusionSql: String =
    s"""WITH li AS (
       |  SELECT * FROM ($langIdSql)
       |), cells AS (
       |  SELECT lang, pred_lang, count(*) AS n FROM li GROUP BY 1, 2
       |), tot AS (
       |  SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1
       |)
       |SELECT c.lang, c.pred_lang, c.n, t.n_true,
       |  (c.n * 1000000) // t.n_true AS share_fp
       |FROM cells c JOIN tot t ON c.lang = t.lang""".stripMargin

  // ------------------------------------- trained Naive-Bayes classifier

  private[graft] val nbTestMod = 4L

  /** TRAINED language classifier — multinomial Naive Bayes with add-one
    * smoothing, the fastText-lite shape production pipelines run when the
    * [[langId]] lexicon heuristic isn't enough: train per-language unigram
    * counts on 3/4 of the corpus (`doc_id % 4 != 0`), classify the
    * held-out 1/4, and report the (true, predicted) confusion matrix —
    * directly comparable to [[langIdConfusion]], the heuristic's matrix,
    * on the same fixture.
    *
    * Cross-engine exactness — NB is `argmax_L log P(L) + Σ log P(w|L)`,
    * and `ln` has no bit-agreement guarantee between libms, so the score
    * substitutes a FRACTIONAL-bit surprisal with no transcendental call:
    *   - whole bits: ceil(−log2 p) as the exact bit-length integer
    *     ([[lmPerplexity]]'s trick — num > (den−1) >> sft, shift-side,
    *     overflow-free);
    *   - fraction: Mitchell's approximation log2(m) ≈ m−1 on the
    *     mantissa m = p·2^bits ∈ [1,2), so the per-occurrence score is
    *     the integer  bits·2^16 − floor((m−1)·2^16).  m comes from two
    *     IEEE ops on exact integers (num/den, then ·2^bits — an exact
    *     power of two), so every engine computes the same bits; floor
    *     pins the fraction to 1/65536-bit granularity; per-doc totals
    *     are exact order-free integer sums. Mitchell's error (< 0.086
    *     bits, monotone in m) cancels further across the ~L-symmetric
    *     occurrence sums; ties break on label asc.
    * The decision is deterministic in both engines and faithful to the
    * true log-likelihood argmax at sub-tenth-of-a-bit resolution.
    *
    * Scale shape: training is one (lang, term)-keyed map-combinable count
    * agg (the model IS counts — NB's training pass is embarrassingly
    * mergeable, why it fits a 100 TB corpus); label marginals are an
    * L-row broadcast. Scoring joins the doc-distinct test terms against
    * the model on (lang, term) — a term-keyed hash join carrying k, never
    * text — then one (doc, label) agg and a size-L argmin window per doc.
    * Nothing driver-side; L (=5) bounds the fan-out factor.
    *
    * Fixture note: the synthetic corpus draws every language's text from
    * the SAME vocabulary (no per-language lexicon salt), so the trained
    * posterior is dominated by the class prior and the matrix collapses
    * toward the majority column — the CORRECT Bayes answer on
    * label-independent text, pinned by NbLangClassifySpec; on a real
    * multilingual corpus the same plan yields the fastText-style
    * diagonal. */
  /** The NB core behind [[nbLangClassify]] and [[nbQualityClassify]]:
    * train on `doc_id % 4 != 0`, predict the held-out quarter. Input is
    * a labeled token stream (doc_id, label, term); output one row per
    * held-out doc (doc_id, true_label, pred_label). */
  // fractional-bit surprisal of the exact rational num/den:
  //   bits·2^16 − floor((num/den·2^bits − 1)·2^16)
  private def fracBits(num: Column, den: Column): Column = {
    val sft = (length(bin(den)) - length(bin(num))).cast("int")
    val bits = when(num > call_function("shiftright", den - 1, sft), sft)
      .otherwise(sft + 1).cast("long")
    val m = num.cast("double") / den.cast("double") *
      pow(lit(2.0), bits.cast("double"))
    bits * 65536L - floor((m - 1.0) * 65536.0).cast("long")
  }

  /** NB model from `train` + per-(doc, label) total surprisal over the
    * `score` population — the shared core of [[nbPredictions]] (which
    * scores the held-out quarter) and the learned-log-odds scorer
    * (which scores EVERY doc for the selector A/B). Both frames are
    * (doc_id, label, term) token streams; returns one row per scored
    * doc per model label: (doc_id, true_label, m_label, total_sfp). */
  private def nbTotalSfp(train: DataFrame, score: DataFrame): DataFrame = {
    val cw = train.groupBy("label", "term").agg(count(lit(1)).as("cw"))
    val cl = cw.groupBy("label").agg(sum("cw").as("cl"))
    val vv = train.agg(countDistinct("term").as("v"))
    val nd = train.groupBy("label").agg(countDistinct("doc_id").as("nd"))
    val nt = nd.agg(sum("nd").as("n_train"), count(lit(1)).as("n_labels"))

    val lab = cl.join(nd, "label").crossJoin(vv).crossJoin(nt)
      .withColumn("prior_sfp",
        fracBits(col("nd") + 1L, col("n_train") + col("n_labels")))
      .select(col("label").as("m_label"), col("cl"), col("v"), col("prior_sfp"))

    val dt = score.groupBy(col("doc_id"), col("label").as("true_label"), col("term"))
      .agg(count(lit(1)).as("k"))
    val sr = dt.crossJoin(broadcast(lab))
      .join(cw.select(col("label").as("m_label"), col("term"), col("cw")),
        Seq("m_label", "term"), "left")
      .withColumn("s_fp",
        fracBits(coalesce(col("cw"), lit(0L)) + 1L, col("cl") + col("v")))
    sr.groupBy("doc_id", "true_label", "m_label", "prior_sfp")
      .agg(sum(col("k") * col("s_fp")).as("lk_sfp"))
      .withColumn("total_sfp", col("lk_sfp") + col("prior_sfp"))
  }

  private def nbPredictions(tk: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT eager-cached: an r18 A/B showed caching the token table here
    // REGRESSES (nb_quality_classify 2.25 -> 3.34 s, nb_lang_classify
    // 1.39 -> 2.71 s solo min) — the four tk references already share
    // work through exchange reuse, so the cache's extra materializing
    // count + memory pressure buys nothing (guide §5: cache only when
    // recompute actually repeats).
    val ds = nbTotalSfp(
      tk.filter(col("doc_id") % nbTestMod =!= 0L),
      tk.filter(col("doc_id") % nbTestMod === 0L))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("total_sfp").asc, col("m_label").asc)
    ds.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("true_label"), col("m_label").as("pred_label"))
  }

  /** (true, predicted) confusion cells with a per-true-label share, the
    * shared reporting shape of the NB classifiers. */
  private def nbConfusion(preds: DataFrame, labelName: String,
      predName: String): DataFrame = {
    val cells = preds
      .groupBy(col("true_label").as(labelName), col("pred_label").as(predName))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(labelName).agg(sum("n").as("n_true"))
    cells.join(tot, labelName)
      .withColumn("share_fp", expr("(n * 1000000) div n_true"))
      .select(labelName, predName, "n", "n_true", "share_fp")
  }

  def nbLangClassify(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("label"),
        explode(tokens(col("text"))).as("term"))
    nbConfusion(nbPredictions(tk), "lang", "pred_lang")
  }

  val nbLangClassifySql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, unnest(${tokensSql("text")}) AS term
       |  FROM documents
       |), tr AS (
       |  SELECT * FROM tk WHERE doc_id % $nbTestMod <> 0
       |), te AS (
       |  SELECT * FROM tk WHERE doc_id % $nbTestMod = 0
       |), cw AS (
       |  SELECT lang, term, count(*) AS cw FROM tr GROUP BY 1, 2
       |), cl AS (
       |  SELECT lang, CAST(sum(cw) AS BIGINT) AS cl FROM cw GROUP BY 1
       |), vv AS (
       |  SELECT count(DISTINCT term) AS v FROM tr
       |), nd AS (
       |  SELECT lang, count(DISTINCT doc_id) AS nd FROM tr GROUP BY 1
       |), nt AS (
       |  SELECT CAST(sum(nd) AS BIGINT) AS n_train, count(*) AS n_labels
       |  FROM nd
       |), lab0 AS (
       |  SELECT cl.lang AS m_lang, cl.cl, vv.v,
       |    nd.nd + 1 AS num_p, nt.n_train + nt.n_labels AS den_p
       |  FROM cl JOIN nd USING (lang) CROSS JOIN vv CROSS JOIN nt
       |), lab1 AS (
       |  SELECT m_lang, cl, v, num_p, den_p,
       |    length(bin(den_p)) - length(bin(num_p)) AS sft_p
       |  FROM lab0
       |), lab2 AS (
       |  SELECT m_lang, cl, v, num_p, den_p,
       |    CAST(CASE WHEN num_p > ((den_p - 1) >> sft_p) THEN sft_p
       |      ELSE sft_p + 1 END AS BIGINT) AS bits_p
       |  FROM lab1
       |), lab AS (
       |  SELECT m_lang, cl, v,
       |    bits_p * 65536 - CAST(floor(
       |      (CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE)
       |        * pow(2.0, CAST(bits_p AS DOUBLE)) - 1.0) * 65536.0)
       |      AS BIGINT) AS prior_sfp
       |  FROM lab2
       |), dt AS (
       |  SELECT doc_id, lang AS true_lang, term, count(*) AS k
       |  FROM te GROUP BY 1, 2, 3
       |), sr AS (
       |  SELECT dt.doc_id, dt.true_lang, lab.m_lang, lab.prior_sfp, dt.k,
       |    coalesce(cw.cw, 0) + 1 AS num, lab.cl + lab.v AS den
       |  FROM dt CROSS JOIN lab
       |  LEFT JOIN cw ON cw.lang = lab.m_lang AND cw.term = dt.term
       |), sb AS (
       |  SELECT doc_id, true_lang, m_lang, prior_sfp, k,
       |    num, den, length(bin(den)) - length(bin(num)) AS sft
       |  FROM sr
       |), sb2 AS (
       |  SELECT doc_id, true_lang, m_lang, prior_sfp, k, num, den,
       |    CAST(CASE WHEN num > ((den - 1) >> sft) THEN sft
       |      ELSE sft + 1 END AS BIGINT) AS bits
       |  FROM sb
       |), sc AS (
       |  SELECT doc_id, true_lang, m_lang, prior_sfp,
       |    k * (bits * 65536 - CAST(floor(
       |      (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       |        * pow(2.0, CAST(bits AS DOUBLE)) - 1.0) * 65536.0)
       |      AS BIGINT)) AS ks
       |  FROM sb2
       |), ds AS (
       |  SELECT doc_id, true_lang, m_lang,
       |    CAST(sum(ks) AS BIGINT) + prior_sfp AS total_sfp
       |  FROM sc GROUP BY doc_id, true_lang, m_lang, prior_sfp
       |), pr AS (
       |  SELECT doc_id, true_lang, m_lang AS pred_lang,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY total_sfp ASC, m_lang ASC) AS rn
       |  FROM ds
       |), cells AS (
       |  SELECT true_lang AS lang, pred_lang, count(*) AS n
       |  FROM pr WHERE rn = 1 GROUP BY 1, 2
       |), tot AS (
       |  SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1
       |)
       |SELECT c.lang, c.pred_lang, c.n, t.n_true,
       |  (c.n * 1000000) // t.n_true AS share_fp
       |FROM cells c JOIN tot t ON c.lang = t.lang""".stripMargin

  // ------------------------------------ trained QUALITY classifier (NB)

  /** Teacher threshold for [[nbQualityClassify]] in 1e-6 fixed point:
    * docs at-or-above 0.30 heuristic quality are the `hi` class — the
    * fixture's [[qualityCalibration]] median, giving a balanced split. */
  private[graft] val nbQualityThr = 300000L

  /** Teacher labels: `hi`/`lo` from the HEURISTIC quality score (the one
    * [[Corpus.qualityBudgetSelect]] ranks by), quantized exactly like
    * [[qualityCalibration]]. `qs_u` rides along for the calibration
    * bands. Tokenless docs have no stats row and drop out — same
    * population as every stats-derived query. */
  private def nbQualityTeacher(docs: DataFrame): DataFrame =
    textStatsOf(docs)
      .withColumn("qs_u",
        floor(col("quality_score") * 1000000.0 + 0.5).cast("long"))
      .select(col("doc_id"), col("qs_u"),
        when(col("qs_u") >= nbQualityThr, lit("hi")).otherwise(lit("lo"))
          .as("label"))

  /** TRAINED quality classifier — the FineWeb-Edu shape: a teacher (here
    * the heuristic quality score; in production an LLM judge) labels the
    * corpus, a cheap multinomial NB learns the labels from unigrams, and
    * the held-out confusion matrix prices how much of the teacher's
    * signal the student captured from text alone. Same training split,
    * smoothing, and fractional-bit surprisal arithmetic as
    * [[nbLangClassify]] (one [[nbPredictions]] core drives both — the
    * cross-engine-exactness argument is made once, there).
    *
    * Scale shape: the teacher pass is [[textStats]]' scan; training is
    * the same (label, term) map-combinable count agg; scoring the same
    * broadcast-L join. A production run materializes the token table
    * once for teacher + trainer instead of re-tokenizing (here both
    * sides recompute so the oracle stays operation-identical).
    *
    * Fixture note: the teacher's signal IS learnable from unigrams (the
    * score is driven by stopword density and type-token ratio), so the
    * student beats the majority-class baseline — NbQualitySpec pins the
    * direction; [[nbQualityCalibration]] reports the full curve. */
  def nbQualityClassify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tk = docs.join(nbQualityTeacher(docs).select("doc_id", "label"), "doc_id")
      .select(col("doc_id"), col("label"), explode(tokens(col("text"))).as("term"))
    nbConfusion(nbPredictions(tk), "label", "pred_label")
  }

  /** Calibration of the trained classifier against the heuristic scorer
    * it distilled: held-out docs bucketed by heuristic-score band
    * (fixed 0.1-wide bands, top band open), reporting the share the
    * student predicts `hi` per band. A well-calibrated student's share
    * rises with the band — this is the loop-closer between
    * [[nbQualityClassify]] and the selector ranking
    * ([[Corpus.qualityBudgetSelect]]): where the curve is flat, NB
    * score and heuristic score disagree and a budget cut at that band
    * would select different documents. */
  def nbQualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val teach = nbQualityTeacher(docs)
    val tk = docs.join(teach.select("doc_id", "label"), "doc_id")
      .select(col("doc_id"), col("label"), explode(tokens(col("text"))).as("term"))
    nbPredictions(tk)
      .join(teach.select("doc_id", "qs_u"), "doc_id")
      .withColumn("band", least(expr("qs_u div 100000"), lit(9L)))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_label") === "hi", 1L).otherwise(0L)).as("n_pred_hi"))
      .withColumn("share_hi_fp", expr("(n_pred_hi * 1000000) div n_docs"))
      .select("band", "n_docs", "n_pred_hi", "share_hi_fp")
  }

  /** Per-doc LEARNED quality log-odds (1/2^16-bit fixed point): the
    * quality-NB model of [[nbQualityClassify]] (same training split,
    * same smoothing, same surprisal arithmetic) scoring EVERY tokened
    * doc — log-odds = total_sfp(lo) − total_sfp(hi), so bigger = the
    * student is more confident the doc is `hi`. This is the ranking
    * signal [[Corpus.budgetSelectLearned]] runs as the alternative
    * selector policy (VERDICT r13 #7). Exact integers end to end, so
    * the selection order is oracle-reproducible. */
  private[operators] def nbQualityLogOdds(spark: SparkSession,
      dir: String): DataFrame =
    nbQualityLogOddsFrom(spark, dir,
      textStatsOf(graft.sources.Tables.documents(spark, dir)))

  /** [[nbQualityLogOdds]] with the teacher's stats frame supplied by the
    * caller: [[Corpus.budgetSelectLearned]] already pins the SAME
    * textStats projection for its heuristic leg, so deriving the teacher
    * labels from that pinned frame removes one whole corpus
    * tokenize+score pass from the learned leg (guide §5 reuse — the
    * caller's cache, not a new one). `stats` must carry (doc_id,
    * quality_score) computed by [[textStatsOf]]. */
  private[operators] def nbQualityLogOddsFrom(spark: SparkSession,
      dir: String, stats: DataFrame): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val teach = stats
      .withColumn("qs_u",
        floor(col("quality_score") * 1000000.0 + 0.5).cast("long"))
      .select(col("doc_id"),
        when(col("qs_u") >= nbQualityThr, lit("hi")).otherwise(lit("lo"))
          .as("label"))
    // not eager-cached — same exchange-reuse finding as nbPredictions
    val tk = docs.join(teach.select("doc_id", "label"), "doc_id")
      .select(col("doc_id"), col("label"), explode(tokens(col("text"))).as("term"))
    nbTotalSfp(tk.filter(col("doc_id") % nbTestMod =!= 0L), tk)
      .groupBy("doc_id")
      .agg(sum(when(col("m_label") === "lo", col("total_sfp"))
        .otherwise(-col("total_sfp"))).as("log_odds"))
  }

  /** Shared CTE chain of the quality-NB oracles: teacher labels from the
    * stats CTEs, then the same train/score chain as [[nbLangClassifySql]]
    * with `label` for `lang`, ending at per-doc predictions `pr`
    * (doc_id, true_label, pred_label, rn=1 rows). `scorePop` picks the
    * scored population: `te` (the held-out quarter — the classifier and
    * calibration oracles) or `tk` (every tokened doc — the learned-
    * selector oracle). */
  private def nbQualityCtes: String = nbQualityCtesFrom("te")

  /** [[nbQualityCtes]] ending at `odds` (doc_id, log_odds) over every
    * tokened doc — the oracle twin of [[nbQualityLogOdds]]. */
  private[operators] def nbQualityOddsCtes: String =
    s"""${nbQualityCtesFrom("tk")},
       |odds AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN m_label = 'lo' THEN total_sfp
       |      ELSE -total_sfp END) AS BIGINT) AS log_odds
       |  FROM ds GROUP BY 1
       |)""".stripMargin

  private def nbQualityCtesFrom(scorePop: String): String =
    s"""WITH ${textStatsCtes("documents")},
       |q AS (
       |$textStatsSelect
       |), lb0 AS (
       |  SELECT doc_id,
       |    CAST(floor(quality_score * 1000000.0 + 0.5) AS BIGINT) AS qs_u
       |  FROM q
       |), lb AS (
       |  SELECT doc_id, qs_u,
       |    CASE WHEN qs_u >= $nbQualityThr THEN 'hi' ELSE 'lo' END AS label
       |  FROM lb0
       |), tk AS (
       |  SELECT d.doc_id, lb.label, unnest(${tokensSql("d.text")}) AS term
       |  FROM documents d JOIN lb ON d.doc_id = lb.doc_id
       |), tr AS (
       |  SELECT * FROM tk WHERE doc_id % $nbTestMod <> 0
       |), te AS (
       |  SELECT * FROM tk WHERE doc_id % $nbTestMod = 0
       |), cw AS (
       |  SELECT label, term, count(*) AS cw FROM tr GROUP BY 1, 2
       |), cl AS (
       |  SELECT label, CAST(sum(cw) AS BIGINT) AS cl FROM cw GROUP BY 1
       |), vv AS (
       |  SELECT count(DISTINCT term) AS v FROM tr
       |), nd AS (
       |  SELECT label, count(DISTINCT doc_id) AS nd FROM tr GROUP BY 1
       |), nt AS (
       |  SELECT CAST(sum(nd) AS BIGINT) AS n_train, count(*) AS n_labels
       |  FROM nd
       |), lab0 AS (
       |  SELECT cl.label AS m_label, cl.cl, vv.v,
       |    nd.nd + 1 AS num_p, nt.n_train + nt.n_labels AS den_p
       |  FROM cl JOIN nd USING (label) CROSS JOIN vv CROSS JOIN nt
       |), lab1 AS (
       |  SELECT m_label, cl, v, num_p, den_p,
       |    length(bin(den_p)) - length(bin(num_p)) AS sft_p
       |  FROM lab0
       |), lab2 AS (
       |  SELECT m_label, cl, v, num_p, den_p,
       |    CAST(CASE WHEN num_p > ((den_p - 1) >> sft_p) THEN sft_p
       |      ELSE sft_p + 1 END AS BIGINT) AS bits_p
       |  FROM lab1
       |), lab AS (
       |  SELECT m_label, cl, v,
       |    bits_p * 65536 - CAST(floor(
       |      (CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE)
       |        * pow(2.0, CAST(bits_p AS DOUBLE)) - 1.0) * 65536.0)
       |      AS BIGINT) AS prior_sfp
       |  FROM lab2
       |), dt AS (
       |  SELECT doc_id, label AS true_label, term, count(*) AS k
       |  FROM $scorePop GROUP BY 1, 2, 3
       |), sr AS (
       |  SELECT dt.doc_id, dt.true_label, lab.m_label, lab.prior_sfp, dt.k,
       |    coalesce(cw.cw, 0) + 1 AS num, lab.cl + lab.v AS den
       |  FROM dt CROSS JOIN lab
       |  LEFT JOIN cw ON cw.label = lab.m_label AND cw.term = dt.term
       |), sb AS (
       |  SELECT doc_id, true_label, m_label, prior_sfp, k,
       |    num, den, length(bin(den)) - length(bin(num)) AS sft
       |  FROM sr
       |), sb2 AS (
       |  SELECT doc_id, true_label, m_label, prior_sfp, k, num, den,
       |    CAST(CASE WHEN num > ((den - 1) >> sft) THEN sft
       |      ELSE sft + 1 END AS BIGINT) AS bits
       |  FROM sb
       |), sc AS (
       |  SELECT doc_id, true_label, m_label, prior_sfp,
       |    k * (bits * 65536 - CAST(floor(
       |      (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       |        * pow(2.0, CAST(bits AS DOUBLE)) - 1.0) * 65536.0)
       |      AS BIGINT)) AS ks
       |  FROM sb2
       |), ds AS (
       |  SELECT doc_id, true_label, m_label,
       |    CAST(sum(ks) AS BIGINT) + prior_sfp AS total_sfp
       |  FROM sc GROUP BY doc_id, true_label, m_label, prior_sfp
       |), pr AS (
       |  SELECT doc_id, true_label, m_label AS pred_label,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY total_sfp ASC, m_label ASC) AS rn
       |  FROM ds
       |)""".stripMargin

  val nbQualityClassifySql: String =
    s"""$nbQualityCtes,
       |cells AS (
       |  SELECT true_label AS label, pred_label, count(*) AS n
       |  FROM pr WHERE rn = 1 GROUP BY 1, 2
       |), tot AS (
       |  SELECT label, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1
       |)
       |SELECT c.label, c.pred_label, c.n, t.n_true,
       |  (c.n * 1000000) // t.n_true AS share_fp
       |FROM cells c JOIN tot t ON c.label = t.label""".stripMargin

  val nbQualityCalibrationSql: String =
    s"""$nbQualityCtes,
       |bands AS (
       |  SELECT least(lb.qs_u // 100000, 9) AS band, pr.pred_label
       |  FROM pr JOIN lb ON pr.doc_id = lb.doc_id
       |  WHERE pr.rn = 1
       |)
       |SELECT band, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN pred_label = 'hi' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pred_hi,
       |  (CAST(sum(CASE WHEN pred_label = 'hi' THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000) // count(*) AS share_hi_fp
       |FROM bands GROUP BY 1""".stripMargin

  // ---------------------------------------------- PMI collocation mining

  private val pmiMinSupport = 5
  private val pmiTopN = 20

  /** Collocation mining by pointwise mutual information — the top
    * adjacent-token pairs by PMI = log2(N·c12 / (c1·c2)), the measure
    * that separates genuine multi-word units ("new york") from pairs
    * that co-occur only because both words are common ("of the", PMI≈0).
    * The min-support floor ([[pmiMinSupport]]) is the standard guard
    * against PMI's rare-pair bias (a hapax pair maxes the score).
    *
    * Exactness: PMI is reported in whole BITS — floor(log2 num/den)
    * computed purely from bit lengths and one shift-compare (log2 is a
    * transcendental with no cross-engine rounding contract; this engine
    * never ships one — same discipline as [[lmPerplexity]]'s ceil-log2
    * surprisal). With d = bitlen(num) − bitlen(den):
    * floor = d iff (num >> d) >= den (shift-compare, overflow-free),
    * else d − 1; negative d shifts num left instead, exercising both
    * branches on the fixtures.
    *
    * Shape: same bigram extraction as [[lmPerplexity]] (scan-side zip +
    * explode, one map-combinable pair agg); the unigram marginals are
    * re-aggregations of the PAIR table (vocabulary-sized, not corpus-
    * sized); the final ranking is TakeOrdered(20). */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val b = t.select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bc.groupBy("w1").agg(sum("c12").as("c1"))
    val c2 = bc.groupBy("w2").agg(sum("c12").as("c2"))
    val n = b.agg(count(lit(1)).as("n_bg"))
    bc.filter(col("c12") >= pmiMinSupport)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(n))
      .withColumn("num", col("n_bg") * col("c12"))
      .withColumn("den", col("c1") * col("c2"))
      .withColumn("d", (length(bin(col("num"))) - length(bin(col("den")))).cast("int"))
      .withColumn("pmi_bits", // SQL shiftright/shiftleft take column shifts
        expr("""CAST(d - 1 + CAST(IF(d >= 0,
          shiftright(num, d) >= den,
          shiftleft(num, -d) >= den) AS INT) AS BIGINT)"""))
      .select("w1", "w2", "c12", "c1", "c2", "pmi_bits")
      .orderBy(col("pmi_bits").desc, col("c12").desc, col("w1"), col("w2"))
      .limit(pmiTopN)
  }

  val pmiCollocationsSql: String =
    s"""WITH t AS (
       |  SELECT ${tokensSql("text")} AS toks FROM documents
       |), b AS (
       |  SELECT unnest(toks[1:len(toks)-1]) AS w1,
       |    unnest(toks[2:len(toks)]) AS w2
       |  FROM t WHERE len(toks) >= 2
       |), bc AS (
       |  SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1
       |), c2 AS (
       |  SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM bc GROUP BY 1
       |), n AS (
       |  SELECT count(*) AS n_bg FROM b
       |), s AS (
       |  SELECT w1, w2, c12, c1, c2,
       |    n_bg * c12 AS num, c1 * c2 AS den,
       |    length(bin(n_bg * c12)) - length(bin(c1 * c2)) AS d
       |  FROM bc JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
       |  WHERE c12 >= $pmiMinSupport
       |)
       |SELECT w1, w2, c12, c1, c2,
       |  CAST(d - 1 + CASE
       |    WHEN d >= 0 THEN CASE WHEN (num >> d) >= den THEN 1 ELSE 0 END
       |    ELSE CASE WHEN (num << (-d)) >= den THEN 1 ELSE 0 END
       |  END AS BIGINT) AS pmi_bits
       |FROM s
       |ORDER BY pmi_bits DESC, c12 DESC, w1, w2 LIMIT $pmiTopN""".stripMargin

  // ----------------------------------------------- winnowing fingerprints

  private[graft] val winnowK = 3 // tokens per k-gram
  private[graft] val winnowW = 4 // window of consecutive k-gram hashes

  /** Winnowing document fingerprints (Schleimer-Wilkerson-Aiken 2003 —
    * the MOSS algorithm): positional token 3-grams hashed to 40-bit
    * integers (md5-prefix, engine-portable), then in every window of
    * [[winnowW]] consecutive gram hashes select the MINIMUM (ties →
    * rightmost, the MOSS rule) and keep the distinct selections. Unlike
    * [[fingerprint]] (whole-document digests) these are LOCAL
    * fingerprints with the winnowing guarantee: any shared token run of
    * length >= w + k - 1 (= 6 tokens here) between two documents shares
    * at least one selected fingerprint, at an expected density of only
    * 2/(w+1) of grams — the copy-detection primitive at corpus scale
    * (equi-join docs on `fp` to find copied regions without ever
    * comparing texts). Documents with fewer than w grams winnow one
    * degenerate window covering all their grams.
    *
    * The rightmost-tie rule stays in exact integer space via one key per
    * gram: key = h40·2^20 + (2^20−1−pos); the window MIN of the key
    * decodes to (min hash, rightmost position). Fixture docs sit far
    * below 2^20 grams; a longer-doc deployment widens the position field.
    *
    * Shape: per-document loop in `mapPartitions` over the scan — ZERO
    * shuffle and O(w) work per gram (the declarative form needs explode +
    * a doc_id-partitioned window, a full gram-row shuffle; the oracle SQL
    * takes that form — same reason [[Dedup.shingleRows]] is a primitive
    * loop). Output is a per-doc distinct set, so emission order is
    * irrelevant downstream. */
  def winnowingFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowFps(Tables.documents(spark, dir))

  /** The winnow core over any (doc_id, text) frame — shared by the dir
    * query form above and the streaming twin
    * [[graft.streaming.StreamingWinnow]] (one implementation, so batch
    * and stream agree by construction). */
  private[graft] def winnowFps(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (k, w) = (winnowK, winnowW)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        // first 10 hex chars of md5 = first 5 bytes, as one 40-bit long
        def h40(s: String): Long = {
          val d = digest.digest(s.getBytes("UTF-8"))
          ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
            ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
        }
        it.flatMap { case (docId, text) =>
          val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          val n = toks.length - k + 1
          if (n < 1) Iterator.empty
          else {
            val keys = new Array[Long](n)
            var i = 0
            while (i < n) {
              val sb = new java.lang.StringBuilder
              var j = 0
              while (j < k) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j)); j += 1
              }
              // pos is 1-indexed to match the oracle's list indexing
              keys(i) = h40(sb.toString) * 1048576L + (1048575L - (i + 1))
              i += 1
            }
            val sel = new scala.collection.mutable.LinkedHashSet[Long]
            var p = 0
            val starts = math.max(1, n - w + 1)
            while (p < starts) {
              var kmin = keys(p)
              var q = p + 1
              val end = math.min(p + w, n)
              while (q < end) { if (keys(q) < kmin) kmin = keys(q); q += 1 }
              sel.add(kmin)
              p += 1
            }
            sel.iterator.map(km =>
              (docId, km / 1048576L, 1048575L - (km % 1048576L)))
          }
        }
      }.toDF("doc_id", "fp", "pos")
  }

  /** CTE chain ending in `wfp(doc_id, fp, pos)` — the winnowed
    * fingerprints. Shared prefix for [[winnowingFingerprintSql]] and
    * [[winnowCopyPairsSql]] (a constant, not a regex splice). */
  private[operators] val winnowCtes: String =
    s"""t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    unnest(generate_series(1, len(toks) - ${winnowK - 1})) AS pos,
       |    unnest(list_transform(generate_series(1, len(toks) - ${winnowK - 1}),
       |      i -> ${(0 until winnowK).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]").mkString(" || ' ' || ")})) AS gram
       |  FROM t WHERE len(toks) >= $winnowK
       |), kx AS (
       |  SELECT doc_id, pos,
       |    CAST(('0x' || substr(md5(gram), 1, 10)) AS BIGINT) * 1048576
       |      + (1048575 - pos) AS key,
       |    count(*) OVER (PARTITION BY doc_id) AS n
       |  FROM g
       |), wmin AS (
       |  SELECT doc_id, pos, n,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${winnowW - 1} FOLLOWING) AS kmin
       |  FROM kx
       |), wfp AS (
       |  SELECT DISTINCT doc_id, kmin // 1048576 AS fp,
       |    1048575 - (kmin % 1048576) AS pos
       |  FROM wmin WHERE pos <= greatest(1, n - $winnowW + 1)
       |)""".stripMargin

  val winnowingFingerprintSql: String =
    s"""WITH $winnowCtes
       |SELECT doc_id, fp, pos FROM wfp""".stripMargin

  private[graft] val winnowMaxDf = 50 // hot-fingerprint document-frequency cap
  private[graft] val winnowMinShared = 2L // pair floor: shared fingerprints

  /** The distinct (doc_id, fp) winnow table, memoized per (session, dir)
    * over locally-checkpointed blocks — the precomputed artifact a
    * production pipeline materializes ONCE: [[winnowCopyPairs]] reads it
    * from three join legs and [[winnowIncremental]] from four; without
    * the memo each leg re-runs the whole mapPartitions winnow (same
    * rationale and same [[graft.util.SessionCache]] recipe as Dedup's
    * shared shingle index). */
  private val wfpCache = new graft.util.SessionCache[
      (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])](
    valid = (s, v) => graft.util.Ckpt.blocksPresent(s, v._2),
    dispose = v => v._2.unpersist(blocking = false))

  private def sharedWinnowFps(spark: SparkSession, dir: String): DataFrame =
    wfpCache.get(spark, dir)(graft.util.Ckpt.materialize(
      winnowingFingerprint(spark, dir).select("doc_id", "fp").distinct()))._1

  /** MOSS copy-detection pairs over the winnowed fingerprints: documents
    * sharing >= [[winnowMinShared]] selected fingerprints, scored by
    * `cover` = common / min(|fps|) (the fraction of the smaller doc's
    * fingerprint set that matches — the MOSS report ranking). Fingerprints
    * present in more than [[winnowMaxDf]] documents are dropped before
    * pairing, the same DF skew guard as the shingle index: a
    * boilerplate gram in d docs generates O(d²) candidate pairs and
    * carries no copy signal. Candidate generation is the standard
    * inverted-index equi-self-join — only docs sharing a surviving
    * fingerprint are ever paired, never all-pairs. */
  def winnowCopyPairs(spark: SparkSession, dir: String): DataFrame = {
    val f = sharedWinnowFps(spark, dir)
    val hot = f.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > winnowMaxDf).select("fp")
    val fc = f.join(broadcast(hot), Seq("fp"), "left_anti")
    val sizes = fc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = fc.as("a").join(fc.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= winnowMinShared)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("cover",
        col("common").cast("double") / least(col("n1"), col("n2")))
      .select("d1", "d2", "common", "cover")
  }

  /** INCREMENTAL copy detection — [[winnowCopyPairs]] in the production
    * daily shape (same `doc_id % 10 == 7` batch slice convention as
    * [[Dedup.incrementalDedup]]): today's crawl is winnowed and joined
    * against the PERSISTED base fingerprint table; the base is never
    * re-paired against itself, so per-increment work is O(batch x
    * matches), not O(corpus²). `cover` here is the fraction of the BATCH
    * doc's fingerprints found in that base doc — the "how much of this
    * new document is copied, and from where" attribution a crawl
    * pipeline quarantines on. The hot-fingerprint cap is computed on the
    * BASE side only (it IS the persisted artifact; the batch must not
    * perturb it) and applied to both sides for one consistent universe. */
  def winnowIncremental(spark: SparkSession, dir: String): DataFrame = {
    val f = sharedWinnowFps(spark, dir)
    winnowMatchAgainstBase(
      f.filter(col("doc_id") % 10L === 7L),
      f.filter(col("doc_id") % 10L =!= 7L))
  }

  /** The SHARED batch-vs-base attribution core — one implementation for
    * the incremental query above and [[graft.streaming.StreamingWinnow]]
    * (stream and batch agree by construction, not by parallel edits):
    * hot-fp cap derived from the BASE (the persisted artifact), applied
    * to both sides; equi-join on fp; `cover` = the BATCH doc's matched
    * share. Inputs are distinct (doc_id, fp) tables. */
  private[graft] def winnowMatchAgainstBase(batchFps: DataFrame,
      baseFps: DataFrame): DataFrame = {
    val hot = baseFps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > winnowMaxDf).select("fp")
    val baseC = baseFps.join(broadcast(hot), Seq("fp"), "left_anti")
    val batchC = batchFps.join(broadcast(hot), Seq("fp"), "left_anti")
    val bsz = batchC.groupBy("doc_id").agg(count(lit(1)).as("n_batch"))
    batchC.as("a").join(baseC.as("b"), col("a.fp") === col("b.fp"))
      .groupBy(col("a.doc_id").as("batch_doc"), col("b.doc_id").as("base_doc"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= winnowMinShared)
      .join(bsz.withColumnRenamed("doc_id", "batch_doc"), "batch_doc")
      .withColumn("cover", col("common").cast("double") / col("n_batch"))
      .select("batch_doc", "base_doc", "common", "cover")
  }

  val winnowIncrementalSql: String =
    s"""WITH $winnowCtes,
       |f AS (SELECT DISTINCT doc_id, fp FROM wfp),
       |batch AS (SELECT * FROM f WHERE doc_id % 10 = 7),
       |base AS (SELECT * FROM f WHERE doc_id % 10 <> 7),
       |hot AS (SELECT fp FROM base GROUP BY fp HAVING count(*) > $winnowMaxDf),
       |basec AS (SELECT * FROM base ANTI JOIN hot USING (fp)),
       |batchc AS (SELECT * FROM batch ANTI JOIN hot USING (fp)),
       |bsz AS (SELECT doc_id, count(*) AS n_batch FROM batchc GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS batch_doc, b.doc_id AS base_doc,
       |    count(*) AS common
       |  FROM batchc a JOIN basec b ON a.fp = b.fp
       |  GROUP BY 1, 2 HAVING count(*) >= $winnowMinShared
       |)
       |SELECT batch_doc, base_doc, common,
       |  CAST(common AS DOUBLE) / n_batch AS cover
       |FROM p JOIN bsz ON batch_doc = bsz.doc_id""".stripMargin

  val winnowCopyPairsSql: String =
    s"""WITH $winnowCtes,
       |f AS (SELECT DISTINCT doc_id, fp FROM wfp),
       |hot AS (SELECT fp FROM f GROUP BY fp HAVING count(*) > $winnowMaxDf),
       |fc AS (SELECT * FROM f ANTI JOIN hot USING (fp)),
       |sz AS (SELECT doc_id, count(*) AS n FROM fc GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
       |  FROM fc a JOIN fc b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $winnowMinShared
       |)
       |SELECT d1, d2, common,
       |  CAST(common AS DOUBLE) / least(x.n, y.n) AS cover
       |FROM p JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id""".stripMargin

  // --------------------------------------- content-defined chunking (CDC)

  private[graft] val cdcMod = 16L // expected chunk length in tokens

  /** Content-defined chunking (the Rabin/Gear-CDC family, here in its
    * simplest content-hash-gated form): a chunk boundary falls AFTER any
    * token whose 40-bit md5 hash ≡ 0 (mod [[cdcMod]]), plus a forced
    * final boundary — so boundaries depend ONLY on local content, never
    * on position. That is the property fixed windows ([[docChunks]],
    * [[chunkDedup]]) lack: insert one token at the front of a document
    * and every fixed window shifts and re-hashes, while CDC chunks
    * after the first boundary are byte-identical — the dedup signal
    * survives edits (CdcSpec pins exactly this). Production CDC adds
    * min/max chunk clamps; the unclamped form keeps the oracle simple
    * and the boundary semantics identical cross-engine.
    *
    * Shape: per-document loop in `mapPartitions` over the scan — zero
    * shuffle, like [[winnowFps]] (the oracle takes the declarative
    * running-sum-over-boundary-flags form). */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(Tables.documents(spark, dir))

  /** [[cdcChunks]] over an arbitrary (doc_id, text, ...) frame — the form
    * the incremental query and [[graft.streaming.StreamingCdc]] run on
    * micro-batches. */
  def cdcChunksOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        val hexChars = "0123456789abcdef".toCharArray
        // char-table hex + byte-level 40-bit prefix: this loop hashes
        // every token, and java.util.Formatter-based hex (f"%02x") was
        // the measured hot spot at ~2 orders over the digest itself
        def hex(d: Array[Byte]): String = {
          val out = new Array[Char](32)
          var i = 0
          while (i < 16) {
            out(2 * i) = hexChars((d(i) >> 4) & 0xf)
            out(2 * i + 1) = hexChars(d(i) & 0xf)
            i += 1
          }
          new String(out)
        }
        def h40(s: String): Long = {
          val d = digest.digest(s.getBytes("UTF-8"))
          ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
            ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
        }
        it.flatMap { case (docId, text) =>
          val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          if (toks.isEmpty) Iterator.empty
          else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, String)]
            val sb = new java.lang.StringBuilder
            var nInChunk = 0L
            var chunkIdx = 1L
            var i = 0
            while (i < toks.length) {
              if (nInChunk > 0) sb.append(' ')
              sb.append(toks(i)); nInChunk += 1
              if (h40(toks(i)) % cdcMod == 0L || i == toks.length - 1) {
                out += ((docId, chunkIdx, nInChunk,
                  hex(digest.digest(sb.toString.getBytes("UTF-8")))))
                sb.setLength(0); nInChunk = 0L; chunkIdx += 1L
              }
              i += 1
            }
            out.iterator
          }
        }
      }.toDF("doc_id", "chunk_idx", "n_toks", "chunk_md5")
  }

  /** CTE chain ending in `cdc(doc_id, chunk_idx, n_toks, chunk_md5)` —
    * shared by [[cdcChunksSql]] and [[cdcDedupSql]]. */
  private[operators] val cdcCtes: String =
    s"""t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), tok AS (
       |  SELECT doc_id,
       |    unnest(toks) AS w,
       |    unnest(generate_series(1, len(toks))) AS pos,
       |    len(toks) AS n
       |  FROM t WHERE len(toks) >= 1
       |), bf AS (
       |  SELECT doc_id, w, pos,
       |    CASE WHEN CAST(('0x' || substr(md5(w), 1, 10)) AS BIGINT)
       |        % $cdcMod = 0 OR pos = n
       |      THEN 1 ELSE 0 END AS is_b
       |  FROM tok
       |), cix AS (
       |  SELECT doc_id, w, pos,
       |    coalesce(sum(is_b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
       |      AS chunk_idx
       |  FROM bf
       |), cdc AS (
       |  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |    count(*) AS n_toks,
       |    md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_md5
       |  FROM cix GROUP BY doc_id, chunk_idx
       |)""".stripMargin

  val cdcChunksSql: String =
    s"""WITH $cdcCtes
       |SELECT doc_id, chunk_idx, CAST(n_toks AS BIGINT) AS n_toks, chunk_md5
       |FROM cdc""".stripMargin

  /** Cross-document duplicate CDC chunks — the shift-robust boilerplate
    * table: chunks whose content recurs (>1 occurrence corpus-wide),
    * with document reach and occurrence counts. Because boundaries are
    * content-defined, a copied passage embedded at ANY offset inside a
    * new document still lands on the same chunk digests — fixed windows
    * only match when the copy lands window-aligned. One hash agg over
    * the chunk table; nothing wider than (md5, counts) shuffles. */
  def cdcDedup(spark: SparkSession, dir: String): DataFrame =
    cdcChunks(spark, dir)
      .groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min("n_toks").as("n_toks"))
      .filter(col("n_occurrences") > 1L)

  val cdcDedupSql: String =
    s"""WITH $cdcCtes
       |SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs,
       |  count(*) AS n_occurrences,
       |  CAST(min(n_toks) AS BIGINT) AS n_toks
       |FROM cdc GROUP BY 1 HAVING count(*) > 1""".stripMargin

  /** The distinct chunk table, memoized per (session, dir) over
    * locally-checkpointed blocks — [[cdcIncremental]] reads it from two
    * legs (batch + base); same recipe as the winnow fp memo. */
  private val cdcChunkCache = new graft.util.SessionCache[
      (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])](
    valid = (s, v) => graft.util.Ckpt.blocksPresent(s, v._2),
    dispose = v => v._2.unpersist(blocking = false))

  private def sharedCdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunkCache.get(spark, dir)(graft.util.Ckpt.materialize(
      cdcChunks(spark, dir)))._1

  /** The persistent CDC base artifact: one row per distinct chunk digest,
    * keeper = smallest doc_id carrying it (n_toks is content-determined
    * by the digest, so min is just a deterministic pick). */
  private[graft] def cdcBaseDigestsOf(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_md5")
      .agg(min("doc_id").as("base_doc"), min("n_toks").as("n_toks"))

  /** The SHARED batch-vs-base CDC attribution core — one implementation
    * for [[cdcIncremental]] and [[graft.streaming.StreamingCdc]] (stream
    * and batch agree by construction): the batch's chunks equi-joined to
    * the base digest table on chunk_md5. One row per MATCHED batch
    * chunk — the chunk-level decontamination/boilerplate attribution a
    * crawl pipeline cuts or quarantines on. Only digests + positions
    * shuffle; the base is never re-paired against itself. */
  private[graft] def cdcMatchAgainstBase(batchChunks: DataFrame,
      base: DataFrame): DataFrame =
    batchChunks.join(base.select("chunk_md5", "base_doc"), "chunk_md5")
      .select("doc_id", "chunk_idx", "n_toks", "chunk_md5", "base_doc")

  /** INCREMENTAL CDC dedup — the daily-crawl shape (same `doc_id % 10 ==
    * 7` batch slice convention as [[winnowIncremental]] and
    * [[Dedup.incrementalDedup]]): today's crawl is chunked and its chunk
    * digests attributed against the PERSISTED base digest table. Because
    * boundaries are content-defined, a copied-then-edited passage still
    * matches every chunk after the first post-edit boundary — the
    * incremental form inherits CdcSpec's edit-survival property, which
    * the fixed-window incremental dedup lacks. */
  def cdcIncremental(spark: SparkSession, dir: String): DataFrame = {
    val chunks = sharedCdcChunks(spark, dir)
    cdcMatchAgainstBase(
      chunks.filter(col("doc_id") % 10L === 7L),
      cdcBaseDigestsOf(chunks.filter(col("doc_id") % 10L =!= 7L)))
  }

  val cdcIncrementalSql: String =
    s"""WITH $cdcCtes,
       |batch AS (SELECT * FROM cdc WHERE doc_id % 10 = 7),
       |base AS (
       |  SELECT chunk_md5, min(doc_id) AS base_doc
       |  FROM cdc WHERE doc_id % 10 <> 7 GROUP BY 1
       |)
       |SELECT b.doc_id, b.chunk_idx, CAST(b.n_toks AS BIGINT) AS n_toks,
       |  b.chunk_md5, base.base_doc
       |FROM batch b JOIN base USING (chunk_md5)""".stripMargin

  // ------------------------------------------------ blocklist policy gate

  /** Fixture blocklist: three phrases that occur in the corpus, two that
    * cannot — both branches of the gate exercised. A deployment swaps in
    * its policy dictionary (thousands of phrases stay broadcast-sized).
    * Entries are VALIDATED against the join-key shape at load: the scan
    * side only ever emits lowercase token BIGRAMS, so a 3-token, cased,
    * or punctuated entry could never match anything — it would fail OPEN
    * silently, the one failure mode a compliance gate must not have. */
  private[graft] val blocklist: Seq[String] = {
    val raw = Seq("table hash", "slow key", "big order",
      "forbidden phrase", "data exfiltration")
    raw.foreach { p =>
      val norm = p.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      require(norm.length == 2 && norm.mkString(" ") == p,
        s"blocklist entry '$p' is not two normalized tokens — it could " +
          "never match a scan-side bigram and would fail open")
    }
    raw
  }

  /** Banned-phrase policy gate — the compliance/toxicity filter every
    * production corpus pipeline runs before training: per document, how
    * many blocklisted bigram phrases occur (occurrence count, not doc
    * count), WHICH distinct phrases (sorted, so the list is order-free),
    * and the `blocked` verdict. Every document is reported — the zero-hit
    * rows are the pass-through population a reviewer needs for rates.
    *
    * Shape: the dictionary broadcasts (a policy list is small by
    * construction); documents make one scan-side pass exploding token
    * bigrams which die immediately against the broadcast hash join —
    * nothing document-scale shuffles except the per-doc hit aggregate.
    * Longer phrases generalize by widening the gram (the join key stays
    * one string); regex-class rules belong in [[corpusScrubV2]]'s lane. */
  def blocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val b = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"),
        concat_ws(" ", col("bg.w1"), col("bg.w2")).as("ph"))
    val bl = blocklist.toDF("ph")
    val hits = b.join(broadcast(bl), Seq("ph"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        array_join(sort_array(array_distinct(collect_list(col("ph")))), ",")
          .as("phrases"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hits")).na.fill("", Seq("phrases"))
      .withColumn("blocked", col("n_hits") > 0L)
  }

  val blocklistFilterSql: String = {
    val inList = blocklist.map(p => s"'$p'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), b AS (
       |  SELECT doc_id,
       |    unnest(toks[1:len(toks)-1]) AS w1,
       |    unnest(toks[2:len(toks)]) AS w2
       |  FROM t WHERE len(toks) >= 2
       |), bp AS (
       |  SELECT doc_id, w1 || ' ' || w2 AS ph FROM b
       |), h AS (
       |  SELECT doc_id, count(*) AS n_hits,
       |    list_aggregate(list_sort(list_distinct(list(ph))),
       |      'string_agg', ',') AS phrases
       |  FROM bp WHERE ph IN ($inList) GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       |  coalesce(phrases, '') AS phrases,
       |  coalesce(n_hits, 0) > 0 AS blocked
       |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin
  }

  // ------------------------------------------ Kneser-Ney bigram scoring

  /** Interpolated Kneser-Ney bigram scorer (Kneser-Ney 1995; the
    * interpolated form of Chen-Goodman 1999), absolute discount D = 3/4:
    *
    *   P(w2|w1) = max(c12−D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/B
    *
    * where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    * left-contexts of w2 (the continuation probability — "how many
    * contexts has this word followed" — that distinguishes KN from
    * [[lmPerplexity]]'s add-smoothing and is the standard LM-quality
    * filter signal), and B = distinct bigram types standing in for
    * Σ_w N1+(·w). Multiplying through by 4·c1·B keeps the probability an
    * exact integer ratio:
    *
    *   num = max(4·c12 − 3, 0)·B + 3·N1(w1)·N2(w2),   den = 4·c1·B
    *
    * num ≥ 1 for every observed bigram and num ≤ den always (equality
    * only in the degenerate single-continuation corpus), so the
    * ceil-log2 bits and the 1e-9 fixed-point probability follow
    * [[lmPerplexity]]'s exact cross-engine recipe unchanged. The closed
    * fixture vocabulary keeps B small, so the BIGINT products sit far
    * under 2^63; an open-vocab 100 TB deployment would move num/den to
    * doubles (and lose the oracle, not the plan).
    *
    * Shape: three map-combinable count aggs (bigram + both margins), two
    * vocab-sized joins (auto-broadcast at any realistic vocab), one 1-row
    * broadcast (B) — same skeleton as [[lmPerplexity]]. */
  def knPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val b = t.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bc.groupBy("w1").agg(sum("c12").as("c1"), count(lit(1)).as("n1"))
    val c2 = bc.groupBy("w2").agg(count(lit(1)).as("n2"))
    val bb = bc.agg(count(lit(1)).as("bt"))
    val db = b.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
    val scored = db.join(bc, Seq("w1", "w2")).join(c1, Seq("w1"))
      .join(c2, Seq("w2")).crossJoin(broadcast(bb))
      .withColumn("num",
        greatest(col("c12") * 4L - 3L, lit(0L)) * col("bt")
          + col("n1") * col("n2") * 3L)
      .withColumn("den", col("c1") * 4L * col("bt"))
      .withColumn("sft",
        (length(bin(col("den"))) - length(bin(col("num")))).cast("int"))
      .withColumn("bits",
        when(col("num") > expr("shiftright(den - 1, sft)"), col("sft"))
          .otherwise(col("sft") + 1).cast("long"))
      .withColumn("p_fp",
        floor(col("num").cast("double") / col("den").cast("double")
          * 1000000000.0 + 0.5).cast("long"))
    scored.groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        sum(col("k") * col("bits")).as("total_bits"),
        sum(col("k") * col("p_fp")).as("s_pfp"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        (col("total_bits").cast("double") / col("n_bigrams")).as("bits_per_bigram"),
        (col("s_pfp").cast("double") / col("n_bigrams") / 1000000000.0).as("mean_p"))
  }

  val knPerplexitySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), b AS (
       |  SELECT doc_id,
       |    unnest(toks[1:len(toks)-1]) AS w1,
       |    unnest(toks[2:len(toks)]) AS w2
       |  FROM t WHERE len(toks) >= 2
       |), bc AS (
       |  SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1
       |  FROM bc GROUP BY 1
       |), c2 AS (
       |  SELECT w2, count(*) AS n2 FROM bc GROUP BY 1
       |), bb AS (
       |  SELECT count(*) AS bt FROM bc
       |), db AS (
       |  SELECT doc_id, w1, w2, count(*) AS k FROM b GROUP BY 1, 2, 3
       |), s AS (
       |  SELECT doc_id, k,
       |    greatest(c12 * 4 - 3, 0) * bt + n1 * n2 * 3 AS num,
       |    c1 * 4 * bt AS den
       |  FROM db JOIN bc USING (w1, w2) JOIN c1 USING (w1)
       |    JOIN c2 USING (w2) CROSS JOIN bb
       |), s2 AS (
       |  SELECT doc_id, k, num, den,
       |    length(bin(den)) - length(bin(num)) AS sft
       |  FROM s
       |), sc AS (
       |  SELECT doc_id, k,
       |    CAST(CASE WHEN num > ((den - 1) >> sft) THEN sft
       |      ELSE sft + 1 END AS BIGINT) AS bits,
       |    CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       |      * 1000000000.0 + 0.5) AS BIGINT) AS p_fp
       |  FROM s2
       |)
       |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
       |  CAST(sum(k * bits) AS BIGINT) AS total_bits,
       |  CAST(sum(k * bits) AS DOUBLE) / sum(k) AS bits_per_bigram,
       |  CAST(sum(k * p_fp) AS DOUBLE) / sum(k) / 1000000000.0 AS mean_p
       |FROM sc GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pmi_collocations" -> (pmiCollocations _),
    "bpe_coverage" -> (bpeCoverage _),
    "lang_id_confusion" -> (langIdConfusion _),
    "nb_lang_classify" -> (nbLangClassify _),
    "nb_quality_classify" -> (nbQualityClassify _),
    "nb_quality_calibration" -> (nbQualityCalibration _),
    "bpe_roundtrip" -> (bpeRoundtrip _),
    "cms_heavy_hitters" -> (cmsHeavyHitters _),
    "gopher_rules" -> (gopherRules _),
    "lm_perplexity" -> (lmPerplexity _),
    "token_ids" -> (tokenIds _),
    "quality_calibration" -> (qualityCalibration _),
    "doc_length_histogram" -> (docLengthHistogram _),
    "doc_novelty" -> (docNovelty _),
    "doc_repetition" -> (docRepetition _),
    "text_stats" -> (textStats _),
    "lang_id" -> (langId _),
    "token_count" -> (tokenCount _),
    "doc_fingerprint" -> (fingerprint _),
    "doc_chunks" -> (docChunks _),
    "doc_keywords" -> (docKeywords _),
    "vocab_topk" -> (vocabTopk _),
    "corpus_scrub" -> (corpusScrub _),
    "corpus_scrub_v2" -> (corpusScrubV2 _),
    "bpe_top_merges" -> (bpeTopMerges _),
    "bpe_merge_table" -> (bpeMergeTable _),
    "bpe_encode" -> (bpeEncode _),
    "bpe_fertility" -> (bpeFertility _),
    "token_rarity" -> (tokenRarity _),
    "chunk_dedup" -> (chunkDedup _),
    "winnowing_fingerprint" -> (winnowingFingerprint _),
    "winnow_copy_pairs" -> (winnowCopyPairs _),
    "winnow_incremental" -> (winnowIncremental _),
    "blocklist_filter" -> (blocklistFilter _),
    "cdc_chunks" -> (cdcChunks _),
    "cdc_dedup" -> (cdcDedup _),
    "cdc_incremental" -> (cdcIncremental _),
    "kn_perplexity" -> (knPerplexity _),
  )

  val oracles: Map[String, String] = Map(
    "pmi_collocations" -> pmiCollocationsSql,
    "bpe_coverage" -> bpeCoverageSql,
    "lang_id_confusion" -> langIdConfusionSql,
    "nb_lang_classify" -> nbLangClassifySql,
    "nb_quality_classify" -> nbQualityClassifySql,
    "nb_quality_calibration" -> nbQualityCalibrationSql,
    "bpe_roundtrip" -> bpeRoundtripSql,
    "cms_heavy_hitters" -> cmsHeavyHittersSql,
    "gopher_rules" -> gopherRulesSql,
    "lm_perplexity" -> lmPerplexitySql,
    "token_ids" -> tokenIdsSql,
    "quality_calibration" -> qualityCalibrationSql,
    "doc_length_histogram" -> docLengthHistogramSql,
    "doc_novelty" -> docNoveltySql,
    "doc_repetition" -> docRepetitionSql,
    "text_stats" -> textStatsSql,
    "lang_id" -> langIdSql,
    "token_count" -> tokenCountSql,
    "doc_fingerprint" -> fingerprintSql,
    "doc_chunks" -> docChunksSql,
    "doc_keywords" -> docKeywordsSql,
    "vocab_topk" -> vocabTopkSql,
    "corpus_scrub" -> corpusScrubSql,
    "corpus_scrub_v2" -> corpusScrubV2Sql,
    "bpe_top_merges" -> bpeTopMergesSql,
    "bpe_merge_table" -> bpeMergeTableSql,
    "bpe_encode" -> bpeEncodeSql,
    "bpe_fertility" -> bpeFertilitySql,
    "token_rarity" -> tokenRaritySql,
    "chunk_dedup" -> chunkDedupSql,
    "winnowing_fingerprint" -> winnowingFingerprintSql,
    "winnow_copy_pairs" -> winnowCopyPairsSql,
    "winnow_incremental" -> winnowIncrementalSql,
    "blocklist_filter" -> blocklistFilterSql,
    "cdc_chunks" -> cdcChunksSql,
    "cdc_dedup" -> cdcDedupSql,
    "cdc_incremental" -> cdcIncrementalSql,
    "kn_perplexity" -> knPerplexitySql,
  )
}
