package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: fuzzy-match dirty records back to
  * a canonical registry without ever comparing all pairs. The reference
  * engine has no linkage surface (SURVEY.md §2 "categories the reference
  * does NOT have") — this is north-star capability for the
  * training-data use case: the same blocked-candidates → cheap-verify →
  * best-match shape links scraped author/site/entity strings to a
  * canonical registry during corpus assembly.
  *
  * Pipeline shape (the standard Fellegi-Sunter blocking architecture):
  *
  *  1. BLOCK — MULTI-KEY, the standard recall armor: a record enters the
  *     candidate set if ANY pass surfaces it. Pass A explodes each name
  *     into its character q-grams (q=4); pass B keys on the name's
  *     6-char suffix (one row per record — the cheap high-precision
  *     pass). Candidates form by equi-joins on the blocking keys,
  *     unioned. Hash-partitionable, never O(n²). Two passes matter at
  *     scale: on the sf1 replica corpus (10× denser keyspace) the gram
  *     pass alone links 62.6% — density pushes ever more grams over the
  *     DF cap — while grams ∪ suffix holds recall (SCALE_NOTES).
  *  2. DF-CAP — a gram shared by more than [[gramDfCap]] registry names
  *     is dropped from the index before the join (same hot-shingle
  *     guard as [[Dedup.ngramJaccard]]): a stop-gram ("0000", the
  *     shared "Customer#" prefix) would otherwise pair everyone with
  *     everyone — the quadratic blow-up arrives through skew, and the
  *     cap bounds every gram bucket by a constant. The price is recall
  *     on records whose EVERY gram is common (fixture: the all-zeros
  *     low custkeys) — they surface in no candidate pair and fall out
  *     unmatched, the documented blocking tradeoff.
  *  3. VERIFY — exact Levenshtein on the surviving candidates only
  *     (integer edit distance: bit-identical in any engine), threshold
  *     [[maxEditDist]].
  *  4. RESOLVE — best match per dirty record = (min distance, min key)
  *     on the native bounded-heap operator ([[graft.plans.TopKPerKey]],
  *     k=1): each map task reduces a dirty record to one row before the
  *     final exchange, so even a record with thousands of candidate
  *     matches crosses the shuffle as one row per partition.
  *
  * The dirty side is derived deterministically from the registry itself
  * (delete one character at an md5-chosen position), so both engines
  * build the identical input and the oracle can check the whole
  * pipeline end-to-end — and ground truth is known by construction:
  * `self_match` reports whether linkage recovered the original record.
  * (Recovery is ~81%, not ~100%: deleting one digit from a zero-padded
  * key is often genuinely ambiguous — "…00001234" minus its '1' is
  * lev-1 from key 1234 AND key 234 — and the min-key tie-break resolves
  * the tie deterministically. `WaveThreeSpec` pins the measured rate.)
  */
object Linkage {

  private val gramLen = 4
  private val gramDfCap = 25L
  private val sfxLen = 6
  private val sfxDfCap = 50L // tolerates registry-duplication floods; capped like grams
  private val maxEditDist = 2

  /** Character q-grams of `name`, exploded — positions 1..len-q+1. */
  private def gramsOf(df: DataFrame, nameCol: String): DataFrame =
    df.filter(length(col(nameCol)) >= gramLen)
      .withColumn("gram",
        explode(expr(s"transform(sequence(1, length($nameCol) - ${gramLen - 1}), " +
          s"i -> substring($nameCol, i, $gramLen))")))

  private def gramsSql(src: String, key: String, nameCol: String): String =
    s"""SELECT DISTINCT $key, unnest(list_transform(
       |    range(1, length($nameCol) - ${gramLen - 2}),
       |    i -> substr($nameCol, CAST(i AS INT), $gramLen))) AS gram
       |  FROM $src WHERE length($nameCol) >= $gramLen""".stripMargin

  /** Pass-B blocking key: the name's last [[sfxLen]] chars. */
  private def sfxOf(nameCol: String) =
    expr(s"substring($nameCol, length($nameCol) - ${sfxLen - 1})")

  private def sfxSql(nameCol: String): String =
    s"substr($nameCol, length($nameCol) - ${sfxLen - 1})"

  /** The deterministic "dirty" side: every registry name with ONE
    * character deleted at an md5-derived position — a reproducible typo
    * corpus with known ground truth. */
  private def dirtySide(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        (conv(substring(md5(col("c_name")), 1, 6), 16, 10).cast("long")
          % length(col("c_name"))).as("p"))
      .select(col("c_custkey").as("dirty_key"),
        expr("concat(substring(c_name, 1, CAST(p AS INT)), " +
          "substring(c_name, CAST(p + 2 AS INT)))").as("dirty_name"))

  private val dirtySql: String =
    s"""SELECT c_custkey AS dirty_key,
       |    concat(substr(c_name, 1, CAST(p AS INT)),
       |           substr(c_name, CAST(p + 2 AS INT))) AS dirty_name
       |  FROM (SELECT c_custkey, c_name,
       |      CAST(('0x' || substr(md5(c_name), 1, 6)) AS BIGINT)
       |        % length(c_name) AS p
       |    FROM customer)""".stripMargin

  /** Match every dirty record to its best registry candidate. Output:
    * one row per LINKED dirty record — (dirty_key, matched_key,
    * lev_dist, self_match); blocked-out records (no rare gram) and
    * records whose best candidate exceeds [[maxEditDist]] are absent. */
  def entityMatches(spark: SparkSession, dir: String): DataFrame = {
    val registry = Tables.customer(spark, dir).select("c_custkey", "c_name")
    val dirty = dirtySide(spark, dir)

    val regGrams = gramsOf(registry, "c_name")
      .select("c_custkey", "gram").distinct()
    val rareGrams = regGrams.groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= gramDfCap)
      .select("gram")
    val dirtyGrams = gramsOf(dirty, "dirty_name")
      .select("dirty_key", "gram").distinct()

    val regSfx = registry.select(col("c_custkey"), sfxOf("c_name").as("bk"))
    val rareSfx = regSfx.groupBy("bk").agg(count(lit(1)).as("df"))
      .filter(col("df") <= sfxDfCap).select("bk")
    val dirtySfx = dirty.select(col("dirty_key"), sfxOf("dirty_name").as("bk"))

    val cand = dirtyGrams
      .join(regGrams.join(rareGrams, "gram"), "gram")
      .select("dirty_key", "c_custkey")
      .unionByName(dirtySfx
        .join(regSfx.join(rareSfx, "bk"), "bk")
        .select("dirty_key", "c_custkey"))
      .distinct()

    val verified = cand
      .join(dirty, "dirty_key")
      .join(registry, "c_custkey")
      .withColumn("lev_dist", levenshtein(col("dirty_name"), col("c_name")))
      .filter(col("lev_dist") <= maxEditDist)
      .select(col("dirty_key"), col("c_custkey").as("matched_key"), col("lev_dist"))

    graft.plans.TopKPerKey.topK(verified,
        keys = Seq(col("dirty_key")),
        order = Seq(col("lev_dist"), col("matched_key")),
        k = 1)
      .withColumn("self_match", col("dirty_key") === col("matched_key"))
  }

  val entityMatchesSql: String =
    s"""WITH d AS (
       |  $dirtySql
       |), rg AS (
       |  ${gramsSql("customer", "c_custkey", "c_name")}
       |), rare AS (
       |  SELECT gram FROM (SELECT gram, count(*) AS df FROM rg GROUP BY 1)
       |  WHERE df <= $gramDfCap
       |), dg AS (
       |  ${gramsSql("d", "dirty_key", "dirty_name")}
       |), rs AS (
       |  SELECT c_custkey, ${sfxSql("c_name")} AS bk FROM customer
       |), rares AS (
       |  SELECT bk FROM (SELECT bk, count(*) AS df FROM rs GROUP BY 1)
       |  WHERE df <= $sfxDfCap
       |), ds AS (
       |  SELECT dirty_key, ${sfxSql("dirty_name")} AS bk FROM d
       |), cand AS (
       |  SELECT DISTINCT dirty_key, c_custkey FROM (
       |    SELECT dg.dirty_key, rg.c_custkey
       |    FROM dg JOIN rare USING (gram) JOIN rg USING (gram)
       |    UNION ALL
       |    SELECT ds.dirty_key, rs.c_custkey
       |    FROM ds JOIN rares USING (bk) JOIN rs USING (bk))
       |), v AS (
       |  SELECT cand.dirty_key, cand.c_custkey AS matched_key,
       |    levenshtein(d.dirty_name, r.c_name) AS lev_dist
       |  FROM cand
       |  JOIN d ON cand.dirty_key = d.dirty_key
       |  JOIN customer r ON cand.c_custkey = r.c_custkey
       |  WHERE levenshtein(d.dirty_name, r.c_name) <= $maxEditDist
       |)
       |SELECT dirty_key, matched_key, lev_dist,
       |  dirty_key = matched_key AS self_match
       |FROM (
       |  SELECT dirty_key, matched_key, lev_dist,
       |    row_number() OVER (
       |      PARTITION BY dirty_key ORDER BY lev_dist, matched_key) AS rn
       |  FROM v)
       |WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "entity_matches" -> (entityMatches _),
  )

  val oracles: Map[String, String] = Map(
    "entity_matches" -> entityMatchesSql,
  )
}
