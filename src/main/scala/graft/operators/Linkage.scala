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

  /** Distinct (key, gram) rows via a primitive per-partition loop. The
    * declarative `explode(transform(sequence(...)))` form this replaces
    * evaluates interpreted higher-order functions per element — the same
    * ~10x per-task penalty [[Dedup.shingleRows]] measured and removed in
    * its shingle loop (guide §1.2 step 2: per-task work). Per-name gram
    * dedup here equals the global `.distinct()` the old call sites ran
    * (both key columns are primary keys), so the exchange that distinct
    * paid disappears too. */
  private def gramRows(df: DataFrame, keyCol: String, nameCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(nameCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (k, name) =>
          if (name == null || name.length < gramLen) Iterator.empty
          else {
            val set = new scala.collection.mutable.LinkedHashSet[String]
            var i = 0
            while (i + gramLen <= name.length) {
              set.add(name.substring(i, i + gramLen)); i += 1
            }
            set.iterator.map(g => (k, g))
          }
        }
      }.toDF(keyCol, "gram")
  }

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
    // the dirty side is read by three legs (grams, suffix key, verify
    // join) and derives each name with an md5 + substring pass — pin it
    // once (a deployment reads its dirty records from a stored table)
    val dirty = graft.operators.Dedup.eager(dirtySide(spark, dir))

    val regGrams = graft.operators.Dedup.eager(
      gramRows(registry, "c_custkey", "c_name"))
    val rareGrams = regGrams.groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= gramDfCap)
      .select("gram")
    val dirtyGrams = gramRows(dirty, "dirty_key", "dirty_name")

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

    // Verify-side name attachment: below spark.graft.linkage.broadcastRows
    // (the registry cardinality — ~40 B/row of key+name; the 4M default
    // is a ~300 MB relation, conf'd per cluster, 0 disables) both name
    // tables broadcast and the levenshtein verify runs MAP-SIDE over the
    // repartitioned candidate set. Without this, AQE coalesced the
    // verify join's ~2 MB of shuffle input into ONE partition and the
    // whole edit-distance pass (the query's only real CPU, StageProfile:
    // 1.3 s of 2.1 s total task time) serialized on one core — partition
    // sizing is bytes-based and blind to expression cost (guide §2.5's
    // lesson applied to an expensive projection). Past the gate the
    // hash-join form stands and AQE behaves (real byte volume).
    val bcastRows = spark.conf
      .get("spark.graft.linkage.broadcastRows", "4000000").toLong
    val nReg = dirty.count() // cached-block scan; |dirty| == |registry|
    val smallReg = bcastRows > 0 && nReg <= bcastRows
    val verified = (if (smallReg)
        cand.repartition(spark.sparkContext.defaultParallelism)
          .join(broadcast(dirty), "dirty_key")
          .join(broadcast(registry), "c_custkey")
      else cand.join(dirty, "dirty_key").join(registry, "c_custkey"))
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
