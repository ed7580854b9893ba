package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding array<float>`, `label`).
  *
  * Brute-force cosine top-k is the exactness baseline (query set broadcast
  * against a scanned candidate set — at 100 TB the candidates stream
  * through executors and only k rows per query survive the per-partition
  * top-k heap). The sign-LSH variant is the scale path: each vector gets a
  * deterministic 8-bit hyperplane-sign bucket, and search touches only the
  * query's bucket — the self-join key is hash-partitionable exactly like
  * any equi-join.
  *
  * Determinism: float elements are widened to double, dot products are
  * SEQUENTIAL left folds (both engines evaluate list folds in index
  * order — verified empirically bit-for-bit), hyperplane coefficients are
  * +-1 from md5 parity, and ranking orders by a fixed-point-rounded
  * similarity with vec_id tie-breaks.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays — the codegen'd
    * native expression ([[graft.functions.DotDouble]]); identical
    * bit-for-bit to the interpreted HOF form
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` it replaced (same
    * ascending-index IEEE fold), but compiled into the whole-stage loop:
    * measured ~1.9x on a 10-query x 50k-vector brute-force scan at sf0.1
    * (tools/DotBench), where the dot product is the inner loop. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotd(a, b)

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))"

  /** Similarity rounded to 1e-6 fixed point: tolerates any residual ulp
    * divergence while keeping ordering deterministic. */
  private def simRound(c: Column): Column =
    floor(c * 1000000.0 + 0.5) / 1000000.0

  private def simRoundSql(e: String): String =
    s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  private val vecsSql: String =
    """v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings
      |), vn AS (
      |  SELECT vec_id, v, sqrt(%s) AS norm FROM v
      |)""".stripMargin.format("list_sum(list_transform(list_zip(v, v), x -> x[1] * x[2]))")

  private val numQueries = 10
  private val topK = 5

  /** Brute-force cosine top-k: the first `numQueries` vectors against the
    * full set. Exact baseline for ANN variants. */
  def annTopkCosine(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_r").desc, col("vec_id"))
    all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim_r",
        simRound(dot(col("qv"), col("v")) / (col("qn") * col("norm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id").as("cand_id"), col("sim_r"))
  }

  val annTopkCosineSql: String =
    s"""WITH $vecsSql,
       |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM vn
       |  WHERE vec_id < $numQueries),
       |s AS (
       |  SELECT q.q_id, c.vec_id,
       |    ${simRoundSql(dotSql("q.qv", "c.v") + " / (q.qn * c.norm)")} AS sim_r
       |  FROM vn c CROSS JOIN q WHERE c.vec_id <> q.q_id
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim_r DESC, vec_id) AS "rank"
       |  FROM s
       |)
       |SELECT q_id, "rank", vec_id AS cand_id, sim_r
       |FROM r WHERE "rank" <= $topK""".stripMargin

  private val rangeThreshold = 0.30

  /** Range (radius) search: for each query, ALL candidates with rounded
    * cosine >= the radius — the third classic similarity-query shape next
    * to top-k ([[annTopkCosine]]) and all-pairs ([[neardupPairs]]). Unlike
    * top-k there is no rank window at all: the scan streams through the
    * broadcast query set and only matches survive, so the operator is one
    * shuffle-free pass over the corpus (the 100 TB plan: scan -> broadcast
    * NLJ -> filter, every stage inside whole-stage codegen via the native
    * dot kernel). */
  def annRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim_r",
        simRound(dot(col("qv"), col("v")) / (col("qn") * col("norm"))))
      .filter(col("sim_r") >= rangeThreshold)
      .select(col("q_id"), col("vec_id").as("cand_id"), col("sim_r"))
  }

  val annRangeSearchSql: String =
    s"""WITH $vecsSql,
       |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM vn
       |  WHERE vec_id < $numQueries)
       |SELECT q.q_id, c.vec_id AS cand_id,
       |  ${simRoundSql(dotSql("q.qv", "c.v") + " / (q.qn * c.norm)")} AS sim_r
       |FROM vn c CROSS JOIN q
       |WHERE c.vec_id <> q.q_id
       |  AND ${simRoundSql(dotSql("q.qv", "c.v") + " / (q.qn * c.norm)")}
       |    >= $rangeThreshold""".stripMargin

  private val pairThreshold = 0.45

  /** Block count for the exact-pairs grid join: per-task memory is
    * O(2n/B) vectors and each vector is shuffled B+1 times, so B grows
    * with the corpus (B ≈ n·d·8 / target_task_bytes at 100 TB). */
  private val neardupBlocks = 16

  /** Embedding near-duplicate pairs: all pairs with rounded cosine >= 0.45.
    *
    * This is the EXACT all-pairs audit (intrinsically O(n²) compute — the
    * production near-dup path is the LSH-bucketed [[annLshTopk]] shape),
    * executed as a blocked grid self-join with NO driver materialization:
    * each vector lands in block b = vec_id mod B, grid cell (i,j), i<=j,
    * receives block i as its x side and block j as its y side, and every
    * unordered pair meets in exactly one cell (same-block pairs are
    * oriented by vec_id inside the cell). The cell id is a plain
    * hash-partitionable shuffle key — executors each hold two blocks, the
    * driver holds nothing, and per-task memory is bounded by the block
    * size whatever the corpus.
    *
    * The per-cell sweep is a primitive while-loop (the (d)-tier escape
    * hatch, justified: Catalyst HOF lambdas are interpreted per row, ~10x
    * slower for O(n² d) math). The inner loop is the same ascending-index
    * sequential fold as the SQL oracle, and x*y multiplication commutes
    * exactly in IEEE, so results are bit-identical either orientation. */
  def neardupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = neardupBlocks
    val t = pairThreshold
    val base = vecs(spark, dir)
      .select(col("vec_id"), col("v"), col("norm"))
      .as[(Long, Array[Double], Double)]
    val replicated = base.flatMap { case (id, v, n) =>
      val b = (id % B).toInt
      Iterator.range(b, B).map(j => (b * B + j, false, id, v, n)) ++
        Iterator.range(0, b + 1).map(i => (i * B + b, true, id, v, n))
    }
    replicated.groupByKey(_._1).flatMapGroups { (cell, rows) =>
      val xs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      val ys = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      rows.foreach { case (_, isY, id, v, n) =>
        (if (isY) ys else xs) += ((id, v, n))
      }
      val sameBlock = cell / B == cell % B
      xs.iterator.flatMap { case (id1, v1, n1) =>
        ys.iterator.flatMap { case (id2, v2, n2) =>
          if (sameBlock && id1 >= id2) Iterator.empty
          else {
            var d = 0.0
            var i = 0
            while (i < v1.length) { d += v1(i) * v2(i); i += 1 }
            val simR = math.floor(d / (n1 * n2) * 1000000.0 + 0.5) / 1000000.0
            if (simR >= t)
              Iterator.single((math.min(id1, id2), math.max(id1, id2), simR))
            else Iterator.empty
          }
        }
      }
    }.toDF("v1", "v2", "sim_r")
  }

  val neardupPairsSql: String =
    s"""WITH $vecsSql
       |SELECT x.vec_id AS v1, y.vec_id AS v2,
       |  ${simRoundSql(dotSql("x.v", "y.v") + " / (x.norm * y.norm)")} AS sim_r
       |FROM vn x JOIN vn y ON x.vec_id < y.vec_id
       |WHERE ${simRoundSql(dotSql("x.v", "y.v") + " / (x.norm * y.norm)")}
       |  >= $pairThreshold""".stripMargin

  private val numPlanes = 8
  private val dims = 64

  /** Deterministic +-1 hyperplane coefficients: md5 parity of "p_d"
    * (SQL form; the Scala side materializes the same table in
    * [[planeCoefArrays]]). */
  private def planeCoefsSql(p: String): String =
    s"""list_transform(generate_series(0, ${dims - 1}), d ->
       | 1.0 - 2.0 * (CAST(('0x' || substr(md5(CAST($p AS VARCHAR) || '_' ||
       | CAST(d AS VARCHAR)), 1, 8)) AS BIGINT) % 2))""".stripMargin
      .replace("\n", "")

  /** The same +-1 coefficients materialized driver-side (they are
    * constants): parity of the identical md5 the SQL twin computes. */
  private lazy val planeCoefArrays: Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dims) { (p, d) =>
      digest.reset()
      val hex = digest.digest(s"${p}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      1.0 - 2.0 * (java.lang.Long.parseLong(hex, 16) % 2).toDouble
    }
  }

  /** Sign-LSH bucket per vector: bit p = sign of the projection onto
    * hyperplane p. Integer bucket in [0, 2^8). Projections run as a
    * primitive per-partition loop (the coefficient table is a driver
    * constant; per-element md5 inside a Catalyst lambda was the hot
    * path) — same ascending-index fold as the SQL twin. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val coefs = planeCoefArrays
    vecs(spark, dir)
      .select(col("vec_id"), col("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.map { case (vecId, v) =>
          var bucket = 0L
          var p = 0
          while (p < coefs.length) {
            val cp = coefs(p)
            var proj = 0.0
            var d = 0
            while (d < cp.length) { proj += v(d) * cp(d); d += 1 }
            if (proj > 0) bucket |= (1L << p)
            p += 1
          }
          (vecId, bucket)
        }
      }.toDF("vec_id", "bucket")
  }

  private val lshBucketsSql: String =
    s"""b AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN ${dotSql("v", planeCoefsSql("p"))} > 0
       |      THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM vn CROSS JOIN (SELECT unnest(generate_series(0, ${numPlanes - 1})) AS p)
       |  GROUP BY vec_id
       |)""".stripMargin

  /** LSH-bucketed ANN: top-3 within the query's bucket only. Recall loss
    * vs the brute-force baseline is the LSH trade — identical in the
    * oracle since the bucketing is bit-deterministic. */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir).join(lshBuckets(spark, dir), "vec_id")
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), col("bucket").as("qb"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_r").desc, col("vec_id"))
    all.join(broadcast(q), col("bucket") === col("qb") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("sim_r",
        simRound(dot(col("qv"), col("v")) / (col("qn") * col("norm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("cand_id"),
        col("sim_r"), col("bucket"))
  }

  val annLshTopkSql: String =
    s"""WITH $vecsSql,
       |$lshBucketsSql,
       |a AS (SELECT vn.vec_id, v, norm, bucket FROM vn JOIN b USING (vec_id)),
       |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn, bucket AS qb
       |  FROM a WHERE vec_id < $numQueries),
       |s AS (
       |  SELECT q.q_id, c.vec_id, c.bucket,
       |    ${simRoundSql(dotSql("q.qv", "c.v") + " / (q.qn * c.norm)")} AS sim_r
       |  FROM a c JOIN q ON c.bucket = q.qb AND c.vec_id <> q.q_id
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim_r DESC, vec_id) AS "rank"
       |  FROM s
       |)
       |SELECT q_id, "rank", vec_id AS cand_id, sim_r, bucket
       |FROM r WHERE "rank" <= 3""".stripMargin

  private val ivfCells = 8
  private val ivfCentBase = 100L // centroid seed ids (disjoint from queries)

  /** IVF-style ANN: coarse-quantize every vector to its nearest of
    * `ivfCells` centroid vectors (the inverted-file cell), then search
    * only the query's cell — the second of the two classic ANN scale paths
    * (sign-LSH being the other, [[annLshTopk]]).
    *
    * Centroids here are a deterministic seed subset (vec_ids 100..107) so
    * the DuckDB oracle reproduces the exact cell assignment; a production
    * deployment would k-means-train them on a sample and broadcast the
    * centroid matrix the same way. Shape notes for 100 TB: the K-way
    * candidate fan-out is a broadcast cross join (big side only scanned),
    * and the per-vector argmax is `max_by` under a hash aggregate, NOT a
    * rank window — partial aggregation collapses the K candidate rows
    * map-side, so the one shuffle carries n rows, not n*K (the argmax
    * ordering struct (c_sim, -cent_id) is unique per vector, so the
    * result is deterministic and equals the oracle's rank-1 row). The
    * inverted file is hash-partitioned by cell id, and a query probes
    * exactly one cell (nprobe=1; multi-probe = relaxing the rank-1 filter
    * to rank <= nprobe). */
  /** The `ivfCells` centroid vectors (deterministic seed subset). */
  private def ivfCents(all: DataFrame): DataFrame =
    all
      .filter(col("vec_id") >= ivfCentBase && col("vec_id") < ivfCentBase + ivfCells)
      .select((col("vec_id") - ivfCentBase).as("cent_id"),
        col("v").as("cv"), col("norm").as("cn"))

  /** The inverted file: every vector with its argmax cell (max_by hash
    * aggregate — see [[annIvfTopk]]'s scaladoc for why not a window). */
  private def ivfAssigned(all: DataFrame, cents: DataFrame): DataFrame =
    all.crossJoin(broadcast(cents))
      .withColumn("c_sim", simRound(dot(col("v"), col("cv")) / (col("norm") * col("cn"))))
      .groupBy("vec_id")
      .agg(
        max_by(col("cent_id"),
          struct(col("c_sim"), (-col("cent_id")).as("nc"))).as("cell"),
        first(col("v")).as("v"), first(col("norm")).as("norm"))

  def annIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    // eagerly materialized: both the broadcast query side and the
    // candidate side below reference this subtree in ONE action — without
    // it the K-way assignment (the expensive stage) computes twice
    val assigned = Dedup.eager(ivfAssigned(all, ivfCents(all)))
    val q = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), col("cell").as("qcell"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_r").desc, col("vec_id"))
    assigned.join(broadcast(q), col("cell") === col("qcell") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("sim_r",
        simRound(dot(col("qv"), col("v")) / (col("qn") * col("norm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("cand_id"),
        col("sim_r"), col("cell"))
  }

  /** Shared CTE chain `cent, asg, a` — centroids, per-vector centroid
    * ranking, and the rank-1 inverted file. Single source of truth for
    * both IVF oracles (Spark twin: [[ivfCents]]/[[ivfAssigned]]). */
  private val ivfAsgCtes: String =
    s"""cent AS (
       |  SELECT vec_id - $ivfCentBase AS cent_id, v AS cv, norm AS cn
       |  FROM vn WHERE vec_id >= $ivfCentBase AND vec_id < ${ivfCentBase + ivfCells}
       |), asg AS (
       |  SELECT vec_id, v, norm, cent_id,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY
       |      ${simRoundSql(dotSql("v", "cv") + " / (norm * cn)")} DESC, cent_id) AS c_rank
       |  FROM vn CROSS JOIN cent
       |), a AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM asg WHERE c_rank = 1
       |)""".stripMargin

  val annIvfTopkSql: String =
    s"""WITH $vecsSql,
       |$ivfAsgCtes, q AS (
       |  SELECT vec_id AS q_id, v AS qv, norm AS qn, cell AS qcell
       |  FROM a WHERE vec_id < $numQueries
       |), s AS (
       |  SELECT q.q_id, c.vec_id, c.cell,
       |    ${simRoundSql(dotSql("q.qv", "c.v") + " / (q.qn * c.norm)")} AS sim_r
       |  FROM a c JOIN q ON c.cell = q.qcell AND c.vec_id <> q.q_id
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim_r DESC, vec_id) AS "rank"
       |  FROM s
       |)
       |SELECT q_id, "rank", vec_id AS cand_id, sim_r, cell
       |FROM r WHERE "rank" <= 3""".stripMargin

  private val ivfNprobe = 2

  /** Multi-probe IVF: identical inverted file to [[annIvfTopk]], but each
    * query searches its `ivfNprobe` nearest cells instead of one — the
    * standard recall/cost knob for IVF indexes. Cost scales linearly in
    * nprobe (the candidate join fans out to nprobe buckets per query)
    * while the inverted file itself is unchanged; candidates can't
    * duplicate across probes because each candidate lives in exactly one
    * cell. The query-side cell ranking re-scores only numQueries x K
    * centroid pairs — negligible next to the corpus-side assignment,
    * which here is referenced exactly once (the candidate join), so no
    * eager materialization is needed. */
  def annIvfMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val cents = ivfCents(all)
    val assigned = ivfAssigned(all, cents)
    val cw = Window.partitionBy("vec_id")
      .orderBy(col("c_sim").desc, col("cent_id"))
    val qcells = all.filter(col("vec_id") < numQueries)
      .crossJoin(broadcast(cents))
      .withColumn("c_sim", simRound(dot(col("v"), col("cv")) / (col("norm") * col("cn"))))
      .withColumn("c_rank", row_number().over(cw))
      .filter(col("c_rank") <= ivfNprobe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), col("cent_id").as("qcell"),
        col("c_rank").as("probe"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_r").desc, col("vec_id"))
    assigned.join(broadcast(qcells), col("cell") === col("qcell") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("sim_r",
        simRound(dot(col("qv"), col("v")) / (col("qn") * col("norm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("cand_id"),
        col("sim_r"), col("cell"), col("probe"))
  }

  val annIvfMultiprobeSql: String =
    s"""WITH $vecsSql,
       |$ivfAsgCtes, q AS (
       |  SELECT vec_id AS q_id, v AS qv, norm AS qn, cent_id AS qcell,
       |    c_rank AS probe
       |  FROM asg WHERE vec_id < $numQueries AND c_rank <= $ivfNprobe
       |), s AS (
       |  SELECT q.q_id, c.vec_id, c.cell, q.probe,
       |    ${simRoundSql(dotSql("q.qv", "c.v") + " / (q.qn * c.norm)")} AS sim_r
       |  FROM a c JOIN q ON c.cell = q.qcell AND c.vec_id <> q.q_id
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim_r DESC, vec_id) AS "rank"
       |  FROM s
       |)
       |SELECT q_id, "rank", vec_id AS cand_id, sim_r, cell, probe
       |FROM r WHERE "rank" <= 3""".stripMargin

  /** Per-label embedding-norm profile — the "is this embedding table
    * healthy" audit query (collapsed norms = dead encoder; wild norms =
    * unnormalized mixture). One pass: the codegen'd dot kernel computes
    * ||v||² inside the scan loop, the norm rounds to 1e-6 fixed point
    * and scales to an INTEGER so the per-label mean is an exact
    * order-free integer sum (a double sum would be parallel-fold
    * order-dependent) — then one tiny hash aggregate on label. */
  def embeddingNormStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm_u",
        floor(sqrt(dot(col("v"), col("v"))) * 1000000.0 + 0.5).cast("long"))
    e.groupBy("label")
      .agg(count(lit(1)).as("n"), sum("norm_u").as("su"),
        min("norm_u").as("mn"), max("norm_u").as("mx"))
      .select(col("label"), col("n"),
        (col("su").cast("double") / col("n") / 1000000.0).as("mean_norm"),
        (col("mn").cast("double") / 1000000.0).as("min_norm"),
        (col("mx").cast("double") / 1000000.0).as("max_norm"))
  }

  val embeddingNormStatsSql: String =
    s"""WITH v AS (
       |  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), u AS (
       |  SELECT label,
       |    CAST(floor(sqrt(${dotSql("v", "v")}) * 1000000.0 + 0.5) AS BIGINT) AS norm_u
       |  FROM v
       |)
       |SELECT label, count(*) AS n,
       |  CAST(sum(norm_u) AS DOUBLE) / count(*) / 1000000.0 AS mean_norm,
       |  CAST(min(norm_u) AS DOUBLE) / 1000000.0 AS min_norm,
       |  CAST(max(norm_u) AS DOUBLE) / 1000000.0 AS max_norm
       |FROM u GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_cosine" -> (annTopkCosine _),
    "ann_range_search" -> (annRangeSearch _),
    "embedding_norm_stats" -> (embeddingNormStats _),
    "embedding_neardup_pairs" -> (neardupPairs _),
    "ann_lsh_topk" -> (annLshTopk _),
    "ann_ivf_topk" -> (annIvfTopk _),
    "ann_ivf_multiprobe" -> (annIvfMultiprobe _),
  )

  val oracles: Map[String, String] = Map(
    "ann_topk_cosine" -> annTopkCosineSql,
    "ann_range_search" -> annRangeSearchSql,
    "embedding_norm_stats" -> embeddingNormStatsSql,
    "embedding_neardup_pairs" -> neardupPairsSql,
    "ann_lsh_topk" -> annLshTopkSql,
    "ann_ivf_topk" -> annIvfTopkSql,
    "ann_ivf_multiprobe" -> annIvfMultiprobeSql,
  )
}
