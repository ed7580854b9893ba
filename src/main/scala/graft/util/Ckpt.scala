package graft.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Lineage-truncating eager materialization for values served through a
  * [[SessionCache]]: `localCheckpoint()` + a materializing count, handing
  * back BOTH the rebuilt frame and the RDD whose blocks store the data.
  *
  * Why not `Dataset.cache()`: cached plans are wiped wholesale by
  * `spark.catalog.clearCache()` and re-registered lazily, so a
  * "memoized" frame would silently recompute mid-session. RDD-level
  * checkpoint blocks are not cache-manager entries — they live until
  * the RDD is unpersisted — which makes them the right substrate for
  * cross-query artifacts (cluster labels, the shingle inverted index)
  * that a production pipeline would materialize once as a table.
  *
  * Bench accounting (r18): these artifacts are NOT exempt from
  * measurement — the bench's pass 1 drops them via
  * [[SessionCache.clearAll]] (whose dispose hook unpersists the blocks)
  * before every query and reports the standalone costs as the "cold"
  * map, alongside the amortized mins of later passes.
  *
  * Pair with [[SessionCache]] and [[blocksPresent]] as the validity
  * check: the lineage is truncated, so lost blocks (executor loss) make
  * the frame unrecomputable — the cache must rebuild, not serve it. */
object Ckpt {

  def materialize(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** True iff every partition of `rdd` still has a stored block. */
  def blocksPresent(spark: SparkSession, rdd: RDD[Row]): Boolean =
    spark.sparkContext.getRDDStorageInfo
      .exists(i => i.id == rdd.id &&
        i.numCachedPartitions == rdd.getNumPartitions)
}
