package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB shuffle-reduction
  * mechanism for selective large-×-large joins: Catalyst's
  * InjectRuntimeFilter plants a bloom filter built from the selective
  * (filtered) side onto the probe side's scan, so most probe rows die
  * before the exchange instead of shuffling and then failing the join.
  * The rule is size-gated (creation side under
  * `runtime.bloomFilter.creationSideThreshold`, probe scan over
  * `applicationSideScanSizeThreshold` — i.e. it arms itself exactly in
  * the big-probe/small-build regime); the fixtures sit far below the
  * probe-side gate, so this spec lowers the gates to prove the engine's
  * plans compose with the rule, and pins that results are unchanged. */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter lands on the probe side and preserves results") {
    val conf = spark.conf
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      assert(conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")

      val dir = "/root/testdata/sf0.001"
      // selective build side: one order priority slice. Built as a def:
      // a Dataset memoizes its QueryExecution, so each conf regime needs
      // a freshly planned frame — reusing one would compare a plan's
      // output to itself.
      def joined = {
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      }
      val filtered = joined
      val optimized = filtered.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        s"expected a bloom runtime filter in:\n$optimized")
      val withFilter = filtered.collect().toSeq

      // results identical with the rule gated off again
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB")
      val unfiltered = joined
      assert(!unfiltered.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("might_contain"))
      assert(withFilter == unfiltered.collect().toSeq)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      keep.foreach { case (k, v) =>
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
      }
    }
  }
}
