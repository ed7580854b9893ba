package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only multi-executor probe: runs selected queries on
  * `local-cluster[4,8,8192]` — separate executor JVMs, so shuffle blocks,
  * broadcasts, and task closures actually SERIALIZE and cross process
  * boundaries (everything else in this repo runs `local[n]`, where all of
  * that is in-heap object passing) — then re-runs them on `local[32]` in
  * the same JVM and prints per-query wall-time deltas plus a result-parity
  * check (count + order-independent hash over every column).
  *
  * Usage: runMain graft.tools.ClusterProbe [queryCsv] [sfDir]
  * The executor classpath is propagated from the driver's
  * (`java.class.path`), which is how graft classes (mapPartitions
  * closures, the codegen dot kernel, TopKPerKeyExec) reach the executor
  * JVMs without a packaged jar. */
object ClusterProbe {

  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(c =>
      coalesce(col(s"`$c`").cast("string"), lit("\u0000null")))
    val r = df.agg(count(lit(1)),
      sum(hash(cols: _*).cast("long"))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def runAll(spark: SparkSession, names: Seq[String], dir: String)
      : Map[String, (Double, (Long, Long))] = {
    spark.sparkContext.setLogLevel("ERROR")
    names.map { n =>
      System.err.println(s"[probe] $n")
      // contained per query so one serialization-path failure reports
      // itself instead of killing the whole sweep
      try {
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        val fp = fingerprint(graft.SparkEntry.queries(n)(spark, dir))
        spark.catalog.clearCache()
        n -> (runs.min, fp)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[probe] $n FAILED: ${e.toString.take(300)}")
          spark.catalog.clearCache()
          n -> (-1.0, (-1L, -1L))
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val names: Seq[String] =
      if (args.nonEmpty && args(0) == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("all_alerts", "rate_alerts", "dedup_exact", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash", "dedup_incremental",
        "q7_nation_volume", "q10_returned_revenue", "ann_lsh_topk",
        "corpus_decontaminate", "token_count")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"

    // MUST run via `sbt runMain` (enumerated classpath): launching with
    // plain `java -cp target/classes:/opt/spark/jars/*` leaves the
    // literal wildcard in java.class.path, which propagates into
    // spark.executor.extraClassPath and leaves executors resolving Scala
    // collections through a mismatched path — ~1/3 of queries then die
    // with `DefaultSerializationProxy cannot be assigned to field ...:
    // immutable.Seq` on executor deserialize. Same queries are parity-OK
    // under sbt's forked enumerated classpath.
    val cluster = graft.sources.Sessions.builder("local-cluster[4,8,8192]", 32)
      .config("spark.executor.memory", "7g")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .getOrCreate()
    val clusterR = try runAll(cluster, names, dir) finally cluster.stop()

    val local = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    val localR = try runAll(local, names, dir) finally local.stop()

    println(f"${"query"}%-24s ${"cluster"}%8s ${"local32"}%8s ${"ratio"}%6s  parity")
    names.foreach { n =>
      val (ct, cfp) = clusterR(n)
      val (lt, lfp) = localR(n)
      val parity = if (cfp == lfp) "OK" else s"*** MISMATCH $cfp vs $lfp"
      println(f"$n%-24s $ct%8.2f $lt%8.2f ${ct / lt}%6.2f  $parity")
    }
  }
}
