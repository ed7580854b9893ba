package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only generator for the sf1 (10x sf0.1 = 100x the oracle-gate SF)
  * full-surface scale replica under /tmp — the dataset behind the round-7
  * 100x probe in SCALE_NOTES.md.
  *
  * Each of the 10 replicas shifts every synthetic int64 key domain by
  * `rep * 1e9` (custkey/orderkey/partkey/suppkey/event_id/user_id/doc_id/
  * vec_id), so referential integrity holds WITHIN a replica and key
  * cardinality scales 10x (detector/sessionization state, join fan-in).
  * Fixed-size dims (region, nation) are copied once, like TPC-H.
  *
  * `documents.text` is salted per replica with the bijective token
  * prefix from [[DedupScaleProbe]]: each copy preserves the full
  * shingle/simhash structure of the base corpus while cross-copy overlap
  * is impossible — dedup OUTPUT grows exactly 10x (a plain copy would
  * make every doc a 10-way near-dup group: quadratic output growth that
  * measures the adversary, not the operator; that case is probed
  * separately by DedupScaleProbe).
  *
  * Also writes an `events_hot` variant of sf1 events where replicas 1..9
  * collapse onto replica-0 user_ids and HALF of all events land on ONE
  * user — the hot-key adversary for the detector/session family.
  *
  * Usage: runMain graft.tools.MakeSfN [baseDir] [outDir] [mult] [tables]
  * `tables` (optional) = comma-list restricting which tables to write —
  * the r13 sf10 (x100) probe only needs documents+embeddings, and the
  * x100 lineitem/events replicas would cost 100x the disk and wall for
  * queries that never read them.
  */
object MakeSfN {

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val mult = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
      else None
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.sources.Sessions
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val K = 1000000000L // per-replica key offset, all int64 key domains

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$base/$name.parquet")

    def shifted(df: DataFrame, keyCols: Seq[String], rep: Int,
        salt: Boolean = false): DataFrame = {
      val withKeys = keyCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(rep * K)))
      if (salt && rep > 0)
        withKeys.withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"zq$rep$$1"))
      else withKeys
    }

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[makesf] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    def replicate(name: String, keyCols: Seq[String],
        salt: Boolean = false): Unit =
      if (wanted(name))
        write((0 until mult).map(r => shifted(tbl(name), keyCols, r, salt))
          .reduce(_ unionAll _), name)

    // fixed dims, copied once
    Seq("region", "nation").filter(wanted).foreach(n => write(tbl(n), n))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), salt = true)
    replicate("embeddings", Seq("vec_id"))

    // hot-key adversary: same 10x event volume, replica-0 user ids only,
    // and half of ALL events on user 42
    if (!wanted("events_hot")) { spark.stop(); return }
    val ev = tbl("events")
    val hot = (0 until mult).map { r =>
      ev.withColumn("event_id", col("event_id") + lit(r * K))
        .withColumn("user_id",
          when(pmod(col("event_id"), lit(2)) === 0, lit(42L))
            .otherwise(col("user_id")))
    }.reduce(_ unionAll _)
    hot.write.mode(SaveMode.Overwrite).parquet(s"$out/events_hot.parquet")
    println(s"[makesf] events_hot: ${spark.read.parquet(s"$out/events_hot.parquet").count()} rows")

    spark.stop()
  }
}
