package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch micro-bench: a large-×-large equi-join with one pathological
  * hot key, three ways —
  *  1. plain sort-merge join with AQE off (the hot key lands in ONE
  *     task: the 100 TB straggler/OOM shape),
  *  2. AQE skew-join (runtime splits the oversized partition),
  *  3. manual salting (hot side gets a random salt, dim side replicates
  *     each row SALTS times — deterministic, planner-independent).
  * All three must produce the identical row count. */
object SkewJoinBench {
  private val SALTS = 16

  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 20000000L
    // fact: 50% of rows on key 0, rest over 1M keys
    val fact = spark.range(n).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(col("id") * 2654435761L, lit(1000000L))).as("k"),
      col("id").as("v"))
    // dim: 1M keys with an attribute; too big to broadcast at defaults
    val dim = spark.range(1000000L).select(col("id").as("k"),
      (col("id") % 97).as("attr"))
    fact.cache(); fact.count(); dim.cache(); dim.count()

    // result fingerprint: join cardinality AND an order-free exact sum —
    // a broken rewrite (e.g. mismatched salt domains dropping 15/16 of
    // the rows) changes both; strategies must agree exactly
    def fingerprint(f: DataFrame): (Long, Long) = {
      val r = f.agg(count(lit(1)), sum(col("v") % 1000003L))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def run(label: String)(f: => DataFrame): (Long, Long) = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val fp = fingerprint(f)
        ((System.nanoTime() - t0) / 1e9, fp)
      }
      println(f"[skewjoin] $label: min=${ts.map(_._1).min}%.2f s rows=${ts.head._2._1}")
      ts.head._2
    }

    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    conf.set("spark.sql.adaptive.enabled", "false")
    val plainFp = run("plain SMJ (AQE off)")(fact.join(dim, "k"))

    // salting measured with AQE STILL OFF — it is pitched as the
    // fallback for exactly the case where AQE cannot help, so it must
    // be measured on the plain planner
    def saltedJoin: DataFrame = {
      // salt from a mixing hash so every residue mod SALTS is reachable
      // for any key (a multiplicative constant preserves the parity of
      // `v`, which would land the hot key on only half the salts)
      val salted = fact.withColumn("salt", pmod(xxhash64(col("v")), lit(SALTS.toLong)))
      val dimRep = dim.withColumn("salt",
        explode(sequence(lit(0L), lit(SALTS.toLong - 1))))
      salted.join(dimRep, Seq("k", "salt"))
    }
    val saltedFp = run("manual salted join (AQE off)")(saltedJoin)

    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqeFp = run("AQE skew join")(fact.join(dim, "k"))

    require(plainFp == saltedFp && plainFp == aqeFp,
      s"strategy results diverge: plain=$plainFp salted=$saltedFp aqe=$aqeFp")
    println(s"[skewjoin] all strategies agree: rows=${plainFp._1} sum=${plainFp._2}")
    spark.stop()
  }
}
