package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift guard (VERDICT r8 items 1–2).
  *
  * Round 8 lost 42/103 queries because the driver regenerated
  * events.parquet with `ts` as TIMESTAMP_NTZ(us) and the loader's fallback
  * (`cast(ts as long)`) does not analyze on that type in Spark 4. This
  * spec makes the loader total over every encoding the fixture has ever
  * shipped — nanos-long, TIMESTAMP, TIMESTAMP_NTZ — asserting identical
  * `ts_ns`/`ts_sec` across all three, and smoke-opens every REAL fixture
  * file through its loader so the next wholesale regeneration fails here
  * in minutes instead of zeroing the driver gate.
  */
class FixtureSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val realDir = "/root/testdata/sf0.001"

  /** Rows with deliberate sub-second residue: a seconds-granularity
    * shortcut (the r8 bug's sibling failure mode) would corrupt ts_ns. */
  private val rowsNs: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, 1704067200123456000L, 10L, "click", 1.0, """{"k":1}"""),
    (2L, 1704067201987654000L, 11L, "view", 2.0, """{"k":2}"""),
    (3L, 1704153599000001000L, 12L, "click", 3.0, null))

  private def writeEvents(encode: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    rowsNs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", encode)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def clock(dir: String): Seq[(Long, Long, Long)] =
    Tables.events(spark, dir)
      .select($"event_id", $"ts_ns", $"ts_sec")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)

  // The fixture is micro-precision; expectations truncate ns → us → ns.
  // The ns→us truncation below uses `ts div 1000` (integer division):
  // `col / 1000L` is double division, and ~1.7e18 ns exceeds 2^53, so a
  // non-double-representable constant would silently round micros off by
  // one (ADVICE r9).
  private val expected = rowsNs.map { case (id, ns, _, _, _, _) =>
    (id, ns / 1000L * 1000L, ns / 1000000000L)
  }

  test("loader analyzes on nanos-long ts and keeps exact nanos") {
    val dir = writeEvents(col("ts")) // LongType as-is
    assert(clock(dir) == rowsNs.map { case (id, ns, _, _, _, _) =>
      (id, ns, ns / 1000000000L)
    })
  }

  test("loader analyzes on TIMESTAMP ts with sub-second precision") {
    val dir = writeEvents(timestamp_micros(expr("ts div 1000")))
    assert(clock(dir) == expected)
  }

  test("loader analyzes on TIMESTAMP_NTZ ts with sub-second precision") {
    val dir = writeEvents(
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    assert(clock(dir) == expected)
  }

  test("all three encodings yield the identical normalized clock") {
    val long = clock(writeEvents(col("ts"))).map { case (id, ns, s) =>
      (id, ns / 1000L * 1000L, s) // truncate the long branch to us for parity
    }
    val ts = clock(writeEvents(timestamp_micros(expr("ts div 1000"))))
    val ntz = clock(writeEvents(
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")))
    assert(long == ts)
    assert(ts == ntz)
  }

  test("every real fixture table opens through its loader and has rows") {
    val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "events" -> (() => Tables.events(spark, realDir)),
      "lineitem" -> (() => Tables.lineitem(spark, realDir)),
      "orders" -> (() => Tables.orders(spark, realDir)),
      "customer" -> (() => Tables.customer(spark, realDir)),
      "supplier" -> (() => Tables.supplier(spark, realDir)),
      "part" -> (() => Tables.part(spark, realDir)),
      "nation" -> (() => Tables.nation(spark, realDir)),
      "region" -> (() => Tables.region(spark, realDir)),
      "documents" -> (() => Tables.documents(spark, realDir)),
      "embeddings" -> (() => Tables.embeddings(spark, realDir)))
    for ((name, load) <- loaders) {
      val df = load()
      assert(df.count() > 0, s"$name is empty")
    }
    // the events contract columns analyze and are non-null
    val ev = Tables.events(spark, realDir)
      .select($"ts_ns", $"ts_sec", $"ts")
    assert(ev.filter($"ts_ns".isNull || $"ts_sec".isNull).count() == 0)
  }

  test("real fixture keeps sub-second residue (hash oracles depend on it)") {
    val residues = Tables.events(spark, realDir)
      .select(($"ts_ns" % 1000000000L).as("r"))
      .filter($"r" =!= 0L).count()
    assert(residues > 0, "fixture ts has no sub-second component — " +
      "a seconds-level loader bug would be invisible; investigate")
  }
}
