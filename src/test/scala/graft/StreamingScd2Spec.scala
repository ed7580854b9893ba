package graft

import graft.operators.Warehouse
import graft.sources.Tables
import graft.streaming.{DimChange, Scd2Version, StreamingScd2}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming SCD2 maintainer must produce, after replaying the batch
  * twin's change feed through micro-batches, EXACTLY the history
  * [[Warehouse.scd2CustomerHistory]] builds from the finished batch —
  * including the no-op-restatement rows both must leave unversioned —
  * and a longer random churn sequence must match a driver-side fold of
  * the same rules. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def withRocksDBProvider(body: => Unit): Unit = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  /** Replay through micro-batches of `batch` rows; materialize the
    * downstream view: latest emission per (custkey, version) by as_of. */
  private def replay(changes: Seq[DimChange], batch: Int, name: String)
      : Set[(Long, Long, Double, String, Long, Option[Long], Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[DimChange]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2-ckpt").toString
    val q = StreamingScd2.applyChanges(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      changes.grouped(batch).foreach { g => ms.addData(g); q.processAllAvailable() }
      spark.table(name).as[Scd2Version].collect()
        .groupBy(v => (v.c_custkey, v.version))
        .map { case (_, es) => es.maxBy(_.as_of) }
        .map(v => (v.c_custkey, v.version, v.c_acctbal, v.c_mktsegment,
          v.valid_from, v.valid_to, v.is_current))
        .toSet
    } finally q.stop()
  }

  /** The batch twin's change feed: every customer asserted at seq 0 (the
    * initial dimension load), then the custkey%5 update slice at seq 1 —
    * custkey%15 rows restate unchanged attributes (the +0.0 arm). */
  private def fixtureFeed(): Seq[DimChange] = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .as[(Long, Double, String)].collect()
    val initial = cust.map { case (k, b, s) => DimChange(k, 0L, b, s) }
    val updates = cust.collect { case (k, b, s) if k % 5 == 0 =>
      DimChange(k, 1L, b + (k % 3).toDouble * 50.0, s)
    }
    (initial ++ updates).toSeq
  }

  test("micro-batch replay of the update feed == the batch SCD2 history") {
    withRocksDBProvider {
      val want = Warehouse.scd2CustomerHistory(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getBoolean(6))).toSet
      // both initial load and updates split across many micro-batches;
      // within-batch row order is whatever the shuffle delivers
      val got = replay(fixtureFeed(), batch = 37, name = "scd2_replay")
      assert(got == want,
        s"diverged: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("random churn matches the driver fold; state is one open version per key") {
    withRocksDBProvider {
      // deterministic multi-step churn over 40 keys, 6 change waves:
      // attribute cycles guarantee changes, repeats guarantee restatements
      val segs = Vector("AUTOMOBILE", "BUILDING", "FURNITURE")
      val changes = for {
        seq <- 0L until 6L
        k <- 0L until 40L
        if (k + seq) % 3 != 0 || seq == 0L // some keys skip some waves
      } yield DimChange(k, seq,
        acctbal = ((k * 7 + seq * seq * 13) % 5).toDouble * 100.0,
        mktsegment = segs(((k + seq * seq) % 3).toInt))
      // driver fold of the same rules
      val hist = scala.collection.mutable.ArrayBuffer[
        (Long, Long, Double, String, Long, Option[Long], Boolean)]()
      val open = scala.collection.mutable.Map[Long, (Long, Double, String, Long)]()
      changes.sortBy(c => (c.seq, c.custkey)).foreach { c =>
        open.get(c.custkey) match {
          case None =>
            open(c.custkey) = (1L, c.acctbal, c.mktsegment, c.seq)
          case Some((v, b, s, f)) if b == c.acctbal && s == c.mktsegment => ()
          case Some((v, b, s, f)) =>
            hist += ((c.custkey, v, b, s, f, Some(c.seq), false))
            open(c.custkey) = (v + 1L, c.acctbal, c.mktsegment, c.seq)
        }
      }
      open.foreach { case (k, (v, b, s, f)) => hist += ((k, v, b, s, f, None, true)) }
      val got = replay(changes, batch = 53, name = "scd2_churn")
      assert(got == hist.toSet,
        s"churn diverged: missing=${(hist.toSet -- got).take(3)} extra=${(got -- hist.toSet).take(3)}")
      // versions are dense 1..max per key — nothing skipped or duplicated
      got.groupBy(_._1).foreach { case (k, vs) =>
        val versions = vs.map(_._2).toSeq.sorted
        assert(versions == (1L to versions.max), s"key $k versions: $versions")
        assert(vs.count(_._7) == 1, s"key $k must have exactly one current row")
      }
    }
  }
}
