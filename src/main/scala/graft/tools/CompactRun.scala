package graft.tools

import graft.streaming.{Maintenance, PartitionedBase}
import org.apache.spark.sql.SparkSession

/** Operational entry point for the [[PartitionedBase]] compaction the
  * measured cadence rule calls for (DirGrowthProbe r17: per-read cost
  * grows ~10 ms per accumulated partition; compact every ~50 grown
  * batches) — the compaction twin of [[ForgetRun]], under the same
  * [[Maintenance]] guards: refuse while a supplied stream checkpoint
  * shows an in-flight batch or was written inside the quiesce window,
  * hold the shared `root/_maintenance.lock` across the swaps.
  *
  * Takes the same `root/<family>/<table>` layout as ForgetRun and rolls
  * every selected table's partitions into one `batch=-1` via
  * [[PartitionedBase.migrateFlat]] (idempotent; also migrates a
  * pre-r15 flat base as a side effect). `--min-parts N` (default 2)
  * skips tables already at or below N partitions — so a cron'd
  * CompactRun against a mostly-compact root only pays for the tables
  * that grew. Prints partitions + rows before/after per table; row
  * counts must be invariant (compaction moves rows, never drops them)
  * and the runner VERIFIES that rather than trusting it.
  *
  * Usage: runMain graft.tools.CompactRun <root> <families>
  *   [--checkpoints c1,c2] [--quiesce-secs N] [--min-parts N]
  */
object CompactRun {

  final case class Compacted(family: String, table: String,
      partsBefore: Int, rowsBefore: Long, rowsAfter: Long, skipped: Boolean)

  /** family -> subdir tables, same layout map as ForgetRun. */
  private val families: Seq[(String, Seq[String])] = Seq(
    ("incremental", Seq("digests", "shingles")), ("span", Seq("spans")),
    ("embedding", Seq("cells")), ("url", Seq("canon")),
    ("cdc", Seq("chunks")), ("winnow", Seq("fps")),
    ("recrawl", Seq("state")), ("crossmodal", Seq("labels")))

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, p: String): Boolean =
    fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  private def partCount(spark: SparkSession, dir: String): Int =
    fs(spark, dir).listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))

  def run(spark: SparkSession, root: String, selector: Seq[String],
      checkpoints: Seq[String] = Seq.empty, quiesceSecs: Long = 60L,
      minParts: Int = 2): Seq[Compacted] = {
    val all = selector == Seq("all")
    val known = families.map(_._1).toSet
    val unknown = selector.filterNot(s => s == "all" || known.contains(s))
    require(unknown.isEmpty, s"unknown families: ${unknown.mkString(",")}" +
      s" (known: ${families.map(_._1).mkString(",")},all)")
    val selected = families.filter { case (name, _) =>
      if (all) exists(spark, s"$root/$name") else selector.contains(name)
    }
    selected.foreach { case (name, tables) =>
      require(exists(spark, s"$root/$name/${tables.head}"),
        s"compact refused: family '$name' requested but" +
          s" $root/$name/${tables.head} does not exist")
    }
    require(selected.nonEmpty, "no families selected")
    Maintenance.preflightCheckpoints(spark, checkpoints, quiesceSecs)
    Maintenance.withLock(spark, root) {
      selected.flatMap { case (name, tables) =>
        tables.map { t =>
          val dir = s"$root/$name/$t"
          val parts = partCount(spark, dir)
          val before = PartitionedBase.all(spark, dir).count()
          val skip = parts <= minParts
          if (!skip) PartitionedBase.migrateFlat(spark, dir)
          val after =
            if (skip) before else PartitionedBase.all(spark, dir).count()
          require(after == before,
            s"compaction of $dir changed the row count:" +
              s" $before -> $after — investigate before removing" +
              s" ${dir}_old")
          val c = Compacted(name, t, parts, before, after, skip)
          println(f"[compact] $name/$t: $parts%d parts, $before%d rows" +
            (if (skip) " (skipped, already compact)"
             else f" -> 1 part, $after%d rows"))
          c
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CompactRun <root> <families> [--checkpoints c1,c2]" +
        " [--quiesce-secs N] [--min-parts N]")
    val (root, selector) = (args(0), args(1).split(",").map(_.trim).toSeq)
    val opts = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Sessions
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val done = run(spark, root, selector,
      checkpoints = opts.get("--checkpoints")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      quiesceSecs = opts.get("--quiesce-secs").map(_.toLong).getOrElse(60L),
      minParts = opts.get("--min-parts").map(_.toInt).getOrElse(2))
    println(s"[compact] done: ${done.count(!_.skipped)} compacted," +
      s" ${done.count(_.skipped)} already compact")
    spark.stop()
  }
}
