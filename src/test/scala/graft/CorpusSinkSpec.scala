package graft

import graft.operators.Corpus
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Pins for the training-shard sink: partition layout on disk, the
  * per-file record cap, lossless round-trip, and — the scale property —
  * static partition pruning on the split column at read time. */
class CorpusSinkSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("export: layout, record cap, round-trip, and partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      val frame = Corpus.shardFrame(spark, dir)
      Corpus.exportShards(frame, out, maxRecordsPerFile = 50L)

      // one directory per split, hive-style
      val splits = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(splits == Set("split=train", "split=validation", "split=test"))

      // the record cap holds per shard file
      splits.foreach { s =>
        val files = new java.io.File(s"$out/$s").listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.nonEmpty)
        files.foreach { f =>
          val n = spark.read.parquet(f.getPath).count()
          assert(n <= 50, s"$s/${f.getName} has $n rows")
        }
      }

      // lossless round-trip
      val back = spark.read.parquet(out)
      assert(back.count() == frame.count())
      assert(back.select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet ==
        frame.select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet)

      // a split filter prunes partitions statically: the scan lists only
      // the train directory's files
      val train = back.filter($"split" === "train")
      train.collect()
      val scans = collect(train.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      val trainRows = frame.filter($"split" === "train").count()
      // the split predicate landed in the scan's partition filters (static
      // pruning), not in a post-scan data filter
      assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "split")))
      assert(train.count() == trainRows)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
