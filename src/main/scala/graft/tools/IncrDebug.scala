package graft.tools

import graft.streaming.StreamingIncrementalDedup
import org.apache.spark.sql.functions._

/** Dev-only scratch: reproduce the grow-mode near-dup miss. */
object IncrDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("incrdbg").toString
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val text2 = (1 to 30).map(i => f"tok$i%02d").mkString(" ")
    StreamingIncrementalDedup.initBase(Seq((1L, text1)).toDF("doc_id", "text"), baseDir)
    val onBatch = StreamingIncrementalDedup.onBatch(baseDir, growBase = true,
      (hits, id) => println(s"[dbg] batch $id hits: " +
        hits.collect().mkString(" | ")))
    onBatch(Seq((10L, text1), (11L, text2), (12L, text2)).toDF("doc_id", "text"), 0L)
    println("[dbg] shingle doc_ids after b0: " +
      spark.read.parquet(s"$baseDir/shingles").groupBy("doc_id").count().collect().mkString(","))
    println("[dbg] digests after b0: " +
      spark.read.parquet(s"$baseDir/digests").collect().mkString(","))
    val near2 = text2.replace("tok15", "zzz")
    onBatch(Seq((20L, text2), (21L, near2)).toDF("doc_id", "text"), 1L)
    spark.stop()
  }
}
