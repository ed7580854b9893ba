package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scaling probe: times one run of each query at two data
  * scales and prints the ratio — empirical evidence for the
  * would-it-hold-at-N-times question (see SCALE_NOTES.md). Usage:
  *   runMain graft.tools.ScaleProbe <dirA> <dirB> [queryCsv]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val wanted: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def one(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[$name@$dir] $e") }
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.isEmpty || wanted.contains(n))
    // warm both dirs
    Seq(dirA, dirB).foreach(d =>
      try spark.read.parquet(s"$d/events.parquet").limit(1).count()
      catch { case _: Throwable => })
    names.foreach { n =>
      val a = one(n, dirA)
      val b = one(n, dirB)
      println(f"SCALE $n%-28s A=$a%8.2fs B=$b%8.2fs ratio=${b / a}%6.2fx")
    }
    spark.stop()
  }
}
