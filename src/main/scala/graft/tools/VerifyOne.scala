package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: Verify for a SUBSET of queries — args: names.csv sfDir outDir.
  * Writes each named query's parquet plus an oracle_sql.json restricted to
  * those names, so tools/check_oracle.py can gate a single new operator in
  * seconds instead of re-running the full 100+-query sweep. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(csv, sfDir, outDir) = args
    val names = csv.split(",").toSeq
    val spark = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
