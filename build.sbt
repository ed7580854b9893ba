ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamsentinelspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// PERF contract (r17 VERDICT item 2): the driver parses the LAST lines of
// `sbt "runMain graft.Bench"` stdout. Forked run output must reach stdout
// undecorated (no `[info] ` prefix through sbt's logger), and sbt's
// trailing `[success] Total time ...` banner must not displace the
// bench's compact JSON line from being the true final stdout line.
// showSuccess only drops that cosmetic banner — command exit codes and
// test failure reporting (ScalaTest's own summary + sbt's nonzero exit)
// are unaffected.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — lint
// can't see that
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// `sbt test` wall time (r17 VERDICT item 1: the serial 33-min suite
// outran the driver's window): split the suites round-robin across N
// forked JVMs running CONCURRENTLY. Each group gets its own JVM and so
// its own shared SparkSession — suite-level parallelism inside ONE JVM
// was tried first and races on session-global state (conf set/reset,
// query listeners, memory-sink names); within a group suites still run
// sequentially, same as the always-green serial order. 8 groups x
// local[4] sessions fit the 32-core host.
val testForkN = sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "8").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / javaOptions).value.toVector
  tests.zipWithIndex.groupBy(_._2 % testForkN).toSeq.sortBy(_._1).map {
    case (i, group) =>
      Tests.Group(s"fork$i", group.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkN))
