package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.DotDouble]] expression: value
  * equality (bit-for-bit) with the interpreted HOF fold it replaced,
  * null handling, SQL registration via GraftExtensions, and that the
  * expression actually participates in whole-stage codegen (the entire
  * point of writing it as a Catalyst expression). */
class VectorExprsSpec extends SparkSpec {

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the interpreted HOF sequential fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorExprs.dotd(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      // exact comparison on purpose: same ascending-index IEEE fold
      assert(r.getDouble(1) == r.getDouble(2), s"row ${r.getLong(0)}")
    }
  }

  test("null array yields null, like the HOF form") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(VectorExprs.dotd(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("graft_dot resolves from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0)
    assert(r.getDouble(0) == 32.0)
  }

  test("rejects non-array<double> inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array('x'), array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("projection with graft_dot stays inside whole-stage codegen") {
    // spark.range (not a local literal Seq) so constant folding can't
    // collapse the whole projection into a LocalTableScan
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(VectorExprs.dotd(col("a"), col("b")).as("d"))
    assert(df.agg(sum("d")).collect()(0).getDouble(0) ==
      (0 until 100).map(i => i * 3.0 + 2.0 * i).sum)
    val hasWsc = df.queryExecution.executedPlan.exists {
      case w: WholeStageCodegenExec =>
        w.child.expressions.exists(_.exists(
          _.isInstanceOf[graft.functions.DotDouble]))
      case _ => false
    }
    assert(hasWsc, df.queryExecution.executedPlan.toString)
  }

  // ---- DotLong: the exact fixed-point sibling ----

  test("graft_dotl matches a local exact long fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(100) { i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(2000001) - 1000000L),
        Array.fill(64)(rnd.nextInt(2000001) - 1000000L))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), VectorExprs.dotl(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, a, b) =>
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      assert(got(id) == want, s"row $id")
    }
  }

  test("graft_dotl resolves from SQL and rejects non-long arrays") {
    val r = spark.sql(
      "SELECT graft_dotl(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0)
    assert(r.getLong(0) == 32L)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dotl(array(1.0d), array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_dotl"))
  }

  test("graft_dotl null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1L, 2L)), None: Option[Array[Long]]))
      .toDF("a", "b")
    val r = df.select(VectorExprs.dotl(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("projection with graft_dotl stays inside whole-stage codegen") {
    val df = spark.range(100)
      .select(array(col("id"), lit(2L)).as("a"),
        array(lit(3L), col("id")).as("b"))
      .select(VectorExprs.dotl(col("a"), col("b")).as("d"))
    assert(df.agg(sum("d")).collect()(0).getLong(0) ==
      (0 until 100).map(i => i * 3L + 2L * i).sum)
    val hasWsc = df.queryExecution.executedPlan.exists {
      case w: WholeStageCodegenExec =>
        w.child.expressions.exists(_.exists(
          _.isInstanceOf[graft.functions.DotLong]))
      case _ => false
    }
    assert(hasWsc, df.queryExecution.executedPlan.toString)
  }
}
