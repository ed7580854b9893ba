package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** Replicates embedding_pca_power's ENTIRE quantized algorithm in plain
  * local Scala and demands exact equality: the fixed-point inter-row
  * sums make row order irrelevant and the within-row folds are the same
  * ascending IEEE chain, so a driver-side replay must reproduce every
  * output bit. Also sanity-pins the math: unit top vector, λ₁ within
  * the spectrum, near-null variance share on random embeddings. */
class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def fp(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("distributed power iteration == exact local replay; spectrum sanity") {
    val d = 64
    val vs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
    val n = vs.length

    val mu = Array.tabulate(d) { j =>
      vs.map(v => fp(v(j))).sum.toDouble / 1000000.0 / n
    }
    val xs = vs.map(v => Array.tabulate(d)(j => v(j) - mu(j)))
    val trfp = xs.map(x => fp(dot(x, x))).sum
    var w = Array.tabulate(d)(j => if (j == 0) 1.0 else 0.0)
    var nrm = 0.0
    for (_ <- 1 to 8) {
      val su = Array.fill(d)(0L)
      xs.foreach { x =>
        val s = dot(x, w)
        var j = 0
        while (j < d) { su(j) += fp(s * x(j)); j += 1 }
      }
      val u = su.map(_.toDouble / 1000000.0)
      nrm = math.sqrt(dot(u, u))
      w = u.map(_ / nrm)
    }

    val row = Similarity.pcaPower(spark, dir).collect()(0)
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == trfp.toDouble / 1000000.0 / n, "trace_mean")
    assert(row.getDouble(2) == nrm / n, "lambda1")
    assert(row.getDouble(3) == nrm / (trfp.toDouble / 1000000.0), "var_share")
    def r6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    (0 to 3).foreach { i =>
      assert(row.getDouble(4 + i) == r6(w(i)), s"w${i + 1}")
    }

    // sanity: unit vector; λ1 within [λ̄·0.5, trace] and the share on
    // near-random data stays near the 1/d null, not a spurious structure
    assert(math.abs(dot(w, w) - 1.0) < 1e-9)
    val lambda1 = nrm / n
    val traceMean = trfp.toDouble / 1000000.0 / n
    assert(lambda1 > traceMean / d * 0.5 && lambda1 < traceMean)
    assert(row.getDouble(3) < 0.2, s"var_share ${row.getDouble(3)} implausibly high")
  }
}
