package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer-moment accumulator: count plus quantized S1/S2 sums.
  * Addition of longs is associative, so merge order — which Spark does
  * not guarantee — cannot change the result. */
final case class MomentBuf(n: Long, s1: Long, s2: Long)

/** (count, mean, population sigma) of a group. */
final case class GroupStats(n: Long, mean: Double, sigma: Double)

/** Typed `Aggregator` computing exact group statistics — the SURVEY §7
  * "optional nicety": the moving-stats moment trick from
  * [[graft.operators.Detectors.statisticalAlerts]] packaged as a
  * reusable `TypedColumn` for any `agg(...)` call.
  *
  * This is the (b)-tier extension point (typed Aggregator / TypedColumn)
  * — not a Scala UDF: Spark plans it as a proper partial-then-final
  * aggregate, so the map side combines MomentBuf values before the
  * shuffle and the wire carries 3 longs per (partition, group).
  *
  * Determinism contract (same as the detectors): values quantize to
  * integers at `quantScale` decimals, the moments stay in exact int64
  * space (n*S2 - S1^2 < 2^53 for the fixture domain), and the final
  * doubles are the identical IEEE op sequence in any engine:
  *   mean  = S1 / n / 10^q
  *   sigma = sqrt(n*S2 - S1^2) / n / 10^q   (population, /N)
  */
final class StatsAgg(quantScale: Int = 2)
    extends Aggregator[Double, MomentBuf, GroupStats] {

  private val sf = math.pow(10, quantScale)

  override def zero: MomentBuf = MomentBuf(0L, 0L, 0L)

  override def reduce(b: MomentBuf, v: Double): MomentBuf = {
    val c = math.floor(v * sf + 0.5).toLong
    MomentBuf(b.n + 1, b.s1 + c, b.s2 + c * c)
  }

  override def merge(a: MomentBuf, b: MomentBuf): MomentBuf =
    MomentBuf(a.n + b.n, a.s1 + b.s1, a.s2 + b.s2)

  override def finish(b: MomentBuf): GroupStats =
    if (b.n == 0) GroupStats(0L, 0.0, 0.0)
    else {
      // D = n*S2 - S1^2 in BigInt: the int64 bound covers S1/S2 but NOT
      // their products (n*S2 wraps at n~1e6 of large values), and the
      // DuckDB twin evaluates the same products in 128-bit HUGEINT —
      // BigInt reproduces that exactly, then both sides double-cast D
      val d = (BigInt(b.n) * BigInt(b.s2) - BigInt(b.s1) * BigInt(b.s1)).toDouble
      GroupStats(b.n,
        b.s1.toDouble / b.n / sf,
        math.sqrt(d) / b.n / sf)
    }

  override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  override def outputEncoder: Encoder[GroupStats] = Encoders.product[GroupStats]
}
