package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Ascending, Attribute, AttributeReference, Cast, Coalesce, CreateArray, CreateNamedStruct, CurrentRow, Divide, Explode, Expression, Floor, GetStructField, GreaterThanOrEqual, If, Literal, Multiply, Not, NullsFirst, RangeFrame, SortOrder, SpecifiedWindowFrame, Subtract, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: makes the skew-safe, slice-parallel plan the DEFAULT for
  * the trailing-RANGE count window (the rate-spike shape,
  * [[graft.operators.Detectors.rateAlerts]] — reference semantics
  * RateSpikeDetector.java:74-114). Rewrites
  *
  *   Filter (f(cnt))
  *     Window [count(1) OVER (PARTITION BY p ORDER BY ts
  *                            RANGE BETWEEN w PRECEDING AND CURRENT ROW) cnt]
  *
  * into the sliced form proven out by
  * [[graft.operators.Detectors.rateAlertsSliced]]: the timeline chops into
  * slices of s = max(64*w, 3600) seconds, the window partitions by
  * (p, slice), and each event in the last w seconds of a slice is ALSO
  * copied into the next slice as a context row (counted by neighbours,
  * dropped by the filter). Any frame member is at most w behind its row, so
  * it lives in the same slice or arrives as a context copy — each exactly
  * once — making every surviving row's count identical to the
  * single-partition window's. A hot key then spreads over timeline/s tasks
  * (the sf1 hot-key adversary: 1.82x serialization on the plain plan, ~1.3x
  * sliced) at a replication overhead of w/s <= 1/64.
  *
  * Unlike the DataFrame-level `rateAlertsSliced` (a two-scan union), the
  * rewrite emits home + context rows from ONE pass over the child via
  * `explode(array(home, ctx?))`, so the rewritten plan reads the source
  * once.
  *
  * Fires only when the rewrite is airtight:
  *  - the Window computes EXACTLY ONE expression: count(1) over a
  *    RANGE frame [-w, CURRENT ROW] with a foldable negative lower bound
  *    (any other aggregate, or an unbounded/row frame, declines);
  *  - ordered by a single ASC NULLS FIRST integral-typed expression
  *    (integral `ts` + integral slice width make slice assignment exact:
  *    a double `t/s` can only misplace a boundary when t >= 2^53);
  *  - the parent Filter references the count (the shape's fire-filter).
  *
  * Null `ts` rows keep their semantics: a RANGE frame over a null ORDER key
  * frames exactly the null peer group, and the rewrite sends all null-ts
  * rows of a key to the single `null` slice (the context branch's null
  * comparison collapses to no-copy), so they see the same peers.
  *
  * Idempotency: rewritten Window nodes carry [[RateWindowRewrite.SLICED]]
  * (the operator-optimization batch runs to fixpoint); the reserved
  * `__graft_slice` partition column is a structural backstop should a
  * non-tag-preserving copy drop the tag.
  */
object RateWindowRewrite extends Rule[LogicalPlan] {

  val SLICED: TreeNodeTag[Unit] = TreeNodeTag[Unit]("graft.rateWindowSliced")

  /** Slice width for a window of `w` seconds: wide enough that context
    * replication stays <= 1/64, floored at an hour so micro-windows don't
    * produce degenerate second-level slices. Mirrors
    * `Detectors.rateAlertsSliced`'s default. */
  def sliceSecondsFor(w: Long): Long = math.max(w * 64L, 3600L)

  private def negLong(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, ByteType) if v < 0 => Some(v.toLong)
    case Literal(v: Short, ShortType) if v < 0 => Some(v.toLong)
    case Literal(v: Int, IntegerType) if v < 0 => Some(v.toLong)
    case Literal(v: Long, LongType) if v < 0 => Some(v)
    case _ => None
  }

  private def isCountStar(agg: Expression): Boolean = agg match {
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _) => v != null
    case _ => false
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def alreadySliced(w: Window): Boolean =
    w.getTagValue(SLICED).nonEmpty || w.partitionSpec.exists(_.exists {
      case a: Attribute => a.name == "__graft_slice"
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, w @ Window(
        Seq(alias @ Alias(WindowExpression(agg,
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RangeFrame, lowerB, CurrentRow))), _)),
        parts, Seq(order @ SortOrder(ts, Ascending, NullsFirst, _)), child, _))
        if !alreadySliced(w) && isCountStar(agg) && integral(ts) &&
          ts.deterministic && parts.forall(_.deterministic) &&
          negLong(lowerB).isDefined &&
          cond.references.contains(alias.toAttribute) =>
      val winSec = -negLong(lowerB).get
      val s = sliceSecondsFor(winSec)

      // slice = floor(ts / s); exact for |ts| < 2^53 (integral ts, integral s)
      val slice = Floor(Divide(Cast(ts, DoubleType), Literal(s.toDouble)))
      val nextSlice = Add(slice, Literal(1L))
      def elem(sl: Expression, ctx: Boolean): Expression =
        CreateNamedStruct(Seq(
          Literal("__graft_slice"), sl, Literal("__graft_ctx"), Literal(ctx)))
      val inBand = GreaterThanOrEqual(Cast(ts, LongType),
        Subtract(Multiply(nextSlice, Literal(s)), Literal(winSec)))
      val copies = If(Coalesce(Seq(inBand, Literal(false))),
        CreateArray(Seq(elem(slice, ctx = false), elem(nextSlice, ctx = true))),
        CreateArray(Seq(elem(slice, ctx = false))))

      val arrT = copies.dataType.asInstanceOf[ArrayType]
      val genOut = AttributeReference("col", arrT.elementType, arrT.containsNull)()
      val gen = Generate(Explode(copies), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(genOut), child = child)

      val sliceAlias = Alias(GetStructField(genOut, 0, Some("__graft_slice")), "__graft_slice")()
      val ctxAlias = Alias(GetStructField(genOut, 1, Some("__graft_ctx")), "__graft_ctx")()
      val proj = Project(child.output ++ Seq(sliceAlias, ctxAlias), gen)

      val newParts = parts :+ sliceAlias.toAttribute
      val frame = SpecifiedWindowFrame(RangeFrame, lowerB, CurrentRow)
      val newAlias = Alias(
        WindowExpression(agg, WindowSpecDefinition(newParts, Seq(order), frame)),
        alias.name)(exprId = alias.exprId)
      val newWin = Window(Seq(newAlias), newParts, Seq(order), proj)
      newWin.setTagValue(SLICED, ())

      // home rows only; their counts are frame-identical to the plain window's
      Project(w.output, Filter(And(Not(ctxAlias.toAttribute), cond), newWin))
  }
}
