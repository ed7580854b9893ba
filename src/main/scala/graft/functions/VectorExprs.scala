package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why a custom `Expression` (tier (b) of the custom-operator ladder)
  * instead of the built-in `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * composition: Catalyst evaluates higher-order-function lambdas
  * interpreted, one function call per element, and the HOF chain
  * allocates a zipped intermediate array per row. For the ANN operators
  * the dot product IS the inner loop (numQueries x corpus x 64 dims for
  * brute force, K x corpus for IVF assignment), so this expression
  * compiles the fold into whole-stage-codegen'd Java: one primitive
  * `for` loop, no allocation, no virtual calls.
  *
  * Semantics are IDENTICAL to the HOF form on the embedding domain
  * (equal-length null-free arrays): a SEQUENTIAL ascending-index fold of
  * `acc + a(i) * b(i)` — the same evaluation order the DuckDB oracles
  * use (`list_sum(list_transform(list_zip(...)))`), so results stay
  * bit-for-bit identical in IEEE double arithmetic. Nulls: a null array
  * yields null (like the HOF form); null ELEMENTS are read as 0.0 —
  * out of the embedding domain, documented rather than branched on, to
  * keep the codegen loop branch-free. Mismatched lengths fold over the
  * shorter prefix (the HOF form would instead null the whole result via
  * zip_with padding — again out of domain: fixture vectors are all
  * 64-dim).
  *
  * Registered as SQL function `graft_dot` via [[GraftExtensions]]
  * (`SparkSessionExtensions.injectFunction`) so `expr("graft_dot(a,b)")`
  * and the DataFrame API [[VectorExprs.dotd]] both resolve to it.
  */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst dot product over two `array<bigint>` columns — the
  * EXACT-arithmetic sibling of [[DotDouble]] for fixed-point vector
  * math (quantized embeddings, integer centroids). Where [[DotDouble]]
  * trades on IEEE determinism of an ordered fold, this one needs no
  * ordering argument at all: long multiply-add wraps identically in
  * every engine and the operands are bounded well below 2^63 by the
  * callers' quantization contracts (1e-6 fixed point, |x| < ~1e6, so a
  * 64-dim dot tops out near 1e14). Same null/length semantics as
  * [[DotDouble]]: null array → null, null elements read as 0, fold
  * over the shorter prefix — all out of the quantized-embedding domain.
  *
  * Registered as SQL `graft_dotl` via [[GraftExtensions]]. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotl requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dotl"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-API and SQL-registry surface for the graft expressions. */
object VectorExprs {

  /** `dot(a, b)` as a Column — wraps [[DotDouble]] for DataFrame use. */
  def dotd(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotDouble(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact long dot as a Column — wraps [[DotLong]]. */
  def dotl(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The `injectFunction` description for `graft_dotl`. */
  val dotlDescription: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dotl"),
      new ExpressionInfo(classOf[DotLong].getName, "graft_dotl"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dotl expects 2 arguments, got ${children.length}")
        DotLong(children.head, children(1))
      })

  /** The `injectFunction` description for `graft_dot`. */
  val dotDescription: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotDouble].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot expects 2 arguments, got ${children.length}")
        DotDouble(children.head, children(1))
      })
}

/** `SparkSessionExtensions` hook: add via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * Registers the native expressions (tier b) and the group-wise top-k
  * planner strategy (tier c, [[graft.plans.TopKPerKeyStrategy]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExprs.dotDescription)
    ext.injectFunction(VectorExprs.dotlDescription)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RateWindowRewrite)
  }
}
