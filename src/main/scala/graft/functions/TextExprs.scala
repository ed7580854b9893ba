package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass text kernels, callable from interpreted eval AND
  * generated code (the codegen emits one static call per row; the scan
  * loop inside JIT-compiles to straight-line byte compares). */
object TextKernels {

  /** One scan over the UTF-8 BYTES of `s`, returning
    * `[n_ws_tokens, n_word_pieces, n_digit_runs]`:
    *
    *  - n_ws_tokens: maximal runs of non-whitespace, whitespace being
    *    Java regex `\s` = [ \t\n\x0B\f\r] — exactly
    *    `size(filter(split(text, "\\s+"), _ =!= ""))`. EXACT for any
    *    UTF-8 input: no continuation byte collides with an ASCII
    *    whitespace byte, so a multi-byte char is just more non-ws bytes
    *    in the same run.
    *  - n_word_pieces: maximal runs of [a-zA-Z0-9] — exactly
    *    `size(filter(split(lower(text), "[^a-z0-9]+"), _ =!= ""))` on
    *    ASCII (verified property of the documents fixture; spec-pinned).
    *    On general UTF-8 the two differ only for exotic case mappings
    *    (U+212A KELVIN SIGN lowercases into ASCII 'k'; U+0130 expands
    *    under full lowercasing) — out of the fixture domain, documented
    *    rather than branched on.
    *  - n_digit_runs: maximal runs of [0-9] — exact for any UTF-8.
    *
    * The byte scan replaces THREE regex passes (each compiling a match
    * over the full text and materializing a token array) with one
    * allocation-free loop — this was the bench's most expensive query
    * (VERDICT r8 item 7). */
  def tokenCounts(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var ws = 0L; var wp = 0L; var dr = 0L
    var inWs = false; var inWp = false; var inDr = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val isSpace = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
        b == '\f' || b == '\r'
      val isDigit = b >= '0' && b <= '9'
      val isAlnum = isDigit || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
      if (!isSpace) { if (!inWs) ws += 1L; inWs = true } else inWs = false
      if (isAlnum) { if (!inWp) wp += 1L; inWp = true } else inWp = false
      if (isDigit) { if (!inDr) dr += 1L; inDr = true } else inDr = false
      i += 1
    }
    new GenericArrayData(Array(ws, wp, dr))
  }
}

/** `token_counts(text)` -> `array<bigint>` `[n_ws_tokens, n_word_pieces,
  * n_digit_runs]` in ONE byte scan (semantics and domain notes:
  * [[TextKernels.tokenCounts]]). Tier (b) of the custom-operator ladder,
  * same rationale as [[DotDouble]]: the tokenization is the inner loop of
  * the token-count query and regex splitting is three full passes with
  * per-token allocation; this stays inside whole-stage codegen as a
  * single static call. */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_token_counts requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_token_counts"

  override def nullSafeEval(s: Any): Any =
    TextKernels.tokenCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.tokenCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TextExprs {
  /** `token_counts(text)` as a Column — wraps [[TokenCounts]]. */
  def tokenCounts(text: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(text)))
}
