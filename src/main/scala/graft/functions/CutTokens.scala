package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: rejoin a token array with single spaces,
  * dropping the positions named in a SORTED cover array —
  * `(["a","b","c","d"], [1,2])` → `"a d"`.
  *
  * This is q151/q154's REMOVAL step (the ExactSubstr cut): the HOF form
  * `array_join(filter(w, (x, i) -> NOT array_contains(covered, i)), ' ')`
  * runs an interpreted lambda per token AND an `array_contains` linear
  * scan per call — O(tokens × |covered|) per document, which the q154
  * Scaladoc used to ticket as "swap the final stage for a per-token
  * shuffle on book-length heavily-duplicated corpora". Here it is one
  * fused two-pointer merge walk over the tokens and the (sorted) cover —
  * O(tokens + |covered|), no lambda, no per-call scan — so the caveat is
  * closed structurally rather than documented.
  *
  * Semantics parity (spec'd bit-identical in ExtensionsSpec): positions
  * are 0-based (the HOF filter's index), the cover is SORTED ascending
  * (the call site builds it with `array_sort`; out-of-range entries are
  * ignored exactly as `array_contains` never matching them), and null
  * tokens are omitted from the join exactly as `array_join` omits them.
  */
case class CutTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cut_tokens expects (array<string>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(tokens: Any, covered: Any): Any =
    CutTokens.cutJoin(
      tokens.asInstanceOf[ArrayData], covered.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, c) =>
      s"${ev.value} = graft.functions.CutTokens.cutJoin($w, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CutTokens {
  private val SPACE = UTF8String.fromString(" ")

  /** One two-pointer walk shared by eval and codegen. `covered` must be
    * sorted ascending (the call-site contract). */
  def cutJoin(w: ArrayData, covered: ArrayData): UTF8String = {
    val n = w.numElements()
    val m = covered.numElements()
    val kept = new Array[UTF8String](n)
    var k = 0
    var i = 0
    var j = 0
    while (i < n) {
      while (j < m && covered.getLong(j) < i) j += 1
      if (!(j < m && covered.getLong(j) == i)) {
        val t = w.getUTF8String(i)
        if (t != null) { kept(k) = t; k += 1 }
      }
      i += 1
    }
    UTF8String.concatWs(SPACE, java.util.Arrays.copyOf(kept, k).toSeq: _*)
  }

  /** Column-level entry point for the native cut-and-rejoin kernel. */
  def apply(tokens: Column, covered: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CutTokens(
      ColumnBridge.expression(tokens), ColumnBridge.expression(covered)))
  }
}
