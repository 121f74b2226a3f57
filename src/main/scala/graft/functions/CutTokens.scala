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
  * are 0-based (the HOF filter's index), out-of-range entries are
  * ignored exactly as `array_contains` never matching them, and null
  * tokens are omitted from the join exactly as `array_join` omits them.
  * The fast path assumes the cover is sorted ascending (the internal
  * call site builds it with `array_sort`), but the function is also
  * SQL-registered for users: an unsorted cover is detected in the same
  * walk and defensively sorted (the HOF form was order-insensitive — a
  * silent wrong cut is not an acceptable public contract), and a NULL
  * cover element is rejected LOUDLY (the HOF's own null behavior —
  * `NOT array_contains(...)` turning NULL and silently dropping every
  * uncovered token — is a footgun, not a contract worth mirroring).
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

  /** One two-pointer walk shared by eval and codegen. Sorted covers
    * (the internal call-site shape) walk directly; an unsorted cover is
    * copied and sorted first; a NULL cover element throws by name. */
  def cutJoin(w: ArrayData, covered: ArrayData): UTF8String = {
    val n = w.numElements()
    val m = covered.numElements()
    // one validation pass: nulls rejected, sortedness detected
    var sorted = true
    var p = 0
    var prev = Long.MinValue
    while (p < m) {
      if (covered.isNullAt(p))
        throw new IllegalArgumentException(
          "graft_cut_tokens: the cover array must not contain NULL elements")
      val v = covered.getLong(p)
      if (v < prev) sorted = false
      prev = v
      p += 1
    }
    val cov: Array[Long] =
      if (sorted) null
      else { val a = covered.toLongArray(); java.util.Arrays.sort(a); a }
    @inline def covAt(j: Int): Long =
      if (cov == null) covered.getLong(j) else cov(j)
    val kept = new Array[UTF8String](n)
    var k = 0
    var i = 0
    var j = 0
    while (i < n) {
      while (j < m && covAt(j) < i) j += 1
      if (!(j < m && covAt(j) == i)) {
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
