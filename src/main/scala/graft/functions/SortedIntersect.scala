package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED string arrays as ONE native merge scan.
  *
  * The confirm family (q31/q199/q210/q240/q249/q261) computed exact
  * shingle intersections by exploding every candidate document's shingle
  * set into rows and self-joining per pair on shingle equality — a
  * per-pair row blowup of Σ|A|+|B| join-probe rows plus a
  * (doc_a, doc_b) re-aggregation exchange, the suite's slowest family at
  * sf0.1 (q261 4.2 s). This expression reads the two documents' sorted
  * distinct-shingle arrays (built ONCE per doc by sort_array∘collect_set
  * on the same shingle stream) and counts equal elements in a single
  * linear merge, so the per-pair cost is |A|+|B| comparisons with no
  * intermediate rows, no join and no re-aggregation exchange.
  *
  * Exactness: the count is set-intersection cardinality over the VERBATIM
  * shingle strings — no hashing anywhere, so no collision can inflate it.
  * The merge comparator is UTF8String.compareTo (binary), the SAME
  * ordering `sort_array` applies to StringType, so equal-element
  * alignment is total. Defensive cases: a NULL array on either side →
  * NULL (BinaryExpression null-intolerance, matching the inner joins the
  * composed form used); NULL elements (unreachable off collect_set, which
  * drops nulls) are skipped — SQL equality semantics, a NULL shingle
  * matches nothing.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<string>, got ${l.sql}, ${r.sql}")
    }

  /** The merge scan — called from both interpreted eval and generated
    * code (public for codegen access; the child arrays arrive as
    * ArrayData column variables, so whole-stage codegen fuses through
    * this expression with NO per-row InternalRow materialization — a
    * CodegenFallback here forced an UnsafeRow copy of BOTH arrays per
    * pair, censused at ~4× the merge's own cost on q261's pair frame). */
  def merge(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1        // nulls sort first; match nothing
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1L; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sic", this, classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.merge($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
