package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the max multiplicity of any n-token window
  * of a token array — `(["a","b","a","b","a","b"], 3)` has windows
  * `a b a / b a b / a b a / b a b` → 2; fewer than n tokens → 0.
  *
  * This is the per-document "top n-gram count" that q65's repetition gate
  * (Gopher's top-trigram share) needs. The statistic is per-doc
  * SELF-CONTAINED, yet its groupBy form costs a corpus-scale
  * (doc, trigram) explode + exchange + per-doc re-aggregation + a doc-key
  * join back — on 100 TB that shuffle carries every trigram of every
  * document. Here it is ONE fused loop inside the scan projection: build
  * each window key (same space-joined form as [[WordNgrams]]), count in a
  * per-row hash map bounded by the document's own window count, return
  * the max. The filter becomes shuffle-free end to end.
  *
  * Equivalence to the groupBy form (spec'd in ExtensionsSpec):
  * `max(c)` over `groupBy(doc, gram).count()` ≡ max multiplicity of the
  * window multiset; the total the share divides by is `size(arr) - n + 1`
  * and needs no kernel. Null elements are skipped by `concat_ws` exactly
  * as in [[WordNgrams]] (split arrays never carry nulls).
  */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_top_ngram_count needs n >= 1, got $n")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_top_ngram_count expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TopNgramCount.topCount(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TopNgramCount.topCount($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramCount {
  private val SPACE = UTF8String.fromString(" ")

  /** One tight loop shared by eval and codegen. */
  def topCount(arr: ArrayData, n: Int): Int = {
    val wins = arr.numElements() - n + 1
    if (wins <= 0) return 0
    val m = new java.util.HashMap[UTF8String, Integer](wins * 2)
    val parts = new Array[UTF8String](n)
    var best = 0
    var i = 0
    while (i < wins) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val k = UTF8String.concatWs(SPACE, parts: _*)
      val prev = m.get(k)
      val c = if (prev == null) 1 else prev.intValue() + 1
      m.put(k, c)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Column-level entry point for the native top-window-count kernel. */
  def apply(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TopNgramCount(ColumnBridge.expression(c), n))
  }
}
