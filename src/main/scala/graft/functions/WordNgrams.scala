package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all space-joined n-token windows of a token
  * array — `(["a","b","c"], 2)` → `["a b", "b c"]`, fewer than n tokens →
  * `[]`.
  *
  * This is the codegen'd form of the repo's word-shingle idiom
  * `transform(sequence(1, size(w)-(n-1)), i -> concat_ws(' ', w[i-1], ...))`
  * (and its `slice` variant for wide windows): higher-order functions run
  * an INTERPRETED lambda per element, materialize a boxed index sequence
  * first, and need a `size >= n` guard because `sequence(1, 0)` DESCENDS.
  * Here the window sweep is one fused loop per document — no index array,
  * no per-element lambda, no per-window ArrayData slice copy — and the
  * size < n case yields an empty array.
  *
  * Semantics parity (spec'd bit-identical in ExtensionsSpec): windows are
  * consecutive elements joined with a single space; null elements are
  * skipped exactly as `concat_ws` skips them (token arrays from `split`
  * never carry nulls, but the contract matches regardless).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_word_ngrams needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_word_ngrams expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordNgrams.ngramsOf(input.asInstanceOf[ArrayData], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  graft.functions.WordNgrams.ngramsOf($a, $n);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  private val SPACE = UTF8String.fromString(" ")

  /** One tight loop shared by eval and codegen. */
  def ngramsOf(arr: ArrayData, n: Int): Array[UTF8String] = {
    val sz = arr.numElements()
    val out = new Array[UTF8String](math.max(0, sz - n + 1))
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    out
  }

  /** Column-level entry point for the native n-gram window sweep. */
  def apply(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
  }
}
