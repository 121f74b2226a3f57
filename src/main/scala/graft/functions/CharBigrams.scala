package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the array of consecutive character
  * (code-point) bigrams of a string — `"abc"` → `["ab", "bc"]`, fewer than
  * two code points → `[]`.
  *
  * This is the codegen'd form of q220's composed
  * `transform(sequence(1, length(text)-1), i -> substring(text, i, 2))`:
  * Spark higher-order functions run an INTERPRETED lambda per element, so
  * the HOF form re-enters the interpreter once per character and builds a
  * boxed index sequence first; it also needs a `length >= 2` guard because
  * `sequence(1, 0)` DESCENDS. Here the whole extraction is one fused Java
  * loop over the string's code points — no index array, no per-element
  * lambda, the n < 2 case yields an empty array, and the expression stays
  * inside whole-stage codegen.
  *
  * Semantics parity (spec'd bit-identical in ExtensionsSpec):
  * - `substring(text, i, 2)` counts CHARACTERS (code points), so stepping
  *   `String.codePointAt` + `Character.charCount` matches exactly,
  *   including multi-byte (zh) text; each emitted bigram is two code
  *   points (the final one ends at the string's last code point).
  * - DuckDB's `substring(text, i, 2)` is also code-point-based, so q220's
  *   oracle SQL is unchanged.
  */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_char_bigrams expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(CharBigrams.bigramsOf(s).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  graft.functions.CharBigrams.bigramsOf($a.toString());
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigrams {
  /** One tight loop shared by eval and codegen: bigram k spans code points
    * k and k+1; `i` tracks the java index of code point k, `j` of k+1.
    */
  def bigramsOf(s: String): Array[UTF8String] = {
    val len = s.length
    val n = s.codePointCount(0, len)
    val out = new Array[UTF8String](if (n < 2) 0 else n - 1)
    var i = 0
    var k = 0
    while (k < out.length) {
      val j = i + Character.charCount(s.codePointAt(i))
      val e = if (j < len) j + Character.charCount(s.codePointAt(j)) else j
      out(k) = UTF8String.fromString(s.substring(i, e))
      i = j
      k += 1
    }
    out
  }

  /** Column-level entry point for the native bigram extraction. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CharBigrams(ColumnBridge.expression(c)))
  }
}
