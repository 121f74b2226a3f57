package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the repo's whitespace-tokenize idiom
  * `filter(split(text, ' '), x -> x <> '')` and its `size(...)` count
  * form: a token is a maximal run of non-space characters (split on a
  * single literal space yields one empty string per extra space plus
  * leading/trailing empties, which the filter drops — runs of non-space
  * are exactly what survives).
  *
  * The composed form pays a regex split, an allocated intermediate array
  * WITH the empty slots, and an INTERPRETED filter lambda per element;
  * [[Tokens]] is one fused scan building only the surviving tokens, and
  * [[TokenCount]] counts runs without materializing anything. Both stay
  * inside whole-stage codegen. Space here is the single character 0x20 —
  * the idiom's split pattern — NOT general whitespace.
  *
  * Parity is spec'd bit-identical in ExtensionsSpec (real corpus incl.
  * multibyte text, multi-space/leading/trailing/empty edges), and
  * TokenCount(text) == size(Tokens(text)) by construction.
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_tokens expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Tokens.tokensOf(input.asInstanceOf[UTF8String].toString).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  graft.functions.Tokens.tokensOf($a.toString());
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokens {
  /** Two passes, zero intermediate garbage: count the non-space runs,
    * then slice each run once.
    */
  def tokensOf(s: String): Array[UTF8String] = {
    val len = s.length
    var n = 0
    var i = 0
    var in = false
    while (i < len) {
      val sp = s.charAt(i) == ' '
      if (!sp && !in) n += 1
      in = !sp
      i += 1
    }
    val out = new Array[UTF8String](n)
    var k = 0
    i = 0
    while (k < n) {
      while (s.charAt(i) == ' ') i += 1
      var j = i
      while (j < len && s.charAt(j) != ' ') j += 1
      out(k) = UTF8String.fromString(s.substring(i, j))
      i = j
      k += 1
    }
    out
  }

  def countOf(s: String): Long = {
    val len = s.length
    var n = 0L
    var i = 0
    var in = false
    while (i < len) {
      val sp = s.charAt(i) == ' '
      if (!sp && !in) n += 1
      in = !sp
      i += 1
    }
    n
  }

  /** Column-level entry point for the native tokenizer. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Tokens(ColumnBridge.expression(c)))
  }
}

/** `size(filter(split(text, ' '), x -> x <> ''))` as one counting scan —
  * LongType (the idiom is always CAST to BIGINT where it feeds arithmetic).
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_token_count expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Tokens.countOf(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Tokens.countOf($a.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  /** Column-level entry point for the native token counter. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TokenCount(ColumnBridge.expression(c)))
  }
}
