package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes — the kernel
  * behind the Gopher-style compression-ratio quality signal (q194): text
  * that compresses far below natural prose is repetition/boilerplate;
  * text that barely compresses is high-entropy gibberish (random ids,
  * minified blobs, encrypted junk). A static-call kernel like
  * [[JaroWinklerKernel]] so it inlines into whole-stage codegen; one
  * Deflater per evaluation (they are NOT thread-safe — a shared instance
  * across codegen'd tasks would corrupt), level 6 (zlib's default
  * trade), input capped at [[DeflateKernel.MaxBytes]] so an adversarial
  * document bounds the per-row cost (the ratio over the first 64 KiB is
  * the same signal — entropy is a local property).
  *
  * Determinism: JDK Deflater output for fixed (input, level, strategy,
  * wrap) is deterministic within a JVM, which is all the rows-only
  * contract needs (the spec pins ORDERING properties — repetitive <
  * prose < random — not exact byte counts, so even a zlib version bump
  * cannot flip the operator's verdicts).
  */
object DeflateKernel {
  final val MaxBytes = 64 * 1024

  def deflateLen(s: UTF8String): Long = {
    val all = s.getBytes
    val bytes = if (all.length <= MaxBytes) all
      else java.util.Arrays.copyOf(all, MaxBytes)
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

object DeflateLen {
  /** DataFrame-API entry: `DeflateLen.of(col("text"))`. */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c)))
  }
}

/** `graft_deflate_len(text)` — native expression (codegen via a static
  * kernel call; no UDF boxing).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_len expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateKernel.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
