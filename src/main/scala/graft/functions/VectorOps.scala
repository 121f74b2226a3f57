package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>` columns.
  *
  * Everything here composes built-in higher-order functions (zip_with /
  * aggregate), so it stays inside Catalyst + whole-stage codegen — no Scala
  * UDF deserialization on the hot path. The fold is sequential
  * left-to-right, which matches DuckDB's list_inner_product accumulation
  * order, keeping oracle comparisons bit-stable before rounding.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ with elements cast to double before multiply/accumulate. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) via the composed higher-order functions (reference form). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cos(a, b) via the native codegen'd [[CosineSimilarity]] expression —
    * one fused loop, no intermediate arrays; bit-identical to cosineHof.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
