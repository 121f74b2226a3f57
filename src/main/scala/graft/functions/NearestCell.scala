package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native coarse-quantizer scoring against a driver-held centroid array.
  *
  * The composed forms — `array(struct(round(graft_cosine(v, lit_cᵢ), 6),
  * -i) …)` under `array_max` / `reverse(array_sort(…))` — contain
  * higher-order/collection expressions with no codegen, so the WHOLE
  * per-row assignment evaluated interpreted: ~0.12 ms/row for k=16·d=64
  * (measured — the corpus-assignment stage of every IVF/graph-ANN query,
  * and the dominant single-task stage of q48's warm runs). These two
  * expressions run the identical scoring in one fused native pass
  * (vector extracted once, its norm computed once instead of once per
  * centroid) and are BIT-EQUAL to the composed forms, including the
  * degenerate rows:
  *
  *  - cosine per cell = CosineSimilarity's fold (same accumulation
  *    order), rounded with the same `java.math.BigDecimal.valueOf(x)
  *    .setScale(6, HALF_UP)` Spark's `round` applies to doubles;
  *  - a NULL vector, length-mismatched vector, or NULL element makes
  *    every cell's score NULL — the struct ordering then falls back to
  *    `negcell`, i.e. cells in id order (cell 0 "wins");
  *  - a zero-norm vector or centroid mirrors Divide: ANSI throws the
  *    same DIVIDE_BY_ZERO, non-ANSI yields a NULL score for that cell;
  *  - ties on the rounded score resolve toward the SMALLER cell id
  *    (max over (cs, negcell) structs).
  */
private[graft] object CellScoreKernel {

  /** Centroid L2 norms, computed once per expression instance. */
  def norms(centers: Array[Array[Double]]): Array[Double] =
    centers.map { c =>
      var i = 0; var s = 0.0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  /** Spark `round(x, 6)` for doubles, verbatim. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Extract the vector once; null means "score every cell NULL". */
  def extract(v: ArrayData, isFloat: Boolean, dim: Int): Array[Double] = {
    if (v == null || v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    x
  }

  /** Rounded cosine of the extracted vector against centroid c, boxed;
    * null when the score is SQL NULL (degenerate row, or zero norm under
    * non-ANSI). Throws under ANSI for a zero norm — same error object as
    * the composed CosineSimilarity. */
  def scoreOf(x: Array[Double], xnorm: Double, centers: Array[Array[Double]],
      cnorm: Array[Double], c: Int, failOnError: Boolean): java.lang.Double = {
    if (x == null) return null
    if (xnorm == 0.0 || cnorm(c) == 0.0) {
      if (failOnError) throw CosineSimilarity.divideByZeroError() else return null
    }
    val ctr = centers(c)
    var dot = 0.0
    var j = 0
    while (j < ctr.length) { dot += x(j) * ctr(j); j += 1 }
    java.lang.Double.valueOf(round6(dot / (xnorm * cnorm(c))))
  }

  def xnormOf(x: Array[Double]): Double = {
    if (x == null) return 0.0
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  /** argmax cell — `-array_max(scoredCells(v)).negcell` verbatim. */
  def assign(v: ArrayData, isFloat: Boolean, centers: Array[Array[Double]],
      cnorm: Array[Double], failOnError: Boolean): Int = {
    val x = extract(v, isFloat, centers(0).length)
    val xn = xnormOf(x)
    var best: java.lang.Double = null
    var bestCell = 0
    var c = 0
    while (c < centers.length) {
      val cs = scoreOf(x, xn, centers, cnorm, c, failOnError)
      // null never beats non-null; first (smallest id) wins ties — the
      // (cs, negcell) struct-max rule
      if (cs != null && (best == null || cs.doubleValue() > best.doubleValue()))
        { best = cs; bestCell = c }
      c += 1
    }
    bestCell
  }

  /** Full k-cell score list, descending (cs desc NULLS LAST, then cell id
    * ascending) — `reverse(array_sort(scoredCells(v)))` verbatim. */
  def sortedScores(v: ArrayData, isFloat: Boolean, centers: Array[Array[Double]],
      cnorm: Array[Double], failOnError: Boolean): ArrayData = {
    val x = extract(v, isFloat, centers(0).length)
    val xn = xnormOf(x)
    val k = centers.length
    val cs = new Array[java.lang.Double](k)
    var c = 0
    while (c < k) { cs(c) = scoreOf(x, xn, centers, cnorm, c, failOnError); c += 1 }
    val order = Array.tabulate(k)(identity).sortWith { (a, b) =>
      (cs(a), cs(b)) match {
        case (null, null) => a < b   // negcell desc == id asc
        case (null, _)    => false   // null score sorts last
        case (_, null)    => true
        case (sa, sb)     =>
          if (sa.doubleValue() != sb.doubleValue()) sa.doubleValue() > sb.doubleValue()
          else a < b
      }
    }
    new GenericArrayData(order.map { i =>
      InternalRow(cs(i), -i): Any
    })
  }
}

/** The greedy beam walk over a driver-held hub graph as ONE kernel —
  * [[graft.operators.Similarity.walkProbes]]'s unrolled column form,
  * verbatim: per hop, candidates = beam ∪ their neighbor lists, each
  * candidate scored round(cos(qe, hub), 6), sorted (cs desc NULLS LAST,
  * hub id asc), beam = first `ef`. Scores are computed once per hub per
  * row (the composed form re-scored per hop — identical values, it's
  * deterministic); the zero-norm ANSI throw still fires exactly when a
  * degenerate hub/query is first scored.
  */
case class WalkProbes(child: Expression, hubs: Array[Array[Double]],
    nbrs: Array[Array[Int]], ef: Int, hops: Int,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
  extends UnaryExpression with CodegenFallback {

  require(hubs.nonEmpty && hubs.forall(_.length == hubs(0).length),
    "hubs must be non-empty and rectangular")
  require(nbrs.length == hubs.length, "one neighbor list per hub")
  // fail a malformed hub graph at CONSTRUCTION with a named error — an
  // out-of-range id would otherwise surface as a bare
  // ArrayIndexOutOfBoundsException inside executor-side eval (r19 advice)
  require(nbrs.forall(_.forall(n => n >= 0 && n < hubs.length)),
    s"every neighbor id must be in [0, ${hubs.length})")
  require(ef >= 1 && hops >= 0, "ef >= 1, hops >= 0")

  @transient private lazy val hnorm = CellScoreKernel.norms(hubs)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"walk_probes expects array<float>/array<double>, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    val x = CellScoreKernel.extract(v, isFloat, hubs(0).length)
    val xn = CellScoreKernel.xnormOf(x)
    val k = hubs.length
    val cached = new Array[java.lang.Double](k)
    val seen = new Array[Boolean](k)
    def score(h: Int): java.lang.Double = {
      if (!seen(h)) {
        cached(h) = CellScoreKernel.scoreOf(x, xn, hubs, hnorm, h, failOnError)
        seen(h) = true
      }
      cached(h)
    }
    var beam = Array(0)
    var hop = 0
    while (hop < hops) {
      val in = new Array[Boolean](k)
      beam.foreach { h => in(h) = true; nbrs(h).foreach(n => in(n) = true) }
      val cand = (0 until k).filter(in).toArray
      cand.foreach(score) // eager: the composed form scores EVERY candidate
      val kept = cand.sortWith { (a, b) =>
        (score(a), score(b)) match {
          case (null, null) => a < b
          case (null, _)    => false
          case (_, null)    => true
          case (sa, sb)     =>
            if (sa.doubleValue() != sb.doubleValue())
              sa.doubleValue() > sb.doubleValue()
            else a < b
        }
      }.take(ef)
      beam = kept
      hop += 1
    }
    new GenericArrayData(beam.map(i => i: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): WalkProbes =
    copy(child = newChild)
}

/** `nearestCell` as one codegen-friendly expression: INT cell id of the
  * max rounded cosine (ties → smaller id); never NULL (degenerate rows
  * land in cell 0, exactly like the composed struct-max). */
case class NearestCell(child: Expression, centers: Array[Array[Double]],
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
  extends UnaryExpression with CodegenFallback {

  require(centers.nonEmpty && centers.forall(_.length == centers(0).length),
    "centers must be non-empty and rectangular")

  @transient private lazy val cnorm = CellScoreKernel.norms(centers)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<float>/array<double>, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    CellScoreKernel.assign(v, isFloat, centers, cnorm, failOnError)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** `reverse(array_sort(scoredCells(v)))` as one codegen-friendly
  * expression: the full per-cell score list, descending. */
case class SortedScoredCells(child: Expression, centers: Array[Array[Double]],
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
  extends UnaryExpression with CodegenFallback {

  require(centers.nonEmpty && centers.forall(_.length == centers(0).length),
    "centers must be non-empty and rectangular")

  @transient private lazy val cnorm = CellScoreKernel.norms(centers)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cs", DoubleType, nullable = true),
      StructField("negcell", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_scored_cells expects array<float>/array<double>, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    CellScoreKernel.sortedScores(v, isFloat, centers, cnorm, failOnError)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedScoredCells =
    copy(child = newChild)
}
