package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object Gramian {
  /** DataFrame-API entry: `agg(Gramian.gramian(col("embedding")))`. */
  def gramian(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(GramianAgg(ColumnBridge.expression(c)).toAggregateExpression())
  }
}

/** Mutable Gramian state: count, per-dimension sums, and the upper
  * triangle of Σx·xᵀ flattened row-major ((i,j≥i) ↦ i·d − i(i−1)/2 + j−i).
  * `d` is discovered from the first vector (0 = untouched buffer).
  */
final class GramianBuf(var n: Long, var d: Int,
                       var sx: Array[Double], var sp: Array[Double])

/** `graft_gramian(vec)` — the PCA/covariance sufficient statistics
  * (n, Σx, upper-triangle Σx·xᵀ) as ONE native aggregate over an
  * `array<float>` column: a single double[d(d+1)/2 + d] buffer per
  * group, one pass over each vector, merged by elementwise addition.
  * This is the larger-d path promised beside q158's pair-explode form:
  * the explode materializes d(d+1)/2 rows PER INPUT ROW before its
  * map-side combine, while this buffer touches each input once and the
  * shuffle moves one buffer per partition regardless of d or row count.
  *
  * Null and zero-length vectors are skipped (they carry no coordinates — unlike
  * MinHashAgg's hash contract there is no composed-form bit-equality to
  * preserve, and the explode form drops them identically since
  * `explode(flatten(transform(...)))` of NULL emits nothing). A
  * dimension mismatch mid-stream throws — silently truncating would
  * corrupt the covariance.
  *
  * Determinism note: double addition is order-sensitive, so distinct
  * merge trees can differ in final ULPs — consumers that pin exact refit
  * equality (trainPca) snap the derived statistics (1e-9), the same rule
  * the explode form's shuffle already required.
  */
case class GramianAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // analysis-time rejection (the CosineSimilarity rule): without it
        // the float-width reads below would silently misread an
        // array<double>'s unsafe layout instead of erroring
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gramian expects array<float>/array<double>, got ${other.sql}")
    }

  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): GramianBuf =
    new GramianBuf(0L, 0, Array.empty, Array.empty)

  private def init(b: GramianBuf, d: Int): Unit = {
    b.d = d
    b.sx = new Array[Double](d)
    b.sp = new Array[Double](d * (d + 1) / 2)
  }

  override def update(b: GramianBuf, input: InternalRow): GramianBuf = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    // zero-length vectors carry no coordinates — skipped exactly like
    // nulls (counting them would make n depend on whether the empty row
    // shared a partition with a real vector or hit merge()'s d==0 drop)
    if (d == 0) return b
    if (b.d == 0) init(b, d)
    require(b.d == d, s"graft_gramian: dimension mismatch ($d vs ${b.d})")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      x(i) = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    b.n += 1
    var idx = 0
    i = 0
    while (i < d) {
      b.sx(i) += x(i)
      var j = i
      while (j < d) { b.sp(idx) += x(i) * x(j); idx += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(b: GramianBuf, o: GramianBuf): GramianBuf = {
    // d == 0 means the partial saw only null/empty vectors, so n == 0 by
    // the update() skip rule — dropping it loses nothing
    if (o.d == 0) return b
    if (b.d == 0) { init(b, o.d); }
    require(b.d == o.d, s"graft_gramian: dimension mismatch in merge (${o.d} vs ${b.d})")
    b.n += o.n
    var i = 0
    while (i < b.sx.length) { b.sx(i) += o.sx(i); i += 1 }
    i = 0
    while (i < b.sp.length) { b.sp(i) += o.sp(i); i += 1 }
    b
  }

  override def eval(b: GramianBuf): Any =
    new GenericInternalRow(Array[Any](b.n,
      new GenericArrayData(b.sx), new GenericArrayData(b.sp)))

  override def serialize(b: GramianBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n); out.writeInt(b.d)
    b.sx.foreach(out.writeDouble); b.sp.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramianBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong(); val d = in.readInt()
    val sx = Array.fill(d)(in.readDouble())
    val sp = Array.fill(d * (d + 1) / 2)(in.readDouble())
    new GramianBuf(n, d, sx, sp)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("sp", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): GramianAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramianAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): GramianAgg =
    copy(child = newChild)
}
