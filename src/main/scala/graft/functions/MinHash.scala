package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

object MinHash {
  /** DataFrame-API entry: `agg(MinHash.minhash(col("g"), 128))`. */
  def minhash(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  }
}

/** `graft_minhash(col, k)` — the k-permutation minhash signature as ONE
  * native aggregate: a fixed long[k] buffer updated with k seeded xxhash64
  * evaluations per row, merged elementwise. Replaces the k-separate-
  * `min(xxhash64(lit(i), col))` composition (q124's original form): one
  * aggregate expression instead of k, one buffer instead of k min states,
  * and the per-row inner loop hashes the value's bytes k times without
  * re-evaluating the child or boxing k aggregation buffers.
  *
  * Value-compatible BY CONSTRUCTION with the composed form: Spark's
  * `xxhash64(lit(i), col)` folds seed 42 → int i → the string, and the
  * update below calls the very same interpreted kernel
  * ([[XxHash64Function]]) with the identical fold — the equality is
  * asserted bit-for-bit in MinHashSpec, so either form can verify the
  * other. Signature semantics (and the Jaccard estimator built on
  * agreement counts) follow Broder, "On the resemblance and containment
  * of documents" (1997).
  *
  * Scale shape: partial aggregation applies — each task carries one
  * long[k] buffer per group, the shuffle moves k longs per group
  * regardless of input size, and merge is an elementwise min (a
  * commutative monoid, so any merge tree yields the same signature).
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  // the per-permutation seeds: xxhash64's fold of (seed=42, int i) — the
  // prefix of what xxhash64(lit(i), col) computes, shared across all rows
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // dispatch on the child's type, exactly like the composed
    // xxhash64(lit(i), col) does — strings hash their bytes, longs the
    // value. A NULL child is NOT skipped: Spark's hash expressions fold a
    // null by leaving the accumulator unchanged, i.e. the row contributes
    // seeds(i) itself — skipping nulls here would silently break the
    // bit-equality contract on nullable columns (and leave the MaxValue
    // sentinel in all-null groups)
    var i = 0
    while (i < k) {
      val h = if (v == null) seeds(i)
        else XxHash64Function.hash(v, child.dataType, seeds(i))
      if (h < b(i)) b(i) = h
      i += 1
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (o(i) < b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
