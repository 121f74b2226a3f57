package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams"): at most
  * `k` counters; when a new item arrives at capacity it replaces the
  * minimum counter and inherits its count (the inherited amount is the
  * per-item overestimation error). Guarantees: est_count ≥ true count,
  * est_count − est_error ≤ true count, and every item with true frequency
  * > n/k is present. When the column's cardinality is ≤ k no eviction can
  * occur, so counts are EXACT with zero error — q84 exploits that to give
  * the sketch a plain GROUP BY SQL oracle.
  *
  * Merge follows Agarwal et al., "Mergeable Summaries": absent items
  * contribute the other side's minimum count as both count and error, then
  * the union is truncated back to the k largest.
  */
final class SpaceSavingSketch(val k: Int) extends Serializable {
  // item -> (estimated count, overestimation error)
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  private def minCount: Long =
    if (counters.isEmpty) 0L else counters.valuesIterator.map(_._1).min

  def add(item: String): Unit = counters.get(item) match {
    case Some((c, e)) => counters.update(item, (c + 1, e))
    case None if counters.size < k => counters.update(item, (1L, 0L))
    case None =>
      // O(k) min scan per eviction: fine for the k ≤ a few hundred this
      // sketch targets; a production variant would keep a min-heap
      val (mItem, (mCount, _)) = counters.minBy { case (i, (c, _)) => (c, i) }
      counters.remove(mItem)
      counters.update(item, (mCount + 1, mCount))
  }

  /** Mergeable-summaries union: truncate back to the k largest counts. */
  def merge(other: SpaceSavingSketch): SpaceSavingSketch = {
    val aMin = if (counters.size < k) 0L else minCount
    val bMin = if (other.counters.size < other.k) 0L else other.minCount
    val out = new SpaceSavingSketch(k)
    val keys = counters.keySet ++ other.counters.keySet
    val merged = keys.toSeq.map { item =>
      val (ac, ae) = counters.getOrElse(item, (aMin, aMin))
      val (bc, be) = other.counters.getOrElse(item, (bMin, bMin))
      item -> (ac + bc, ae + be)
    }
    merged.sortBy { case (i, (c, _)) => (-c, i) }.take(k).foreach { case (i, ce) =>
      out.counters.update(i, ce)
    }
    out
  }

  /** Counters sorted by (count desc, item asc) — a total, engine-portable
    * order. */
  def sorted: Seq[(String, Long, Long)] =
    counters.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }
}

object SpaceSavingSketch {
  /** Rebuild a sketch from externalized counters (e.g. streaming state
    * rehydration): the inverse of reading [[SpaceSavingSketch.sorted]].
    * Lives here, next to add/merge, so the size ≤ k invariant and any
    * future representation change stay inside the sketch.
    */
  def restore(k: Int, items: Array[String], counts: Array[Long],
              errors: Array[Long]): SpaceSavingSketch = {
    require(items.length == counts.length && items.length == errors.length,
      "parallel counter arrays must align")
    require(items.length <= k, s"${items.length} counters exceed capacity $k")
    val sk = new SpaceSavingSketch(k)
    items.indices.foreach { i =>
      sk.counters.update(items(i), (counts(i), errors(i)))
    }
    sk
  }
}

object FrequentItems {
  /** DataFrame-API entry: `agg(FrequentItems.frequentItems(col("x"), 64))`. */
  def frequentItems(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(FrequentItems(ColumnBridge.expression(c), k).toAggregateExpression())
  }
}

/** `graft_frequent_items(col, k)` — distributed top-k frequency sketch as a
  * native aggregate. Partial aggregation applies (each task keeps one
  * k-counter sketch, merges are sketch unions), so the shuffle carries k
  * counters per partition regardless of input size — the 100 TB shape for
  * "what are the dominant values" without a full groupBy of a
  * high-cardinality column.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): SpaceSavingSketch = new SpaceSavingSketch(k)

  override def update(b: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.toString)
    b
  }

  override def merge(b: SpaceSavingSketch, o: SpaceSavingSketch): SpaceSavingSketch =
    b.merge(o)

  override def eval(b: SpaceSavingSketch): Any =
    new GenericArrayData(b.sorted.map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    })

  override def serialize(b: SpaceSavingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.counters.size)
    b.counters.foreach { case (i, (c, e)) =>
      // length-prefixed raw UTF-8, not writeUTF: items over 64 KB (long
      // document texts) would blow writeUTF's 16-bit length field
      val ib = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(ib.length); out.write(ib)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new SpaceSavingSketch(in.readInt())
    (1 to in.readInt()).foreach { _ =>
      val ib = new Array[Byte](in.readInt())
      in.readFully(ib)
      val i = new String(ib, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      sketch.counters.update(i, (c, e))
    }
    sketch
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est_count", LongType),
    StructField("est_error", LongType))))

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}
