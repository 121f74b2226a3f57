package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k state: the k (rank, id) pairs with the smallest rank
  * seen so far, ties on rank broken by id so the result is a total order
  * (and therefore engine-portable and replay-stable). Insertion keeps a
  * sorted set of ≤ k entries; over capacity the maximum is evicted — the
  * classic bottom-k sample sketch, trivially mergeable (union + truncate).
  */
final class BottomKState(val k: Int) extends Serializable {
  val entries: mutable.TreeSet[(String, Long)] = mutable.TreeSet.empty

  def add(rank: String, id: Long): Unit = {
    val e = (rank, id)
    if (entries.size < k) entries.add(e)
    else if (implicitly[Ordering[(String, Long)]].lt(e, entries.last)) {
      entries.add(e)
      if (entries.size > k) entries.remove(entries.last)
    }
  }

  def merge(other: BottomKState): BottomKState = {
    other.entries.foreach { case (r, i) => add(r, i) }
    this
  }
}

object BottomKSample {
  /** DataFrame-API entry: `agg(BottomKSample.bottomK(rankCol, idCol, k))`. */
  def bottomK(rank: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      BottomKSample(ColumnBridge.expression(rank), ColumnBridge.expression(id), k)
        .toAggregateExpression())
  }
}

/** `graft_bottom_k(rank, id, k)` — deterministic per-group sample as a
  * native aggregate: the k ids with the smallest STRING rank (rank = a
  * hash of the id makes it a uniform pseudorandom-but-reproducible
  * sample; any totally-ordered string attribute — e.g. a zero-padded sort
  * key — makes it an exact bounded top-k). Input types are validated at
  * analysis: rank must be STRING (the buffer orders lexicographically —
  * a silently stringified numeric would sort '10' before '9') and id must
  * be BIGINT.
  *
  * The 100 TB shape for stratified sampling: the alternative
  * `row_number() OVER (PARTITION BY stratum ORDER BY hash)` sorts EVERY row
  * of every stratum through one exchange. This aggregate's buffer is O(k)
  * per group, partial aggregation bounds map-side state, and the shuffle
  * carries at most k entries per (partition, group) — input size never
  * appears in the memory or shuffle bound. NULL ranks/ids are skipped
  * (SQL aggregate convention, same as q84's FrequentItems).
  */
case class BottomKSample(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKState] with BinaryLike[Expression] {

  require(k > 0 && k <= 1000000, "k must be in [1, 1e6]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bottom_k expects (rank: string, id: bigint), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override def createAggregationBuffer(): BottomKState = new BottomKState(k)

  override def update(b: BottomKState, input: InternalRow): BottomKState = {
    val r = left.eval(input)
    val i = right.eval(input)
    if (r != null && i != null) b.add(r.toString, i.asInstanceOf[Long])
    b
  }

  override def merge(b: BottomKState, o: BottomKState): BottomKState = b.merge(o)

  /** Ids in rank order — the deterministic sample for this group. */
  override def eval(b: BottomKState): Any =
    new GenericArrayData(b.entries.toSeq.map(_._2))

  override def serialize(b: BottomKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.entries.size)
    b.entries.foreach { case (r, i) =>
      val rb = r.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(rb.length); out.write(rb)
      out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new BottomKState(in.readInt())
    (1 to in.readInt()).foreach { _ =>
      val rb = new Array[Byte](in.readInt())
      in.readFully(rb)
      val r = new String(rb, java.nio.charset.StandardCharsets.UTF_8)
      st.entries.add((r, in.readLong()))
    }
    st
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}
