package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{floor, lit}
import org.apache.spark.sql.types._

/** Exact integer-units accumulator for money sums.
  *
  * Invariant: the running total is `lo` while `big == null`, else `big`
  * (with `lo` reset to 0 at the moment of widening). The long fast path
  * is branch-predictable overflow-checked addition — no BigDecimal, no
  * allocation per row; the 128-bit path only ever engages when a partial
  * actually crosses ±2⁶³ (at 10⁻⁴-dollar units that is ~9 × 10¹⁴
  * dollars PER PARTITION — unreachable at any test SF, reachable only
  * in a pathological 100 TB skew, where correctness still holds).
  */
final class MoneyAcc extends Serializable {
  var seen: Boolean = false
  var lo: Long = 0L
  var big: BigInteger = _

  def add(v: Long): Unit = {
    seen = true
    if (big == null) {
      val r = lo + v
      if (((lo ^ r) & (v ^ r)) < 0L) { // signed-overflow test (Hacker's Delight 2-13)
        big = BigInteger.valueOf(lo).add(BigInteger.valueOf(v))
        lo = 0L
      } else lo = r
    } else big = big.add(BigInteger.valueOf(v))
  }

  def merge(o: MoneyAcc): Unit = if (o.seen) {
    if (o.big != null) {
      seen = true
      if (big == null) { big = BigInteger.valueOf(lo); lo = 0L }
      big = big.add(o.big)
    } else add(o.lo)
  }

  def total: BigInteger = if (big == null) BigInteger.valueOf(lo) else big
}

object MoneySum {

  /** Recover the exact scaled-integer units of a k-decimal-digit money
    * double: `floor(c * 10ᵏ + 0.5)` (Spark `floor(double)` → BIGINT,
    * whole-stage codegen, zero BigDecimal per row).
    *
    * Exactness: the stored double d is the nearest double to the true
    * value m/10ᵏ, so |d·10ᵏ − m| ≤ 10ᵏ·ulp(d)/2 + rounding ≈ 10⁻⁹ for
    * money magnitudes (≤ 10⁷ units) — never within 0.499… of the ±0.5
    * boundary, and since m is an integer the true scaled value is never
    * itself on a half boundary, so floor(x+0.5) lands on m for EITHER
    * sign. Equivalent to `cast(d AS DECIMAL(p,k))·10ᵏ` (what the DuckDB
    * oracle computes) on this domain.
    */
  def units(c: Column, decimals: Int): Column = {
    require(decimals >= 0 && decimals <= 6, "units supports 0..6 decimal digits")
    var f = 1.0d
    (1 to decimals).foreach(_ => f *= 10.0d)
    floor(c * lit(f) + lit(0.5d))
  }

  /** Exact sum of long units as DECIMAL(38, outScale) — the native
    * replacement for `sum(cast(double AS DECIMAL(p,s)) …)` whose > 18-digit
    * sum buffer pays a 128-bit BigDecimal add per row (the r18
    * money-exactness fold's measured 1.5–2.7× tax on q01/q04/q09/q43).
    * Per-partition partials stay in one overflow-checked 64-bit register;
    * 128-bit arithmetic engages only at actual overflow (see [[MoneyAcc]]).
    * Distributive, so partial aggregation (map-side combine) applies and
    * the shuffle carries ≤ one 9-byte state per (partition, group).
    */
  def sum(unitsCol: Column, outScale: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      MoneySumUnits(ColumnBridge.expression(unitsCol), outScale).toAggregateExpression())
  }
}

/** `graft_money_sum(units, scale)` — order-independent EXACT sum of scaled
  * integer money units, evaluating to DECIMAL(38, scale). NULL inputs are
  * skipped and an empty/all-NULL group evaluates to NULL (SQL SUM
  * convention, matching the DuckDB oracle's `sum(decimal)`).
  */
case class MoneySumUnits(
    child: Expression,
    outScale: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MoneyAcc] with UnaryLike[Expression] {

  require(outScale >= 0 && outScale <= 9, "outScale must be in [0, 9]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_money_sum expects units: bigint, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MoneyAcc = new MoneyAcc

  override def update(b: MoneyAcc, input: InternalRow): MoneyAcc = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MoneyAcc, o: MoneyAcc): MoneyAcc = { b.merge(o); b }

  override def eval(b: MoneyAcc): Any =
    if (!b.seen) null
    else Decimal(BigDecimal(new java.math.BigDecimal(b.total, outScale)), 38, outScale)

  override def serialize(b: MoneyAcc): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.seen)
    if (b.big == null) { out.writeByte(0); out.writeLong(b.lo) }
    else { val ba = b.big.toByteArray; out.writeByte(1); out.writeInt(ba.length); out.write(ba) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MoneyAcc = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MoneyAcc
    b.seen = in.readBoolean()
    if (in.readByte() == 0) b.lo = in.readLong()
    else { val ba = new Array[Byte](in.readInt()); in.readFully(ba); b.big = new BigInteger(ba) }
    b
  }

  override def dataType: DataType = DecimalType(38, outScale)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(offset: Int): MoneySumUnits =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MoneySumUnits =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MoneySumUnits =
    copy(child = newChild)
}
