package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MoneyAcc, MoneySum, MoneySumUnits}

/** The native exact-money SUM (r19): unit coverage for the accumulator's
  * 64→128-bit widening and the aggregate's SQL conventions, plus an
  * end-to-end Spark group-by against an exact BigDecimal recompute.
  */
class MoneySumSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("money-sum-spec").getOrCreate()

  test("accumulator widens to 128-bit exactly at long overflow, both add and merge") {
    val a = new MoneyAcc
    a.add(Long.MaxValue); a.add(Long.MaxValue); a.add(7L)
    assert(a.big != null)
    assert(a.total == java.math.BigInteger.valueOf(Long.MaxValue)
      .multiply(java.math.BigInteger.valueOf(2)).add(java.math.BigInteger.valueOf(7)))
    // merge: compact+compact (no overflow), compact+compact overflow, big+compact
    val b = new MoneyAcc; b.add(100L)
    val c = new MoneyAcc; c.add(5L)
    b.merge(c); assert(b.big == null && b.lo == 105L)
    val c2 = new MoneyAcc; c2.add(Long.MaxValue)
    b.merge(c2)
    assert(b.big != null && b.total ==
      java.math.BigInteger.valueOf(Long.MaxValue).add(java.math.BigInteger.valueOf(105)))
    val d = new MoneyAcc; d.add(Long.MaxValue)
    val e = new MoneyAcc; e.add(Long.MaxValue)
    d.merge(e)
    assert(d.big != null && d.total ==
      java.math.BigInteger.valueOf(Long.MaxValue).multiply(java.math.BigInteger.valueOf(2)))
    val f = new MoneyAcc; f.add(-3L)
    d.merge(f)
    assert(d.total == java.math.BigInteger.valueOf(Long.MaxValue)
      .multiply(java.math.BigInteger.valueOf(2)).subtract(java.math.BigInteger.valueOf(3)))
    // negative-direction overflow
    val g = new MoneyAcc; g.add(Long.MinValue); g.add(-1L)
    assert(g.big != null && g.total ==
      java.math.BigInteger.valueOf(Long.MinValue).subtract(java.math.BigInteger.ONE))
  }

  test("serde round-trips both compact and widened states, empty included") {
    val agg = MoneySumUnits(org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), 2)
    def rt(a: MoneyAcc): MoneyAcc = agg.deserialize(agg.serialize(a))
    val empty = rt(new MoneyAcc)
    assert(!empty.seen && agg.eval(empty) == null)
    val compact = new MoneyAcc; compact.add(-123456789L)
    assert(rt(compact).total == compact.total && rt(compact).seen)
    val wide = new MoneyAcc; wide.add(Long.MaxValue); wide.add(Long.MaxValue)
    assert(rt(wide).total == wide.total)
  }

  test("group-by sum matches an exact BigDecimal recompute; all-null group is NULL") {
    val s = spark
    import s.implicits._
    // 2-dp money doubles incl. the classic non-representable 0.1/0.2 shapes
    val rows = (1 to 4000).map { i =>
      val grp = i % 7
      val v = if (grp == 6) None else Some((i % 997) * 0.01 + (i % 13) * 10.0)
      (grp, v)
    }
    val df = rows.toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(MoneySum.sum(MoneySum.units($"v", 2), 2).cast("string").as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.flatMap(_._2)
      g -> (if (vs.isEmpty) None
            else Some(vs.map(v => BigDecimal(Math.round(v * 100), 2)).sum
              .setScale(2).toString))
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (g, w) => assert(got(g) == w, s"group $g") }
  }

  test("units recovers exact integer cents for either sign and rejects wide scales") {
    val s = spark
    import s.implicits._
    val vals = Seq(0.01, 0.05, 123.45, 99999.99, -0.01, -123.45, 0.0, 10.10)
    val got = vals.toDF("v").select(MoneySum.units($"v", 2).as("u"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 5L, 12345L, 9999999L, -1L, -12345L, 0L, 1010L))
    intercept[IllegalArgumentException](MoneySum.units($"v", 7))
  }
}
