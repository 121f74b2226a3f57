package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ViewMaintenance

/** Join-view IVM: maintained view ≡ full rebuild, term by term. */
class ViewMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  test("maintained join view equals the full rebuild under two-sided inserts") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    // split BOTH sides mid-keyspace: old rows are the bases, new rows the
    // deltas — the general two-sided-growth case (dA⋈dB is exercised
    // because matching new lineitems and new orders share keys)
    val cut = 700L
    val (baseA, dA) = (li.filter(col("l_orderkey") < cut), li.filter(col("l_orderkey") >= cut))
    val (baseB, dB) = (ord.filter(col("l_orderkey") < cut), ord.filter(col("l_orderkey") >= cut))
    assert(dA.count() > 0 && dB.count() > 0)
    val view = baseA.join(baseB, Seq("l_orderkey"))
    val maintained = ViewMaintenance.refresh(view, baseA, baseB, dA, dB, Seq("l_orderkey"))
    val rebuilt = li.join(ord, Seq("l_orderkey"))
    assert(maintained.exceptAll(rebuilt).count() == 0)
    assert(rebuilt.exceptAll(maintained).count() == 0)
    // and the delta really is delta-sized: every dV row involves a new key
    val dV = ViewMaintenance.joinDelta(baseA, baseB, dA, dB, Seq("l_orderkey"))
    assert(dV.filter(col("l_orderkey") < cut).count() == 0)
  }

  test("one-sided delta reduces to dA join B") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val (baseA, dA) = (li.filter(col("l_orderkey") % 2 === 0), li.filter(col("l_orderkey") % 2 === 1))
    val empty = dA.limit(0)
    val dV = ViewMaintenance.joinDelta(baseA, ord, dA, empty.select(col("l_orderkey"),
      lit("X").as("o_orderstatus")).limit(0), Seq("l_orderkey"))
    val direct = dA.join(ord, Seq("l_orderkey"))
    assert(dV.exceptAll(direct).count() == 0 && direct.exceptAll(dV).count() == 0)
  }

  test("counting IVM: deletes retract join outputs; maintained == rebuilt on mixed deltas") {
    import spark.implicits._
    def cons(df: org.apache.spark.sql.DataFrame) = ViewMaintenance.consolidate(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getAs[Long]("mult")))
      .toSet
    val baseA = Seq((1L, "a1", 1L), (2L, "a2", 1L), (3L, "a3", 1L), (3L, "a3", 1L))
      .toDF("k", "av", "mult") // note: k=3 carries multiplicity 2 (two +1 rows)
    val baseB = Seq((1L, "b1", 1L), (2L, "b2", 1L), (3L, "b3", 1L))
      .toDF("k", "bv", "mult")
    val view = ViewMaintenance.consolidate(
      baseA.withColumnRenamed("mult", "mult_l")
        .join(baseB.withColumnRenamed("mult", "mult_r"), Seq("k"))
        .withColumn("mult", col("mult_l") * col("mult_r"))
        .drop("mult_l", "mult_r"))
    // mixed delta: delete k=1 from A (retracts its join row), insert k=4
    // on both sides (joins only via the dA x dB term), delete ONE of the
    // two k=3 A-copies (the view row nets 2 -> 1, not to zero)
    val dA = Seq((1L, "a1", -1L), (4L, "a4", 1L), (3L, "a3", -1L)).toDF("k", "av", "mult")
    val dB = Seq((4L, "b4", 1L)).toDF("k", "bv", "mult")
    val maintained = cons(ViewMaintenance.refreshCounting(
      view, baseA, baseB, dA, dB, Seq("k")))
    val rebuilt = cons(
      baseA.unionByName(dA).withColumnRenamed("mult", "mult_l")
        .join(baseB.unionByName(dB).withColumnRenamed("mult", "mult_r"), Seq("k"))
        .withColumn("mult", col("mult_l") * col("mult_r"))
        .drop("mult_l", "mult_r"))
    assert(maintained == rebuilt)
    // the specific semantics the counting form exists for:
    assert(!maintained.exists(_._1 == 1L), "deleted row's join output must retract")
    assert(maintained.exists(r => r._1 == 4L && r._4 == 1L), "dA x dB insert joins")
    assert(maintained.exists(r => r._1 == 3L && r._4 == 1L),
      "partial retraction nets 2 -> 1, not to zero")
  }
}
