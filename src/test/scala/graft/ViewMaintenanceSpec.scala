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
}
