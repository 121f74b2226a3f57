package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalExt

class RelationalExtSpec extends AnyFunSuite {
  import TestSpark._

  test("q46 HLL sketch is within 5% of exact cardinality") {
    val rows = RelationalExt.q46ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("q43 range bands cover every lineitem exactly once") {
    val banded = RelationalExt.q43RangeJoin(spark, sf)
      .agg(sum(col("n_items"))).head().getLong(0)
    assert(banded == Tables.lineitem(spark, sf).count())
  }
}
