package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** q67's sketch accuracy, bounded against the exact q66 profile. */
class QualitySketchSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.01"

  test("sketch profile bounds: HLL within 5% of exact, median within 2%") {
    val sk = Quality.q67SketchProfile(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Quality.q66Profile(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (c <- Seq("l_quantity", "l_discount", "l_extendedprice")) {
      val (approx, p50) = sk(c)
      val ex = exact(c)
      val relErr = math.abs(approx - ex).toDouble / ex
      assert(relErr <= 0.05, s"$c HLL error $relErr (approx=$approx exact=$ex)")
      val exactP50 = Tables.lineitem(spark, dir)
        .select(expr(s"percentile($c, 0.5)").cast("double")).head().getDouble(0)
      assert(math.abs(p50 - exactP50) <= 0.02 * math.max(math.abs(exactP50), 1.0),
        s"$c p50 sketch=$p50 exact=$exactP50")
    }
  }

  test("sketch profile is one pass: a single aggregate, no Expand") {
    val plan = Quality.q67SketchProfile(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // exactly one shuffle: the partial->final aggregate exchange
    assert("Exchange".r.findAllIn(plan).length <= 2, plan)
  }
}
