package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FrequentItems
import graft.operators.Quality
import graft.plans.GraftExtensions

class FrequentItemsSpec extends AnyFunSuite {
  import TestSpark._

  test("q84 sketch is exact when cardinality is below k") {
    val got = Quality.q84HeavyHitters(spark, sf).collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est_count"), r.getAs[Long]("est_error")))
    val exact = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(got.length == exact.size)
    got.foreach { case (item, c, e) =>
      assert(e == 0L, s"no eviction possible below k, but $item has error $e")
      assert(c == exact(item), s"$item: sketch $c vs exact ${exact(item)}")
    }
  }

  test("SpaceSaving bounds hold on a high-cardinality column under distributed merge") {
    val k = 32
    val sketch = Tables.events(spark, sf)
      .repartition(8) // force multi-partition partial aggregation + merges
      .agg(FrequentItems.frequentItems(col("user_id"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"), col("e.est_error"))
      .collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est_count"), r.getAs[Long]("est_error")))
    val exact = Tables.events(spark, sf).groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id").toString -> r.getAs[Long]("count")).toMap
    val n = exact.values.sum
    assert(sketch.nonEmpty && sketch.length <= k)
    sketch.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"$item: est $est must overestimate truth $truth")
      assert(est - err <= truth, s"$item: est-err ${est - err} must not exceed truth $truth")
    }
    // every item with true frequency > n/k must surface
    val sketchItems = sketch.map(_._1).toSet
    exact.filter(_._2 > n / k).keys.foreach { hot =>
      assert(sketchItems.contains(hot), s"heavy hitter $hot (> n/k) missing")
    }
  }

  test("graft_frequent_items is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Tables.events(spark, sf).createOrReplaceTempView("ev_hh")
    val rows = spark.sql(
      """SELECT hh.item, hh.est_count FROM (
           SELECT explode(graft_frequent_items(event_type, 8)) AS hh FROM ev_hh)""").collect()
    val exact = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == math.min(8L, exact))
  }

  test("sketch serialization round-trips, including items beyond writeUTF's 64KB limit") {
    val fi = FrequentItems(org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), 4)
    val s = new graft.functions.SpaceSavingSketch(4)
    val huge = "é" * 70000 // 140KB in UTF-8 — would blow writeUTF
    (Seq("a", "a", "b", "c", huge, "e", "a") ++ Seq(huge)).foreach(s.add)
    val back = fi.deserialize(fi.serialize(s))
    assert(back.k == s.k && back.counters == s.counters)
  }

  test("graft_frequent_items rejects bad arguments with a named error and supports FILTER") {
    GraftExtensions.register(spark)
    Tables.events(spark, sf).createOrReplaceTempView("ev_hh2")
    val missing = intercept[Exception](
      spark.sql("SELECT graft_frequent_items(event_type) FROM ev_hh2").collect())
    assert(missing.getMessage.contains("graft_frequent_items"), missing.getMessage)
    val nonLiteral = intercept[Exception](
      spark.sql("SELECT graft_frequent_items(event_type, user_id) FROM ev_hh2").collect())
    assert(nonLiteral.getMessage.contains("graft_frequent_items"), nonLiteral.getMessage)
    // bare-AggregateFunction registration lets the analyzer attach FILTER
    val f = spark.sql(
      """SELECT hh.item, hh.est_count FROM (
           SELECT explode(graft_frequent_items(event_type, 8)
                          FILTER (WHERE value > 0)) AS hh FROM ev_hh2)""").collect()
    assert(f.nonEmpty)
  }
}
