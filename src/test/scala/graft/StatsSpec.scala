package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Events, RelationalExt, Stats}

class StatsSpec extends AnyFunSuite {
  import TestSpark._

  test("q87 pearson_r within [-1,1] and agrees with Spark's built-in corr to 1e-6") {
    val rows = Stats.q87Correlation(spark, sf).collect()
    assert(rows.nonEmpty)
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), round(col("l_extendedprice") * 100)).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      val pr = r.getAs[Double]("pearson_r")
      assert(pr >= -1.0 && pr <= 1.0, s"pearson_r out of range: $pr")
      // the exact-sufficient-statistics path must agree with the engine's
      // own (double-accumulating) corr to well past the rounding precision
      assert(math.abs(pr - builtin(flag)) < 1e-6, s"$flag: $pr vs ${builtin(flag)}")
      // slope and r must agree in sign (slope = r·σy/σx, σ > 0)
      assert(pr.sign == r.getAs[Double]("slope_cents_per_unit").sign)
    }
  }

  test("q89 contingency identities: totals reconcile and chi2 total is the term sum") {
    val rows = Stats.q89ChiSquare(spark, sf).collect()
    assert(rows.nonEmpty)
    val nObsTotal = rows.map(_.getAs[Long]("n_obs")).sum
    val nEvents = Tables.events(spark, sf).count()
    assert(nObsTotal == nEvents, "cells must partition the events table")
    val termSum = rows.map(_.getAs[Long]("term_micro")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("chi2_micro_total") == termSum)
      assert(r.getAs[Double]("expected_r") > 0.0)
      assert(r.getAs[Long]("term_micro") >= 0L)
    }
  }

  test("q91 KS statistic matches a brute-force CDF sweep per event type") {
    val got = Stats.q91KsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)
    // brute-force: collect (type, cents, weekend) and compute sup|F1-F2|
    val raw = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr("((unix_micros(ts) div 86400000000) + 4) % 7 IN (0, 6)").as("we"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    raw.groupBy(_._1).foreach { case (tpe, evs) =>
      val wd = evs.filter(!_._3).map(_._2).sorted
      val we = evs.filter(_._3).map(_._2).sorted
      val expected: Option[Long] =
        if (wd.isEmpty || we.isEmpty) None
        else Some(evs.map(_._2).distinct.map { v =>
          val c1 = wd.count(_ <= v).toLong
          val c2 = we.count(_ <= v).toLong
          math.abs(c1 * we.length - c2 * wd.length) * 10000L /
            (wd.length.toLong * we.length)
        }.max)
      val row = got(tpe)
      assert(row.getAs[Long]("n_weekday") == wd.length.toLong)
      assert(row.getAs[Long]("n_weekend") == we.length.toLong)
      assert(Option(row.getAs[Any]("ks_bp")).map(_.asInstanceOf[Long]) == expected,
        s"$tpe: ks_bp mismatch")
    }
  }

  test("q90 journeys partition the user base and paths cap at 5 segments") {
    val rows = Events.q90Paths(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    rows.foreach { r =>
      val segs = r.getString(0).split(">")
      assert(segs.length <= 5 && segs.forall(_.nonEmpty))
    }
    // spot-check one user's journey against a direct ordered read
    val uid = Tables.events(spark, sf).select("user_id").limit(1)
      .collect()(0).getLong(0)
    val want = Tables.events(spark, sf).filter(col("user_id") === uid)
      .orderBy(col("ts"), col("event_id")).select("event_type")
      .collect().take(5).map(_.getString(0)).mkString(">")
    val paths = Events.q90Paths(spark, sf) // path of that user must exist
    assert(paths.filter(col("path") === want).count() >= 1)
  }

  test("q88 unpivot: 3 rows per nation, totals reconcile with the joined fact table") {
    val df = RelationalExt.q88Unpivot(spark, sf).cache()
    // only nations that actually have suppliers appear in the wide table
    val nNations = Tables.supplier(spark, sf)
      .select("s_nationkey").distinct().count()
    assert(df.count() == nNations * 3)
    assert(df.select("flag").distinct().collect().map(_.getString(0)).sorted
      .sameElements(Array("A", "N", "R")))
    val unpivotTotal = df.agg(sum("revenue_cents")).collect()(0).getLong(0)
    val factTotal = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(unpivotTotal == factTotal)
    df.unpersist()
  }
}
