package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalExt

class RelationalExtSpec extends AnyFunSuite {
  import TestSpark._

  test("q282 brand league: exact cents agree with the engine's double sums; shares account") {
    val rows = graft.operators.RelationalExt.q282BrandLeague(spark, sf).collect()
    assert(rows.length > 0)
    // integer-cents revenue must agree with Spark's own double aggregation
    // to well under a cent per line
    val dbl = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(expr("l_extendedprice * (1 - l_discount)")).as("net"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (b, gross, net) = (r.getString(0), r.getLong(3), r.getLong(4))
      assert(net <= gross, s"$b net over gross")
      assert(math.abs(net - dbl(b) * 100) <= r.getLong(1).toDouble,
        s"$b cents drifted: $net vs ${dbl(b) * 100}")
    }
    val shares = rows.map(_.getLong(5)).sum
    assert(shares > 10000 - rows.length && shares <= 10000,
      s"net shares must floor-account to 10000: $shares")
  }

  test("q291 single-source risk equals a driver census; exposure bounded by brand revenue") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 100).toLong))
    val brand = Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byPart = li.groupBy(_._1).map { case (p, rs) =>
      (brand(p), rs.map(_._2).distinct.size, rs.map(_._3).sum)
    }
    val want = byPart.groupBy(_._1).map { case (b, ps) =>
      val single = ps.filter(_._2 == 1)
      b -> ((ps.size.toLong, single.size.toLong, single.map(_._3).sum,
        single.size * 10000L / ps.size))
    }
    val got = graft.operators.RelationalExt.q291SingleSourceRisk(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == want)
  }

  test("q292 return rates equal a driver census; value weighting diverges sanely") {
    val rows = graft.operators.RelationalExt.q292ReturnRates(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getString(1) == "R",
        math.rint(r.getDouble(2) * 100).toLong))
    val want = li.groupBy(_._1).map { case (m, rs) =>
      val ret = rs.filter(_._2)
      (m, rs.size.toLong, ret.size.toLong, ret.size * 10000L / rs.size,
        ret.map(_._3).sum * 10000 / math.max(rs.map(_._3).sum, 1L))
    }.toSet
    assert(rows.toSet == want)
  }

  test("q46 HLL sketch is within 5% of exact cardinality") {
    // raw sketch vs exact (the published query folds this into a boolean)
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        count(lit(1)).as("exact"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
    // the published bound column is the same predicate, integer-exact
    val rows = RelationalExt.q46ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_within_5pct")))
  }

  test("q43 range bands cover every lineitem exactly once") {
    val banded = RelationalExt.q43RangeJoin(spark, sf)
      .agg(sum(col("n_items"))).head().getLong(0)
    assert(banded == Tables.lineitem(spark, sf).count())
  }

  test("q129 skyline is a strict staircase and matches a brute-force frontier walk") {
    val rows = RelationalExt.q129Skyline(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("cents"),
        r.getAs[Long]("day")))
    // in (cents desc, orderkey) order the days must strictly increase —
    // that IS the staircase frontier
    val walk = rows.sortBy { case (k, c, _) => (-c, k) }.map(_._3)
    assert(walk.zip(walk.tail).forall { case (a, b) => a < b })
    // brute force over the full table with the same dominance rule
    val all = Tables.orders(spark, sf).select(
      col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      expr("datediff(cast(o_orderdate as date), date'1970-01-01')")
        .cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (k, c, _) => (-c, k) }
    var best = Long.MinValue
    val expect = all.flatMap { case t @ (_, _, d) =>
      if (d > best) { best = d; Some(t) } else None
    }
    assert(rows.sortBy { case (k, c, _) => (-c, k) }.toSeq == expect.toSeq)
  }

  test("q297 idle capital equals a driver recompute; every segment rows") {
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val ordered = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0)).toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val (nPos, sumPos) = (pos.length.toLong, pos.sum)
    val idle = cust.filter(c => c._3 * nPos > sumPos && !ordered(c._1))
    val ref = cust.groupBy(_._2).map { case (seg, cs) =>
      val mine = idle.filter(_._2 == seg)
      seg -> ((cs.length.toLong, mine.length.toLong, mine.map(_._3).sum,
        mine.length.toLong * 10000 / cs.length))
    }
    val got = graft.operators.RelationalExt.q297IdleCapital(spark, sf).collect()
      .map(r => r.getAs[String]("segment") -> ((r.getAs[Long]("n_customers"),
        r.getAs[Long]("n_idle"), r.getAs[Long]("idle_cents"),
        r.getAs[Long]("idle_bp")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // the census contract: EVERY segment rows, zero-idle ones at 0
    assert(got.keySet == cust.map(_._2).toSet)
  }

  test("q303 discount bands equal a driver recompute; band-0 lift is exactly 100; masses conserve") {
    val raw = Tables.lineitem(spark, sf)
      .select(expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byBand = raw.groupBy(_._1)
    val (n0, q0) = byBand.get(0L).map(g => (g.length.toLong, g.map(_._2).sum))
      .getOrElse((0L, 0L))
    val totCents = raw.map(_._3).sum
    val ref = (0L to 10L).map { d =>
      val g = byBand.getOrElse(d, Array.empty[(Long, Long, Long)])
      val (n, q, c) = (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum)
      d -> ((n, q, c,
        if (n > 0) Some(q * 100 / n) else None,
        if (n > 0 && n0 > 0 && q0 > 0)
          Some((BigInt(q) * n0 * 100 / (BigInt(n) * q0)).toLong) else None,
        if (totCents > 0) Some(c * 10000 / totCents) else None))
    }.toMap
    val got = RelationalExt.q303DiscountBands(spark, sf).collect()
      .map { r =>
        def opt(n: String) = Option(r.getAs[Any](n)).map(_.asInstanceOf[Long])
        r.getAs[Long]("disc_pct") -> ((r.getAs[Long]("n_lines"),
          r.getAs[Long]("qty"), r.getAs[Long]("gross_cents"),
          opt("units_per_line_x100"), opt("lift_x100"), opt("rev_share_bp")))
      }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // contract pins: the 11-band grid always rows; the baseline band's
    // lift is 100 by definition; revenue shares floor-account to 10000;
    // unit and cents masses conserve vs the raw scan
    assert(got.keySet == (0L to 10L).toSet)
    assert(got(0L)._5.contains(100L))
    val shares = got.values.flatMap(_._6)
    assert(shares.sum <= 10000L && shares.sum > 10000L - 11)
    assert(got.values.map(_._2).sum == raw.map(_._2).sum)
    assert(got.values.map(_._3).sum == totCents)
  }

  test("q303 closed-domain guard: a planted 11%-discount row fails loudly; in-domain frames unaffected") {
    import spark.implicits._
    val inDomain = Seq((0.05, 10.0, 100.0), (0.00, 5.0, 50.0), (0.10, 2.0, 20.0))
      .toDF("l_discount", "l_quantity", "l_extendedprice")
    // the densified grid always rows all 11 bands for an in-domain frame
    assert(RelationalExt.discountBandsOf(spark, inDomain).count() == 11L)
    val outOfDomain = inDomain.union(
      Seq((0.11, 1.0, 10.0)).toDF("l_discount", "l_quantity", "l_extendedprice"))
    val e = intercept[Exception] { // SparkException wrapping the task's
      RelationalExt.discountBandsOf(spark, outOfDomain).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("outside the closed 0..10 domain") &&
      t.getMessage.contains("explicit-pivot-values")),
      chain(e).map(_.getMessage))
  }

}
