package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Events, RelationalExt, Stats, TextAnalysis}

class StatsSpec extends AnyFunSuite {
  import TestSpark._

  test("q270 dispersion equals an exact driver recompute; Poisson-ish vs planted bursty") {
    val got = Stats.q270ArrivalDispersion(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    // exact recompute from the raw events at sf
    val hrs = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val h0 = hrs.map(_._2).min
    val nHours = (hrs.map(_._2).max - h0) / 3600000L + 1
    hrs.groupBy(_._1).foreach { case (t, rows) =>
      val counts = rows.groupBy(_._2).map(_._2.size.toLong)
      val (s1, s2) = (counts.sum, counts.map(c => BigInt(c) * c).sum)
      val d = ((BigInt(nHours) * s2 - BigInt(s1) * s1) * 100 /
        (BigInt(nHours) * s1.max(1L))).toLong
      assert(got(t) == ((nHours, counts.size.toLong, s1, d, d > 200)), s"type $t drifted")
    }
    // planted parity: a metronome feed (one event every hour) must be
    // UNDER-dispersed (D ≈ 0); the same mass delivered in one burst-hour
    // per day must trip the gate
    import TestSpark.spark.implicits._
    val metronome = (0 until 240).map(i => ("tick", new java.sql.Timestamp(3600000L * i)))
    val bursty = (0 until 240).map(i => ("burst", new java.sql.Timestamp(86400000L * (i / 24))))
    val df = (metronome ++ bursty).toDF("event_type", "h")
      .select(col("event_type"), col("h").as("ts"), lit(0L).as("event_id"),
        lit(0L).as("user_id"), lit(0.0).as("value"), lit("").as("props"))
    val out = java.nio.file.Files.createTempDirectory("graft-disp").toString
    df.write.parquet(s"$out/events.parquet")
    val planted = Stats.q270ArrivalDispersion(spark, out).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(planted("tick")._1 < 100 && !planted("tick")._2,
      s"metronome must be under-dispersed: ${planted("tick")}")
    assert(planted("burst")._1 > 200 && planted("burst")._2,
      s"hour-burst feed must trip the gate: ${planted("burst")}")
  }

  test("q274 length KS equals a driver ECDF recompute; planted shifted feed trips, twin feed doesn't") {
    val lens = Tables.documents(spark, sf)
      .select(col("source"), size(graft.functions.Tokens(col("text"))).cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val t = lens.length.toLong
    val domain = lens.map(_._2).distinct.sorted
    val got = Stats.q274SourceLengthKs(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    lens.groupBy(_._1).foreach { case (src, rows) =>
      val mine = rows.map(_._2)
      val n = mine.size.toLong
      val d = domain.map { v =>
        val cs = mine.count(_ <= v).toLong
        val ca = lens.count(_._2 <= v).toLong
        math.abs(cs * (t - n) - (ca - cs) * n) * 10000 / (n * (t - n))
      }.max
      val crit = math.floor(13580 * math.sqrt((n + (t - n)).toDouble /
        (n.toDouble * (t - n)))).toLong
      assert(got(src) == ((n, t - n, d, crit, d > crit)), s"source $src drifted")
    }
    // planted: twin feeds A/B share a length distribution, C is shifted
    // far away and small enough that A-vs-rest stays under critical
    import TestSpark.spark.implicits._
    def doc(k: Int): String = Seq.fill(k)("w").mkString(" ")
    val planted =
      (0 until 30).map(i => (100L + i, doc(10 + i % 10), "en", "A", 1L)) ++
      (0 until 30).map(i => (200L + i, doc(10 + i % 10), "en", "B", 1L)) ++
      (0 until 3).map(i => (300L + i, doc(100 + i), "en", "C", 1L))
    val out = java.nio.file.Files.createTempDirectory("graft-ks").toString
    planted.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$out/documents.parquet")
    val p = Stats.q274SourceLengthKs(spark, out).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(!p("A") && !p("B"), s"twin feeds must not drift: $p")
    assert(p("C"), "the shifted feed must trip the KS gate")
  }

  test("q283 concentration equals a driver top-k recompute; invariants hold") {
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Stats.q283ValueConcentration(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    vals.groupBy(_._1).foreach { case (t, rows) =>
      val cs = rows.map(_._2).sortBy(-_)
      val n = cs.size.toLong
      val tot = cs.sum
      def share(p: Long) = {
        val k = ((n * p + 99) / 100).toInt
        cs.take(k).sum * 10000 / math.max(tot, 1L)
      }
      assert(got(t) == ((n, tot, share(1), share(10))), s"type $t drifted")
    }
    got.values.foreach { case (_, _, s1, s10) =>
      // top-10% mass dominates top-1% mass; both at least their uniform floor
      assert(s10 >= s1 && s1 >= 100 && s10 >= 1000 && s10 <= 10000)
    }
  }

  test("q294 customer concentration equals a driver top-k recompute") {
    val nat = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val names = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val rev = Tables.orders(spark, sf).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 100).toLong))
      .groupBy(_._1).toSeq
      .map { case (ck, os) => (names(nat(ck)), os.map(_._2).sum) }
    val want = rev.groupBy(_._1).map { case (n, cs0) =>
      val cs = cs0.map(_._2).toSeq.sortBy(-_)
      val tot = cs.sum
      def share(p: Long) =
        cs.take(((cs.size * p + 99) / 100).toInt).sum * 10000 / math.max(tot, 1L)
      n -> ((cs.size.toLong, tot, share(1), share(10)))
    }
    val got = Stats.q294CustomerConcentration(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == want)
  }

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

  test("q99 covariance matrix agrees with Spark's covar_pop/corr built-ins to 1e-6") {
    val rows = Stats.q99CovMatrix(spark, sf).collect()
    assert(rows.length == 6, "4 columns -> 6 unordered pairs")
    val cents = Map(
      "quantity" -> "CAST(l_quantity AS DOUBLE)",
      "price_cents" -> "round(l_extendedprice * 100)",
      "discount_pct" -> "round(l_discount * 100)",
      "tax_pct" -> "round(l_tax * 100)")
    // one reference pass: all six covar_pop/corr pairs in a single agg
    val pairList = rows.map(r => (r.getString(0), r.getString(1)))
    val refAggs = pairList.flatMap { case (a, b) =>
      Seq(covar_pop(expr(cents(a)), expr(cents(b))).as(s"c_${a}_$b"),
        corr(expr(cents(a)), expr(cents(b))).as(s"r_${a}_$b"))
    }
    val ref = Tables.lineitem(spark, sf).agg(refAggs.head, refAggs.tail: _*).head()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (refCov, refCorr) =
        (ref.getAs[Double](s"c_${a}_$b"), ref.getAs[Double](s"r_${a}_$b"))
      assert(math.abs(r.getAs[Double]("cov") - refCov) < 1e-4 *
        math.max(1.0, math.abs(refCov)), s"$a/$b cov")
      assert(math.abs(r.getAs[Double]("pearson_r") - refCorr) < 1e-6,
        s"$a/$b corr: ${r.getAs[Double]("pearson_r")} vs $refCorr")
      assert(r.getAs[Double]("pearson_r").abs <= 1.0)
    }
  }

  test("q104 A/B split partitions all users and z matches a direct recompute") {
    val row = Stats.q104AbTest(spark, sf).head()
    val (na, ca, nb, cb) = (row.getAs[Long]("n_a"), row.getAs[Long]("c_a"),
      row.getAs[Long]("n_b"), row.getAs[Long]("c_b"))
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(na + nb == nUsers, "variants must partition the user base")
    assert(ca <= na && cb <= nb && na > 0 && nb > 0)
    // the metric must not saturate, or z is undefined by construction
    assert(ca + cb > 0 && ca + cb < na + nb, "first-event metric must discriminate")
    val p = (ca + cb).toDouble / (na + nb)
    val want = BigDecimal(
      (ca.toDouble / na - cb.toDouble / nb) /
        math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("z") == want)
    assert(row.getAs[Long]("conv_a_bp") == ca * 10000 / na)
    assert(row.getAs[Long]("conv_b_bp") == cb * 10000 / nb)
  }

  test("q105 Gini matches a brute-force sorted computation and sits in [0,1)") {
    val row = Stats.q105Gini(spark, sf).head()
    val cents = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (c, k) }.map(_._2)
    val n = cents.length.toLong
    val t = cents.sum
    val s = cents.zipWithIndex.map { case (c, i) => BigInt(i + 1) * c }.sum
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Long]("total_cents") == t)
    val want = BigDecimal(2.0 * s.toDouble / (n.toDouble * t.toDouble)
      - (n.toDouble + 1.0) / n.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("gini") == want, s"${row.getAs[Double]("gini")} vs $want")
    assert(want >= 0.0 && want < 1.0)
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

  test("q93 top terms: <=3 ranked rows per doc, scores non-increasing, vocab df>=5") {
    val rows = TextAnalysis.q93TfidfTopTerms(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // every emitted word really appears in >=5 docs
    val vocab = rows.map(_.getAs[String]("word")).distinct.toSet
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(countDistinct("doc_id").as("df"))
      .filter(col("word").isin(vocab.toSeq: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.forall(w => df(w) >= 5L))
  }

  test("q103 systematic PPS sample: exact count, mega-docs always in, deterministic") {
    val got = TextAnalysis.q103WeightedSample(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("wt"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val wTotal = docs.map(_._2).sum
    val stride = math.max(1L, wTotal / 400L)
    // brute force the exact selected set: lay weights end to end in the
    // md5 order, select every doc whose interval contains a stride multiple
    var cum = 0L
    val expected = scala.collection.mutable.Set.empty[Long]
    docs.sortBy { case (id, _, h) => (h, id) }.foreach { case (id, w, _) =>
      if ((cum + w) / stride > cum / stride) expected += id
      cum += w
    }
    val selected = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selected == expected, "decomposed selection must equal the global walk")
    // pick numbers strictly increase across selected docs: all distinct
    assert(got.select("pick_no").distinct().count() == got.count())
    // any doc at least a stride wide MUST be selected (its interval
    // necessarily contains a multiple) — the PPS guarantee
    docs.foreach { case (id, w, _) =>
      if (w >= stride) assert(selected.contains(id), s"doc $id (w=$w) must be sampled")
    }
    val again = TextAnalysis.q103WeightedSample(spark, sf)
    assert(got.exceptAll(again).count() == 0 && again.exceptAll(got).count() == 0)
    got.unpersist()
  }

  test("q94 sample takes exactly min(20, stratum size) per language, deterministically") {
    val got = TextAnalysis.q94StratifiedSample(spark, sf).cache()
    val perLang = got.groupBy("lang").agg(count(lit(1)).as("k"),
      max("sample_rank").as("maxr")).collect()
    val strata = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { r =>
      val want = math.min(20L, strata(r.getString(0)))
      assert(r.getAs[Long]("k") == want && r.getAs[Int]("maxr").toLong == want)
    }
    // pure function of doc_id: a second run yields the identical sample
    val again = TextAnalysis.q94StratifiedSample(spark, sf)
    assert(got.exceptAll(again).count() == 0 && again.exceptAll(got).count() == 0)
    got.unpersist()
  }

  test("q95 z-scores match a brute-force trailing-window recompute") {
    val rows = Stats.q95VolumeAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    var checkedNonNull = 0
    rows.foreach { r =>
      val (tpe, day, x) = (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("n"))
      val window = byType(tpe).filter(d => d._2 >= day - 7 && d._2 <= day - 1)
      val (cnt, s1, s2) =
        (window.length.toLong, window.map(_._3).sum,
          window.map(d => d._3 * d._3).sum)
      assert(r.getAs[Long]("n_baseline_days") == cnt)
      val z = Option(r.getAs[Any]("z")).map(_.asInstanceOf[Double])
      if (cnt < 3 || cnt * s2 - s1 * s1 <= 0) assert(z.isEmpty)
      else {
        val want = BigDecimal((x * cnt - s1).toDouble /
          math.sqrt((cnt * s2 - s1 * s1).toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(z.contains(want), s"$tpe day=$day: ${z} vs $want")
        assert(r.getAs[Int]("is_anomaly") == (if (math.abs(want) > 2.0) 1 else 0))
        checkedNonNull += 1
      }
    }
    assert(checkedNonNull > 0, "need at least one scored row to prove the formula")
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

  test("equi-depth banding balances a distribution concentrated in one $10k slice") {
    val s = spark
    import s.implicits._
    // 10k rows, ALL inside cents band 0 of the former fixed-width scheme
    // (cents DIV 1000000 == 0): the old banding would put 100% of rows in
    // one window partition; the sketch boundaries must split them
    val n = 10000
    val df = s.range(n).select((col("id") * 97 % 999983).as("cents"))
    val nBands = 32
    val banded = graft.operators.Bands.withEquiDepthBand(df, "cents", nBands)
    assert(banded.select("band").distinct().count() >= nBands / 2,
      "concentrated data must still spread over many bands")
    val sizes = banded.groupBy("band").count().collect().map(_.getLong(1))
    assert(sizes.max <= 2L * n / nBands,
      s"largest band ${sizes.max} exceeds 2n/K = ${2L * n / nBands}")
    // monotone in the key: bands ordered by id are ordered by value range,
    // so band-then-key order is global order (the decomposition invariant)
    val ranges = banded.groupBy("band")
      .agg(min("cents").as("lo"), max("cents").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    for (Array((_, _, hi), (_, lo, _)) <- ranges.sliding(2).map(_.toArray))
      assert(hi <= lo, "band value ranges must not interleave")
    // ties never straddle a boundary: every distinct key maps to one band
    val multiBand = banded.groupBy("cents")
      .agg(countDistinct("band").as("nb")).filter(col("nb") > 1).count()
    assert(multiBand == 0)
  }

  test("q142 PSI: nonnegative, zero on identical populations, counts reconcile") {
    val dir = "/root/testdata/sf0.01"
    val rows = graft.operators.Stats.q142PsiDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    // every per-type PSI ≥ 0: each (p−q)·ln(p/q) term is nonnegative, and
    // per-term rounding keeps sign (|term| ≥ 0 rounds to ≥ 0)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"${r.getString(0)} psi ${r.getLong(3)} < 0")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
    // weekday+weekend totals reconcile with the raw event counts
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == Tables.events(spark, dir).count())
    // identical populations → PSI exactly 0: p == q for every bin makes
    // every term ln(1)·0 = 0 before rounding (pinned on the term
    // expression directly — q142 itself always reads the table)
    val term = spark.sql(
      "SELECT CAST(round((p - q) * ln(p / q) * 10000) AS BIGINT) AS t " +
      "FROM (SELECT CAST(0.2 AS DOUBLE) AS p, CAST(0.2 AS DOUBLE) AS q)").head()
    assert(term.getLong(0) == 0L)
  }

  test("post-epoch contract: every timestamp column is >= 1970-01-01") {
    // Epoch-day/dow bucketing across the library uses Spark's `div`
    // (truncate toward zero) where DuckDB's `//` floors; the two agree only
    // on nonnegative micros. Pin the data-side assumption the Tables
    // scaladoc documents: all generator timestamps are post-epoch.
    val minEvents = Tables.events(spark, sf)
      .agg(min(expr("unix_micros(ts)"))).head().getLong(0)
    assert(minEvents >= 0L, s"pre-epoch events.ts would break div-vs-floor oracle parity: $minEvents")
    val minOrders = Tables.orders(spark, sf)
      .agg(min(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))).head().getLong(0)
    assert(minOrders >= 0L, s"pre-epoch o_orderdate: $minOrders")
  }

  test("q171 Mann-Whitney: sufficient stats match a brute-force midrank recompute") {
    val row = Stats.q171RankTest(spark, sf).head()
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = ev.filter(_._1 == "click").map(_._2)
    val n1 = a.length.toLong
    val n2 = ev.length.toLong - n1
    val n = n1 + n2
    val tieSizes = ev.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    // doubled midrank of the tie group at v: 2*cumBefore + t + 1
    var cum = 0L
    val mid2 = tieSizes.keys.toSeq.sorted.map { v =>
      val t = tieSizes(v); val m = 2 * cum + t + 1; cum += t; v -> m
    }.toMap
    val u1x2 = a.map(mid2).sum - n1 * (n1 + 1)
    val tsum = tieSizes.values.map(t => t * t * t - t).sum
    val varU = (n1.toDouble * n2 / 12.0) *
      ((n + 1).toDouble - tsum.toDouble / (n.toDouble * (n - 1)))
    val z = (u1x2.toDouble - n1.toDouble * n2) / (2.0 * math.sqrt(varU))
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    assert(math.abs(row.getAs[Double]("z_score") - z) < 1e-3,
      s"z ${row.getAs[Double]("z_score")} vs $z")
    assert(row.getAs[Long]("auc_bp") ==
      math.round(10000.0 * u1x2 / (2.0 * n1 * n2)))
  }

  test("q172 CUSUM: running sum recomputed, telescoping to zero, argmax flagged") {
    val rows = Stats.q172Cusum(spark, sf).collect().sortBy(_.getAs[String]("day"))
    assert(rows.nonEmpty)
    val d = rows.length.toLong
    val tot = rows.map(_.getAs[Long]("n_events")).sum
    var c = 0L
    val want = rows.map { r => c += d * r.getAs[Long]("n_events") - tot; c }
    assert(rows.map(_.getAs[Long]("cusum_scaled")).toSeq == want.toSeq)
    // telescoping: sum of (D*n_i - T) over all days is D*T - D*T = 0
    assert(want.last == 0L, "terminal CUSUM must be zero")
    val mx = want.map(math.abs).max
    rows.zip(want).foreach { case (r, cu) =>
      assert(r.getAs[Boolean]("is_changepoint") == (math.abs(cu) == mx)) }
    assert(rows.count(_.getAs[Boolean]("is_changepoint")) >= 1)
  }

  test("q173 Benford: exact digit counts, canonical expected shares, dev reconciles") {
    val rows = Stats.q173Benford(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet == (1L to 9L).toSet)
    val cnts = Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c")).collect()
      .map(_.getLong(0)).filter(_ > 0).map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = cnts.values.sum
    // round(10^4 * log10(1 + 1/d)) for d = 1..9 — the published table
    val benford = Map(1L -> 3010L, 2L -> 1761L, 3L -> 1249L, 4L -> 969L,
      5L -> 792L, 6L -> 669L, 7L -> 580L, 8L -> 512L, 9L -> 458L)
    rows.foreach { r =>
      val dg = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n_items") == cnts.getOrElse(dg, 0L))
      assert(r.getAs[Long]("benford_bp") == benford(dg))
      assert(r.getAs[Long]("share_bp") ==
        math.round(10000.0 * cnts.getOrElse(dg, 0L) / n))
      assert(r.getAs[Long]("dev_bp") ==
        r.getAs[Long]("share_bp") - r.getAs[Long]("benford_bp"))
    }
  }

  test("q184 attribution: shares recomputed; positive shares bound to 10000 per day") {
    val rows = Stats.q184AnomalyAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = rows.map(r => (r.getString(1), r.getAs[Long]("day")) -> r.getAs[Long]("n_events")).toMap
    rows.foreach { r =>
      val (t, d) = (r.getString(1), r.getAs[Long]("day"))
      val window = (-7L to -1L).flatMap(off => daily.get((t, d + off)))
      if (window.size >= 3) {
        val base = math.round(1e6 * window.sum.toDouble / window.size)
        assert(r.getAs[Long]("baseline_micro") == base, s"$t/$d baseline")
        assert(r.getAs[Long]("excess_micro") == r.getAs[Long]("n_events") * 1000000L - base)
      } else {
        assert(r.isNullAt(r.fieldIndex("baseline_micro")), s"$t/$d thin baseline must be NULL")
        assert(r.isNullAt(r.fieldIndex("share_bp")), s"$t/$d thin baseline attributes nothing")
      }
    }
    // per day: floor-divided shares of positive excess sum to <= 10000
    // and recompute exactly
    rows.groupBy(_.getAs[Long]("day")).foreach { case (d, rs) =>
      val posTotal = rs.flatMap(r => Option(r.getAs[Any]("excess_micro")))
        .map(_.asInstanceOf[Long]).filter(_ > 0).sum
      val shares = rs.filter(!_.isNullAt(rs.head.fieldIndex("share_bp")))
        .map(_.getAs[Long]("share_bp"))
      if (posTotal > 0) {
        assert(shares.sum <= 10000, s"day $d shares ${shares.sum}")
        rs.foreach { r =>
          if (!r.isNullAt(r.fieldIndex("share_bp"))) {
            val pos = math.max(r.getAs[Long]("excess_micro"), 0L)
            assert(r.getAs[Long]("share_bp") == pos * 10000 / posTotal, s"day $d share")
          }
        }
      } else assert(shares.isEmpty, s"day $d no positive excess but shares emitted")
    }
  }

  test("q231 Mann-Kendall: driver recompute on the corpus; planted monotone/flat/noisy series verdict correctly") {
    // corpus: S, tie-corrected var18 and z recomputed driver-side
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val ref = daily.groupBy(_._1).map { case (et, rows) =>
      val ns = rows.sortBy(_._2).map(_._3)
      val nD = ns.length.toLong
      val sStat = (for (i <- ns.indices; j <- i + 1 until ns.length)
        yield java.lang.Long.signum(ns(j) - ns(i)).toLong).sum
      val tie18 = ns.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = nD * (nD - 1) * (2 * nD + 5) - tie18
      // HALF_UP like Spark's round (math.round is half-toward-+inf and
      // diverges on exact negative halves)
      val z = if (sStat == 0 || var18 <= 0) 0L
        else BigDecimal((sStat - sStat.sign) / math.sqrt(var18 / 18.0) * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      et -> ((nD, sStat, var18, z))
    }
    val got = Stats.q231TrendTest(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("s"), r.getAs[Long]("var18"), r.getAs[Long]("z_x1000")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // planted series: strictly increasing, strictly decreasing, constant
    // (all-ties: var18 = 0 -> z 0 -> none), and an alternating zig-zag
    // whose S telescopes near 0
    import TestSpark.spark.implicits._
    def series(et: String, vals: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      vals.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(_ => (et, java.sql.Timestamp.valueOf(
          f"2024-01-${d + 1}%02d 12:00:00")))
      }
    val planted =
      series("up", (1 to 30).map(i => i * 2)) ++
      series("down", (1 to 30).map(i => 62 - i * 2)) ++
      series("flat", Seq.fill(30)(7)) ++
      series("zig", (1 to 30).map(i => if (i % 2 == 0) 10 else 12)) ++
      series("oneday", Seq(5)) // a single observed day: no pairs exist
    val verdicts = Stats.trendTestOf(planted.toDF("event_type", "ts"))
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[String]("trend"), r.getAs[Long]("s"), r.getAs[Long]("var18")))).toMap
    assert(verdicts("up")._1 == "increasing", verdicts("up").toString)
    assert(verdicts("up")._2 == 30L * 29 / 2) // all pairs agree upward
    assert(verdicts("down")._1 == "decreasing", verdicts("down").toString)
    assert(verdicts("flat")._1 == "none" && verdicts("flat")._3 == 0L,
      verdicts("flat").toString)
    assert(verdicts("zig")._1 == "none", verdicts("zig").toString)
    // a newly-onboarded one-day feed must ROW with "none", not vanish
    // (the pairs frame has no row for it — the ties-side left join keeps it)
    assert(verdicts.contains("oneday"), verdicts.keySet.toString)
    assert(verdicts("oneday") == (("none", 0L, 0L)), verdicts("oneday").toString)
  }

  test("q234 ACF: driver recompute on the corpus; planted period-7 series echoes exactly; gaps pair honestly") {
    // corpus: num/den recomputed driver-side in BigInt off the daily counts
    val daily = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val dCount = daily.length.toLong
    val tTot = daily.map(_._2).sum
    val dev = daily.map { case (d, n) => d -> (BigInt(dCount) * n - tTot) }.toMap
    val den = dev.values.map(v => v * v).sum
    val got = Stats.q234Acf(spark, sf).collect()
      .map(r => r.getAs[Long]("lag") -> ((r.getAs[Long]("n_pairs"),
        Option(r.getAs[Any]("acf_bp")).map(_.asInstanceOf[Long])))).toMap
    assert(got.keySet == (1L to 14L).toSet)
    for (k <- 1L to 14L) {
      val pairs = dev.keys.filter(d => dev.contains(d + k)).toSeq
      val num = pairs.map(d => dev(d) * dev(d + k)).sum
      val ref =
        if (pairs.isEmpty || den <= 0) None
        else Some(BigDecimal(10000.0 * num.toDouble / den.toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(got(k) == ((pairs.length.toLong, ref)), s"lag $k: ${got(k)}")
    }
    // planted: counts (3,1,4,1,5,9,2) repeating for exactly 10 cycles —
    // dev is 7-periodic, so num_7 sums 9 of the 10 per-cycle dev² blocks
    // and num_14 sums 8: acf must be EXACTLY 9000 / 8000 bp
    import TestSpark.spark.implicits._
    // CONSECUTIVE epoch days (lag arithmetic joins on day + k, so the
    // calendar must not gap): base instant + d whole days
    def tsAt(d: Int): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T12:00:00Z").plusSeconds(86400L * d))
    val pat = Seq(3, 1, 4, 1, 5, 9, 2)
    val periodic = (0 until 70).flatMap(d =>
      (0 until pat(d % 7)).map(_ => tsAt(d)))
    val p = Stats.acfOf(spark, periodic.toDF("ts")).collect()
      .map(r => r.getAs[Long]("lag") -> ((r.getAs[Long]("n_pairs"),
        r.getAs[Long]("acf_bp")))).toMap
    assert(p(7L) == ((63L, 9000L)), p(7L).toString)
    assert(p(14L) == ((56L, 8000L)), p(14L).toString)
    assert((1L to 14L).forall(k => p(k)._1 == 70L - k))
    // gap-honesty: day 5 of 0..9 missing — lag-1 pairs only where BOTH
    // days exist (7 of 9), never a fabricated zero-count day
    val gappy = (0 to 9).filter(_ != 5).flatMap(d =>
      (0 to d).map(_ => tsAt(d)))
    val g = Stats.acfOf(spark, gappy.toDF("ts")).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n_pairs")).toMap
    assert(g(1L) == 7L, g.toString)
  }

  test("q235 Theil-Sen: driver recompute on the corpus; planted linear/outlier/one-day series") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = daily.groupBy(_._1).map { case (et, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- i + 1 until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)).sorted
      val m = slopes.length
      val med =
        if (m == 0) None
        else if (m % 2 == 1) Some(slopes(m / 2))
        else Some(slopes(m / 2 - 1) / 2 + slopes(m / 2) / 2)
      et -> ((pts.length.toLong, m.toLong,
        med.map(v => BigDecimal(v * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    }
    val got = Stats.q235TheilSen(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("n_pairs"),
        Option(r.getAs[Any]("slope_x1000")).map(_.asInstanceOf[Long])))).toMap
    // the engine's percentile interpolation vs the driver's may differ in
    // the last ulp before the x1000 round — allow ±1 on the rounded value
    assert(got.keySet == ref.keySet)
    got.foreach { case (et, (nd, np, sl)) =>
      val (rd, rp, rs) = ref(et)
      assert(nd == rd && np == rp, s"$et sizes")
      (sl, rs) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 1L, s"$et slope $a vs $b")
        case (a, b)             => assert(a == b, s"$et slope $a vs $b")
      }
    }
    // planted: exact line n=5+3d → every pairwise slope is exactly 3.0;
    // 3 spike days among 30 leave >50% of pairs at exactly 2.0 (the
    // robustness OLS lacks); a one-day feed rows with 0 pairs, NULL slope
    import TestSpark.spark.implicits._
    // consecutive epoch days — pairwise slopes divide by the DAY delta
    def series(et: String, counts: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(_ => (et, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T12:00:00Z")
            .plusSeconds(86400L * d))))
      }
    val planted =
      series("lin", (0 until 30).map(d => 5 + 3 * d)) ++
      series("outlier", (0 until 30).map(d =>
        if (Set(7, 15, 23)(d)) 500 else 10 + 2 * d)) ++
      series("oneday", Seq(4))
    val p = Stats.theilSenOf(planted.toDF("event_type", "ts")).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("n_pairs"),
        Option(r.getAs[Any]("slope_x1000")).map(_.asInstanceOf[Long])))).toMap
    assert(p("lin") == ((30L, 435L, Some(3000L))), p("lin").toString)
    assert(p("outlier") == ((30L, 435L, Some(2000L))), p("outlier").toString)
    assert(p("oneday") == ((1L, 0L, None)), p("oneday").toString)
  }

  test("q301 changepoint: driver brute-force recompute on the corpus; planted step/flat/one-day series") {
    // corpus: brute-force argmax over all splits, driver-side in BigInt
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def rnd(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ref = daily.groupBy(_._1).map { case (et, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val n = pts.length.toLong
      if (n < 2) et -> ((n, None: Option[(Long, Long, Long, Long, Option[Long])], "none"))
      else {
        val s = pts.map(_._2).sum
        val q = pts.map(p => BigInt(p._2) * p._2).sum
        val sst = BigInt(n) * q - BigInt(s) * s
        // argmax of A²/(n_l·n_r), tie → earliest split day (same double
        // scoring as both engines: exact ints → one IEEE division)
        val best = (1 until pts.length).map { i =>
          val (nl, nr) = (i.toLong, n - i)
          val sl = pts.take(i).map(_._2).sum
          val a = BigInt(nr) * sl - BigInt(nl) * (s - sl)
          val score = (a * a).toDouble / (BigInt(nl) * nr).toDouble
          (score, pts(i)._1, nl, sl, a)
        }.minBy { case (score, day, _, _, _) => (-score, day) }
        val (_, splitDay, nl, sl, a) = best
        val nr = n - nl; val sr = s - sl
        val r2 = if (sst > 0)
          Some(rnd(10000.0 * (a * a).toDouble / (BigInt(nl) * nr * sst).toDouble))
        else None
        val verdict = if (r2.exists(_ >= 2500L) && n >= 8) "shift" else "none"
        et -> ((n, Some((splitDay, nl,
          rnd(100.0 * sl.toDouble / nl.toDouble),
          rnd(100.0 * sr.toDouble / nr.toDouble), r2)), verdict))
      }
    }
    val got = Stats.q301Changepoint(spark, sf).collect().map { r =>
      val split = Option(r.getAs[Any]("split_day")).map(_.asInstanceOf[Long])
        .map(sd => (sd, r.getAs[Long]("left_days"),
          r.getAs[Long]("left_mean_x100"), r.getAs[Long]("right_mean_x100"),
          Option(r.getAs[Any]("r2_bp")).map(_.asInstanceOf[Long])))
      r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), split, r.getAs[String]("verdict")))
    }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // planted: a clean 10→50 step at day 13 localizes exactly with the
    // documented means; a flat series has zero total SS (NULL r2, none);
    // a one-day feed rows with NULL split columns (q231's lesson)
    import TestSpark.spark.implicits._
    def series(et: String, counts: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(_ => (et, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T12:00:00Z")
            .plusSeconds(86400L * d))))
      }
    val day0 = java.time.Instant.parse("2024-01-01T12:00:00Z")
      .getEpochSecond / 86400L
    val planted =
      series("step", Seq.fill(12)(10) ++ Seq.fill(8)(50)) ++
      series("flat", Seq.fill(10)(7)) ++
      series("oneday", Seq(5))
    val p = Stats.changepointOf(planted.toDF("event_type", "ts")).collect()
      .map { r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), Option(r.getAs[Any]("split_day")),
          Option(r.getAs[Any]("r2_bp")), r.getAs[String]("verdict"),
          Option(r.getAs[Any]("left_mean_x100")),
          Option(r.getAs[Any]("right_mean_x100")))) }.toMap
    assert(p("step") == ((20L, Some(day0 + 12L), Some(10000L), "shift",
      Some(1000L), Some(5000L))), p("step").toString)
    assert(p("flat") == ((10L, Some(day0 + 1L), None, "none",
      Some(700L), Some(700L))), p("flat").toString)
    assert(p("oneday") == ((1L, None, None, "none", None, None)),
      p("oneday").toString)
    // s28's fifth derivation is literally the same kernel off the daily
    // frame — streamed ≡ batch by construction, pinned here
    val dailyP = planted.toDF("event_type", "ts")
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val viaMonitor = graft.streaming.TrendMonitor.changepoint(dailyP)
      .collect().map(r => r.getAs[String]("event_type") -> r.toSeq).toMap
    val viaBatch = Stats.changepointOf(planted.toDF("event_type", "ts"))
      .collect().map(r => r.getAs[String]("event_type") -> r.toSeq).toMap
    assert(viaMonitor == viaBatch)
  }

  test("q307 segment mix drift: driver chi2 recompute; planted uniform months stay stable, a planted shift trips") {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    // corpus: recompute chi2/over/verdict with the SAME fixed-order
    // 5-term double sum the engines run
    val cells = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val months = cells.keys.map(_._1).toSeq.distinct
    def o(m: String, s0: String) = cells.getOrElse((m, s0), 0L)
    val tOf = months.map(m => m -> segs.map(o(m, _)).sum).toMap
    val cOf = segs.map(s0 => s0 -> months.map(o(_, s0)).sum).toMap
    val nn = tOf.values.sum
    def rnd(v: Double) = BigDecimal(v)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ref = months.map { m =>
      val t = tOf(m)
      // fixed literal order, one double division per term
      val chi2 = segs.map { s0 =>
        if (cOf(s0) == 0L) 0.0
        else {
          val num = BigInt(o(m, s0)) * nn - BigInt(t) * cOf(s0)
          (num.toDouble * num.toDouble) / (BigInt(nn) * t * cOf(s0)).toDouble
        }
      }.foldLeft(0.0)(_ + _)
      val devs = segs.map(s0 => s0 -> (BigInt(o(m, s0)) * nn - BigInt(t) * cOf(s0)))
      val over = devs.find { case (s0, d) =>
        devs.forall { case (o2, d2) => o2 == s0 || d >= d2 } }.get._1
      m -> ((t, rnd(1000 * chi2), over,
        if (rnd(1000 * chi2) >= 9488L) "shifted" else "stable"))
    }.toMap
    val got = Stats.q307SegmentMixDrift(spark, sf).collect()
      .map(r => r.getAs[String]("month") -> ((r.getAs[Long]("n_orders"),
        r.getAs[Long]("chi2_x1000"), r.getAs[String]("over_segment"),
        r.getAs[String]("verdict")))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (m, (t, chi, over, v)) =>
      val (rt, rchi, rover, rv) = ref(m)
      assert(t == rt && over == rover && v == rv, s"$m census")
      assert(math.abs(chi - rchi) <= 1L, s"$m chi2 $chi vs $rchi") // x1000 round ulp
    }
    // planted: ten pooled-mix months (200 orders, 40/segment) keep every
    // month stable even though the ELEVENTH month — all its BUILDING
    // mass moved to AUTOMOBILE — perturbs the pooled baseline; the
    // shifted month itself clears the df=4 bar (chi2 ≈ 66.7) and names
    // AUTOMOBILE as the excess
    val s0 = spark
    import s0.implicits._
    val customers = (1 to 100).map(i => (i.toLong, segs(i % 5)))
      .toDF("c_custkey", "c_mktsegment")
    def month(m: Int, picks: Seq[Int]) = picks.zipWithIndex.map {
      case (c, i) => ((m * 10000 + i).toLong, c.toLong,
        java.sql.Timestamp.valueOf(f"2024-$m%02d-10 00:00:00"))
    }
    val cyc = (1 to 200).map(i => ((i - 1) % 100) + 1)
    val uniform = (1 to 10).flatMap(m => month(m, cyc))
    // custkey % 5 == 1 is BUILDING; +4 lands on an AUTOMOBILE customer
    val shifted = month(11, cyc.map(c => if (c % 5 == 1) c + 4 else c))
    val orders = (uniform ++ shifted)
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .select(col("o_custkey"), col("o_orderdate"))
    val p = Stats.segmentMixDriftOf(orders, customers).collect()
      .map(r => r.getAs[String]("month") -> ((r.getAs[Long]("chi2_x1000"),
        r.getAs[String]("over_segment"), r.getAs[String]("verdict")))).toMap
    (1 to 10).foreach(m => assert(p(f"2024-$m%02d")._3 == "stable",
      s"month $m: ${p(f"2024-$m%02d")}"))
    assert(p("2024-11")._3 == "shifted" && p("2024-11")._2 == "AUTOMOBILE",
      p("2024-11").toString)
  }

  test("q307 closed-domain guard: a planted unknown segment fails loudly; the known-domain frame is unaffected") {
    val s0 = spark
    import s0.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-03-10 00:00:00")
    val known = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq((1L, ts), (2L, ts)).toDF("o_custkey", "o_orderdate")
    assert(Stats.segmentMixDriftOf(orders, known).count() == 1L)
    // one drifted dimension row: the fixed-order literal χ² would
    // silently exclude its orders from the month totals AND the pooled
    // mix — the guard turns that into an actionable failure
    val drifted = Seq((1L, "AUTOMOBILE"), (2L, "AEROSPACE"))
      .toDF("c_custkey", "c_mktsegment")
    val e = intercept[Exception] { // SparkException wrapping the task's
      Stats.segmentMixDriftOf(orders, drifted).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("outside the closed 5-segment domain") &&
      t.getMessage.contains("AEROSPACE")),
      chain(e).map(_.getMessage))
  }

  test("q245 Kruskal-Wallis dow: driver midrank recompute; planted weekly/flat/alternating series") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = daily.groupBy(_._1).map { case (et, rows) =>
      val obs = rows.map(r => ((r._2 + 4) % 7, r._3)) // (dow, value)
      val nD = obs.length.toLong
      val tieSizes = obs.map(_._2).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      var cum = 0L
      val mid2 = tieSizes.keys.toSeq.sorted.map { v =>
        val t = tieSizes(v); val m = 2 * cum + t + 1; cum += t; v -> m
      }.toMap
      val tsum = tieSizes.values.map(t => t * (t * t - 1)).sum
      val h =
        if (nD <= 1 || tsum.toDouble >= nD.toDouble * nD * nD - nD) None
        else {
          val terms = (0 until 7).map { d =>
            val g = obs.filter(_._1 == d)
            if (g.isEmpty) 0.0
            else {
              val r2 = g.map(o => mid2(o._2)).sum
              r2.toDouble * r2.toDouble / (4.0 * g.length)
            }
          }.sum
          Some((12.0 / (nD.toDouble * (nD.toDouble + 1.0)) * terms
            - 3.0 * (nD.toDouble + 1.0)) /
            (1.0 - tsum.toDouble / (nD.toDouble * nD * nD - nD)))
        }
      et -> ((nD, h.map(v => BigDecimal(v * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    }
    val got = Stats.q245KruskalDow(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        Option(r.getAs[Any]("h_x1000")).map(_.asInstanceOf[Long]),
        r.getAs[String]("dow_effect")))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (et, (nd, h, verdict)) =>
      val (rd, rh) = ref(et)
      assert(nd == rd, s"$et n_days")
      // the engines' fixed 7-term sum vs the driver's may differ in the
      // last ulp before the x1000 round
      (h, rh) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 1L, s"$et H $a vs $b")
        case (a, b)             => assert(a == b, s"$et H $a vs $b")
      }
      assert(verdict == (if (h.exists(_ >= 12592L)) "weekly" else "none"), et)
    }
    // planted: a hard 7-day pattern (two 50-count days per cycle, rest
    // 10) must verdict weekly; a constant feed has zero tie-corrected
    // variance (NULL H, none); a period-2 alternation spreads evenly
    // over the 7 dows (7 is odd) and must NOT fake a weekly effect
    import TestSpark.spark.implicits._
    def series(et: String, counts: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(_ => (et, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T12:00:00Z")
            .plusSeconds(86400L * d))))
      }
    val planted =
      series("weekly", (0 until 70).map(d => if (d % 7 <= 1) 50 else 10)) ++
      series("flat", Seq.fill(70)(7)) ++
      series("alt", (0 until 70).map(d => if (d % 2 == 0) 10 else 11))
    val p = Stats.kruskalDowOf(planted.toDF("event_type", "ts")).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((Option(r.getAs[Any]("h_x1000")).map(_.asInstanceOf[Long]),
          r.getAs[String]("dow_effect")))).toMap
    assert(p("weekly")._2 == "weekly", p("weekly").toString)
    assert(p("flat") == ((None, "none")), p("flat").toString)
    assert(p("alt")._2 == "none", p("alt").toString)
  }

  test("q237 calendar gaps: driver recompute on the corpus; planted outage/hiccup/one-day feeds") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = daily.groupBy(_._1).map { case (et, rows) =>
      val days = rows.map(_._2).sorted
      val span = days.last - days.head + 1
      val longest = if (days.length < 2) 0L
        else days.sliding(2).map(p => p(1) - p(0) - 1).max
      et -> ((days.length.toLong, days.head, days.last, span,
        span - days.length, longest, days.length * 10000L / span,
        rows.map(_._3).sum))
    }
    val got = Stats.q237CalendarGaps(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("first_day"), r.getAs[Long]("last_day"),
        r.getAs[Long]("span_days"), r.getAs[Long]("n_missing"),
        r.getAs[Long]("longest_gap"), r.getAs[Long]("coverage_bp"),
        r.getAs[Long]("n_events")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // planted: a 10-day feed missing days 3..7 (one 5-day outage), one
    // missing only day 4 (hiccup), and a single-day feed
    import TestSpark.spark.implicits._
    def tsAt(d: Int): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T12:00:00Z").plusSeconds(86400L * d))
    val planted =
      (0 to 9).filterNot(d => d >= 3 && d <= 7).map(d => ("down", tsAt(d))) ++
      (0 to 9).filterNot(_ == 4).map(d => ("hiccup", tsAt(d))) ++
      Seq(("oneday", tsAt(3)))
    val p = Stats.calendarGapsOf(planted.toDF("event_type", "ts")).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("span_days"), r.getAs[Long]("n_missing"),
        r.getAs[Long]("longest_gap"), r.getAs[Long]("coverage_bp")))).toMap
    assert(p("down") == ((5L, 10L, 5L, 5L, 5000L)), p("down").toString)
    assert(p("hiccup") == ((9L, 10L, 1L, 1L, 9000L)), p("hiccup").toString)
    assert(p("oneday") == ((1L, 1L, 0L, 0L, 10000L)), p("oneday").toString)
  }

  test("q238 seasonal strength: reconciles exactly with q181's decomposition; bounds hold") {
    import graft.operators.Analytics
    val dec = Analytics.q181StlDecompose(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("trend_micro"), r.getAs[Long]("residual_micro")))
    val ref = dec.groupBy(_._1).map { case (et, rows) =>
      val d = rows.map(r => BigInt(r._2 * 1000000L - r._3)) // detrended
      val rr = rows.map(r => BigInt(r._4))
      val n = BigInt(rows.length)
      val varD = n * d.map(x => x * x).sum - d.sum * d.sum
      val varR = n * rr.map(x => x * x).sum - rr.sum * rr.sum
      val strength =
        if (varD <= 0) None
        else Some(math.max(BigDecimal(10000.0 *
          (1.0 - varR.toDouble / varD.toDouble))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, 0L))
      et -> ((rows.length.toLong, strength))
    }
    val got = Analytics.q238SeasonalStrength(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        Option(r.getAs[Any]("strength_bp")).map(_.asInstanceOf[Long])))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // strength is a bounded bp; the weekday-patterned synthetic volumes
    // must show real (nonzero) seasonality for at least one type
    assert(got.values.forall(_._2.forall(v => v >= 0L && v <= 10000L)))
    assert(got.values.exists(_._2.exists(_ > 0L)))
  }
}
