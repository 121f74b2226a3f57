package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** PII redaction behavior on synthetic PII (the corpus itself is PII-free,
  * so q57's oracle exercises the no-op path; the rewrites are proven here).
  */
class PrivacySpec extends AnyFunSuite {
  import TestSpark._

  test("q57 redacts emails, phones and SSN-shaped ids from free text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact john.doe+spam@example.com or jane@sub.example.org today"),
      (2L, "call 555-123-4567 or +44 020.555.1234 x9"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "mixed: a@b.io, 987-654-3210, 999-88-7777"),
      (5L, "clean text with numbers 12345 and dots a.b"))
      .toDF("doc_id", "text")
    val out = docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(Privacy.EmailRe)).as("n_emails"),
      regexp_count(col("text"), lit(Privacy.PhoneRe)).as("n_phones"),
      regexp_count(col("text"), lit(Privacy.SsnRe)).as("n_ids"),
      Privacy.redactText(col("text")).as("redacted"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap

    assert(out(1L) == ((2, 0, 0, "contact <EMAIL> or <EMAIL> today")))
    assert(out(2L)._2 == 2)
    assert(out(2L)._4 == "call <PHONE> or +44 <PHONE> x9")
    assert(out(3L) == ((0, 0, 1, "ssn <ID> on file")))
    assert(out(4L) == ((1, 1, 1, "mixed: <EMAIL>, <PHONE>, <ID>")))
    assert(out(5L) == ((0, 0, 0, "clean text with numbers 12345 and dots a.b")))
  }

  test("q57 over the corpus: PII-free input passes through unchanged") {
    val out = operators.Privacy.q57PiiRedact(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("n_emails") + col("n_phones") + col("n_ids") =!= 0).count() == 0)
    val changed = out.join(Tables.documents(spark, sf), "doc_id")
      .filter(col("redacted_text") =!= col("text")).count()
    assert(changed == 0)
  }

  test("q148 DP counts: deterministic, clamped, Laplace-tail-bounded, non-degenerate") {
    val a = operators.Privacy.q148DpCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = operators.Privacy.q148DpCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "seeded release must be reproducible")
    assert(a.nonEmpty && a.values.forall(_ >= 0L), "counts clamp at zero")
    val truth = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"), expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a.keySet == truth.keySet)
    // Laplace(1) tail: P(|noise| > 20) = e^-20 ≈ 2e-9 — a violated bound
    // means the inverse-CDF or the uniform draw is broken, not bad luck
    val diffs = a.map { case (k, noisy) => math.abs(noisy - truth(k)) }
    assert(diffs.forall(_ <= 20L), s"noise out of tail bound: ${diffs.max}")
    // and the mechanism actually perturbs: not every cell can be exact
    assert(diffs.exists(_ > 0L), "all cells unperturbed — noise is not applied")
  }

  test("q160 l-diversity: publish gate recomputed from raw events; both verdicts occur") {
    val got = graft.operators.Privacy.q160LDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_sens_bands"),
          r.getAs[Boolean]("publish")))).toMap
    val want = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(CAST(ts AS DATE) AS STRING)").as("day"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 5000").as("band"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, g) =>
        k -> ((g.size.toLong, g.map(_._3).distinct.size.toLong,
          g.size >= 10 && g.map(_._3).distinct.size >= 4))
      }
    assert(got == want)
    // the audit must discriminate on this data: a report that publishes
    // everything (or nothing) would vacuously pass the recomputation
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "publish gate does not split the cells")
  }

  test("q170 t-closeness: EMD recomputed from raw events; gate is the exact cross-multiply") {
    val rows = Privacy.q170TCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select(col("event_type"),
        to_date(col("ts")).cast("string").as("day"),
        expr("least(greatest(CAST(round(value*100) AS BIGINT) DIV 5000, 0), 4)").as("band"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val byCell = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val globCnt = ev.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTot = ev.length.toLong
    assert(rows.length == byCell.size, "one row per (type, day) cell")
    rows.foreach { r =>
      val key = (r.getString(0), r.getAs[String]("day"))
      val cell = byCell(key)
      val n = cell.length.toLong
      assert(r.getAs[Long]("n_events") == n)
      val cellCnt = cell.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var cum = BigInt(0); var sumAbs = BigInt(0)
      (0L to 3L).foreach { b =>
        cum += BigInt(cellCnt.getOrElse(b, 0L)) * nTot - BigInt(globCnt.getOrElse(b, 0L)) * n
        sumAbs += cum.abs
      }
      assert(r.getAs[Long]("emd_bp") ==
        math.round(10000.0 * sumAbs.toDouble / (n.toDouble * nTot * 4.0)), s"$key emd")
      assert(r.getAs[Boolean]("t_close") == (sumAbs <= BigInt(n) * BigInt(nTot)), s"$key gate")
    }
  }

  test("q185 DP means: deterministic, tail-bounded noise, mechanism non-degenerate") {
    val a = Privacy.q185DpMeans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getAs[Long]("n_noisy"),
        r.getAs[Long]("sum_noisy_cents"), r.getAs[Long]("mean_cents")))).toMap
    val b = Privacy.q185DpMeans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getAs[Long]("n_noisy"),
        r.getAs[Long]("sum_noisy_cents"), r.getAs[Long]("mean_cents")))).toMap
    assert(a == b, "seeded release must be reproducible")
    // user-level truth: per-user cell contributions clamped BEFORE the
    // cell aggregation; the count counts users (the adjacency unit)
    val truth = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("CAST(month(CAST(ts AS DATE)) AS BIGINT)").as("mo"),
        col("user_id"))
      .agg(sum(expr("greatest(CAST(round(value * 100) AS BIGINT), 0)")).as("uc"))
      .groupBy(col("event_type"), col("mo"))
      .agg(count(lit(1)).as("n"), sum(expr("least(uc, 50000)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(a.keySet == truth.keySet)
    a.foreach { case (k, (nN, sN, mean)) =>
      val (n, sum) = truth(k)
      // Laplace tail: |noise| > 20*scale has probability e^-20 per draw —
      // with a seeded release this is a hard determinism check, not flaky
      assert(math.abs(nN - n) <= 40, s"$k count noise ${nN - n}")
      assert(math.abs(sN - sum) <= 2000000, s"$k sum noise ${sN - sum}")
      assert(mean == sN / math.max(nN, 1L), s"$k mean recompute")
    }
    // non-degenerate: the sum draws (scale 1e5) actually perturb something
    assert(a.exists { case (k, (_, sN, _)) => sN != truth(k)._2 },
      "no cell's sum was perturbed - the mechanism is vacuous")
  }

  test("q186 generalization: every published cell is k-safe or flagged; totals reconcile") {
    val rows = Privacy.q186KanonGeneralize(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = 20L
    rows.foreach { r =>
      val (g, nu, ne, pub) = (r.getAs[String]("granularity"),
        r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
        r.getAs[Boolean]("publishable"))
      // the gate unit is the INDIVIDUAL: distinct users, never events
      assert(nu <= ne, s"$g cell has more users than events")
      if (g != "all") assert(nu >= k && pub, s"$g cell under k users published")
      else assert(pub == (nu >= k), s"terminal flag wrong")
    }
    // partition property: every event's count and cents land exactly once
    val totN = rows.map(_.getAs[Long]("n_events")).sum
    val totC = rows.map(_.getAs[Long]("value_cents")).sum
    val ev = Tables.events(spark, sf)
      .agg(count(lit(1)), sum(expr("CAST(round(value * 100) AS BIGINT)"))).head()
    assert(totN == ev.getLong(0), s"counts $totN != ${ev.getLong(0)}")
    assert(totC == ev.getLong(1), s"cents $totC != ${ev.getLong(1)}")
    // the hierarchy is actually exercised at spec SF: at least one level
    // beyond day appears (sub-k days exist), else the cascade is vacuous
    assert(rows.exists(_.getAs[String]("granularity") != "day"),
      "no generalized cell at spec SF - cascade untested")
  }

  test("q262 epsilon sweep: error falls as epsilon grows; rows reconcile with q148's mechanism") {
    val got = Privacy.q262DpEpsilonSweep(spark, sf).collect()
      .map(r => r.getAs[Double]("epsilon") -> ((r.getAs[Long]("n_cells"),
        r.getAs[Long]("n_true"), r.getAs[Long]("abs_err_sum"),
        r.getAs[Long]("max_abs_err"), r.getAs[Long]("err_bp")))).toMap
    assert(got.keySet == Set(0.1, 0.5, 1.0, 2.0, 10.0))
    // one cell table across the sweep
    assert(got.values.map(v => (v._1, v._2)).toSet.size == 1)
    // the Laplace scale is 1/eps on a SHARED uniform draw: the error sum
    // can only shrink (or tie, via the round/clamp) as eps grows
    val errs = got.toSeq.sortBy(_._1).map(_._2._3)
    assert(errs.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      s"abs error must fall with eps: $errs")
    // eps=1 row reconciles against q148's published release exactly
    val q148err = {
      val rel = Privacy.q148DpCounts(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val truth = Tables.orders(spark, sf)
        .groupBy(col("o_orderstatus"),
          expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      truth.map { case (k, n) => math.abs(rel(k) - n) }.sum
    }
    assert(got(1.0)._3 == q148err, "eps=1 error != q148's release error")
    // noise is real at small eps (the sweep isn't a table of zeros)
    assert(got(0.1)._3 > 0L)
  }

  test("q287 QI sweep equals a driver class census; refinement collapses k") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 100.0) AS BIGINT)").as("b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    def census(key: ((Int, String, Long)) => Any) = {
      val ks = rows.groupBy(key).map(_._2.size.toLong)
      val n = rows.length.toLong
      (ks.size.toLong, ks.min, ks.count(_ == 1).toLong,
        ks.filter(_ < 10).sum * 10000 / n)
    }
    val want = Map(
      "segment" -> census(_._2), "nation" -> census(_._1),
      "nation+segment" -> census(t => (t._1, t._2)),
      "nation+segment+bal" -> census(t => (t._1, t._2, t._3)))
    val got = graft.operators.Privacy.q287QiRiskSweep(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))).toMap
    assert(got.view.mapValues(_._2).toMap == want)
    assert(got.count(_._2._1) == 1 && got("nation+segment+bal")._1)
    // a finer QI set refines classes: class count grows, min k shrinks
    val order = Seq("nation", "nation+segment", "nation+segment+bal").map(got(_)._2)
    order.zip(order.tail).foreach { case (a, b) =>
      assert(b._1 >= a._1 && b._2 <= a._2, "refinement law broke")
    }
  }

  test("q241 reid risk equals a driver-side equivalence-class recompute; grid complete") {
    val got = Privacy.q241ReidRisk(spark, sf).collect()
      .map(r => r.getAs[Long]("k_bucket") -> ((r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("share_bp")))).toMap
    val classes = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 100.0).toLong))
      .groupBy(identity).values.map(_.length.toLong).toSeq
    val total = classes.sum
    val ref = (1L to 6L).map { b =>
      val ks = classes.filter(k => math.min(k, 6L) == b)
      b -> ((ks.length.toLong, ks.sum, ks.sum * 10000L / total))
    }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // the grid is complete, shares cover the table, and the synthetic
    // customers carry REAL singleton (directly re-identifiable) cells —
    // the row the whole audit exists to surface
    assert(got.keySet == (1L to 6L).toSet)
    assert(got.values.map(_._2).sum == total)
    assert(got(1L)._1 > 0L, "no unique QI tuples at spec SF - audit untested")
  }
}
