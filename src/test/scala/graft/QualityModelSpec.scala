package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** q153 — the distilled quality classifier. Rows-only, so the contract
  * lives here: the learned model must actually mimic the rule filter it
  * was distilled from, deterministically, and produce both classes.
  */
class QualityModelSpec extends AnyFunSuite {
  import TestSpark._

  test("q153 model agrees with q65 rule labels on >= 90% of the corpus, both classes present") {
    val rows = TextAnalysis.q153QualityModel(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val agree = rows.count(r =>
      r.getAs[Boolean]("accept_model") == r.getAs[Boolean]("accept_rules"))
    assert(agree.toDouble / rows.length >= 0.90,
      s"distillation agreement ${agree.toDouble / rows.length}")
    // a constant-accept model would score high agreement on a mostly-good
    // corpus — demand real rejections that coincide with rule rejections
    val bothReject = rows.count(r =>
      !r.getAs[Boolean]("accept_model") && !r.getAs[Boolean]("accept_rules"))
    assert(bothReject >= 1, "model must reject at least one rule-rejected doc")
    rows.foreach { r =>
      val s0 = r.getAs[Long]("score_bp")
      assert(s0 >= 0 && s0 <= 10000, s"score_bp out of range: $s0")
    }
  }

  test("q228 model-vs-rule bias: both disagreement directions occur on a planted corpus") {
    import org.apache.spark.sql.functions._
    import TestSpark.spark.implicits._
    // 7-char letter-only words (never digits, never stopwords)
    var wc = 0
    def w7(): String = {
      wc += 1; var x = wc
      val sb = new StringBuilder("w")
      (0 until 6).foreach { _ => sb.append(('a' + x % 26).toChar); x /= 26 }
      sb.toString
    }
    def triples(parts: Seq[(String, String)]): String =
      parts.map { case (x, y) => s"the $x $y" }.mkString(" ")
    // bulk good (en): 12 distinct "the X Y" triples — passes every rule
    val good = (0 until 100).map(_ =>
      (triples(Seq.fill(12)((w7(), w7()))), "en"))
    // B (en): digit-heavy — digit_bp ~2790 > 2000, everything else good
    val b = (0 until 60).map(_ =>
      (triples(Seq.fill(12)(("12345", w7()))), "en"))
    // C (en): one triple repeated 12x — tri_share ~3529 > 1800
    val c = (0 until 60).map { _ =>
      val (x, y) = (w7(), w7()); (triples(Seq.fill(12)((x, y))), "en")
    }
    // D (de): INSIDE both rule corners — digit ~1555, tri ~1470, both
    // rule-passing, but no linear boundary can accept this point while
    // rejecting B and C and accepting the bulk (infeasible system), so
    // the logistic fit sacrifices the 20-doc group: rules_only_accept
    val d = (0 until 20).map { _ =>
      val (x, y) = (w7(), w7())
      (triples(Seq.fill(5)((x, y)) ++ Seq.fill(7)(("12345", w7()))), "de")
    }
    // K/L (fr): word-length tails — K mean ~1.67 chars (< 2.00), L ~12.33
    // (> 12.00), both rule-rejected; a single monotone weight cannot
    // reject BOTH tails while accepting the mid bulk, so at least one
    // tail is model-accepted: model_only_accept
    val letters = ('b' to 'z').map(_.toString)
    val k = (0 until 15).map { i =>
      val ls = (0 until 24).map(j => letters((i + j) % letters.length))
      (triples(ls.grouped(2).map(p => (p(0), p(1))).toSeq), "fr")
    }
    val l = (0 until 15).map { _ =>
      (triples(Seq.fill(12)((w7() + "zzzzzzzzzz", w7() + "zzzzzzzzzz"))), "fr")
    }
    val all = good ++ b ++ c ++ d ++ k ++ l
    val docs = all.zipWithIndex.map { case ((text, lang), i) =>
      (i.toLong + 1L, text, lang, s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q228corpus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextAnalysis.invalidateQualityModelCache()
    try {
      // sanity: the planted rule verdicts are exactly as designed
      val rules = TextAnalysis.q65CorpusFilter(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reject_reason")).toMap
      val langOf = all.zipWithIndex.map { case ((_, lg), i) => (i.toLong + 1L) -> lg }.toMap
      (1 to 100).foreach(i => assert(rules(i.toLong) == null, s"good doc $i: ${rules(i.toLong)}"))
      (101 to 160).foreach(i => assert(rules(i.toLong) == "too_many_digits", s"B doc $i"))
      (161 to 220).foreach(i => assert(rules(i.toLong) == "repetitive", s"C doc $i"))
      (221 to 240).foreach(i => assert(rules(i.toLong) == null, s"D doc $i: ${rules(i.toLong)}"))
      (241 to 270).foreach(i => assert(rules(i.toLong) == "word_length", s"K/L doc $i"))
      val rows = TextAnalysis.q228ModelRuleBias(spark, dir).collect()
      def n(lang: String, outcome: String): Long = rows
        .filter(r => r.getAs[String]("lang") == lang &&
          r.getAs[String]("outcome") == outcome)
        .map(_.getAs[Long]("n_docs")).sum
      // the D corner (de) is model-rejected, rules-accepted
      assert(n("de", "rules_only_accept") > 0, rows.mkString("\n"))
      // at least one word-length tail (fr) is model-accepted, rules-rejected
      assert(n("fr", "model_only_accept") > 0, rows.mkString("\n"))
      // composition pin: the table is exactly q153's per-doc verdicts
      // bucketed by the planted langs
      val per = TextAnalysis.q153QualityModel(spark, dir).collect()
        .map(r => (langOf(r.getAs[Long]("doc_id")),
          (r.getAs[Boolean]("accept_model"), r.getAs[Boolean]("accept_rules"))))
      val ref = per.groupBy { case (lg, (m, rl)) =>
        (lg, if (m && rl) "both_accept" else if (!m && !rl) "both_reject"
             else if (m) "model_only_accept" else "rules_only_accept")
      }.map { case (key, v) => key -> v.length.toLong }
      val gotMap = rows.map(r => (r.getAs[String]("lang"),
        r.getAs[String]("outcome")) -> r.getAs[Long]("n_docs")).toMap
      assert(gotMap == ref, s"got $gotMap\nref $ref")
      // shares are within-lang integer basis points
      rows.foreach { r =>
        val tot = per.count(_._1 == r.getAs[String]("lang")).toLong
        assert(r.getAs[Long]("share_bp") == r.getAs[Long]("n_docs") * 10000L / tot)
      }
    } finally {
      TextAnalysis.invalidateQualityModelCache()
      val root = new java.io.File(dir)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("q155 mixture plan: rates capped, repeats honest, token budget conserved") {
    val rows = TextAnalysis.q155MixturePlan(spark, sf).collect()
    assert(rows.length == 20, "one row per source")
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val (rate, rep) = (r.getAs[Long]("sample_rate_bp"), r.getAs[Long]("repeat_x100"))
      assert(rate >= 0 && rate <= 10000)
      // the cap and the repeat factor must tell the same story: a capped
      // rate means the target exceeds the source's mass (repeat >= 100)
      assert((rate == 10000) == (rep >= 100), s"${r.getString(0)}: rate=$rate rep=$rep")
      assert(r.getAs[Long]("expected_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // down-sampling only: the planned corpus never exceeds the actual one
    assert(rows.map(_.getAs[Long]("expected_tokens")).sum <= total)
    // target shares sum to ~100% (integer-div slack below 1bp per source)
    val bp = rows.map(_.getAs[Long]("target_bp")).sum
    assert(bp > 10000 - 20 && bp <= 10000, s"target shares sum to $bp bp")
  }

  test("q156 bigram-LM NLL equals a driver-side brute force on every doc") {
    val got = TextAnalysis.q156LmPerplexity(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_micro"),
          r.getAs[Long]("avg_nll_micro"), r.getAs[Boolean]("lm_keep"))))
      .toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    assert(docs.nonEmpty && got.size == docs.length)
    // independent reference: plain Scala maps, same micro-nat rounding
    val bigrams = docs.flatMap { case (_, w) => w.sliding(2).filter(_.size == 2) }
    val c12 = bigrams.groupBy(b => (b(0), b(1))).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigrams.groupBy(_.head).map { case (k, v) => k -> v.size.toLong }
    val v = docs.flatMap(_._2).distinct.size.toLong
    def micro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    docs.foreach { case (id, w) =>
      val bs = w.sliding(2).filter(_.size == 2).toVector
      val nll = bs.map(b => micro(c1(b(0)) + v) - micro(c12((b(0), b(1))) + 1)).sum
      val n = bs.size.toLong
      val avg = nll / math.max(n, 1)
      val want = (n, nll, avg, avg <= micro(v))
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // the keep gate must actually discriminate on this corpus... if every
    // doc lands on one side the ln(V) bar is vacuous here
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "lm_keep must split the corpus")
  }

  test("q156 shuffled-join fallback (broadcastModel=false) matches the broadcast plan") {
    val a = TextAnalysis.q156LmPerplexity(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nll_micro")).toMap
    spark.conf.set("graft.lm.broadcastModel", "false")
    try {
      val b = TextAnalysis.q156LmPerplexity(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nll_micro")).toMap
      assert(a == b)
    } finally spark.conf.unset("graft.lm.broadcastModel")
  }

  test("q157 DSIR selection equals a driver-side brute force (scores, ranking and cut)") {
    val got = TextAnalysis.q157DsirSelect(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("logw_micro"),
        r.getAs[Long]("avg_logw_micro")))
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    val v = docs.flatMap(_._3).distinct.size.toLong
    val tgt = docs.filter(_._2 == "src0").flatMap(_._3)
    val pool = docs.filter(_._2 != "src0")
    val ct = tgt.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cr = pool.flatMap(_._3).groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val (nt, nr) = (tgt.size.toLong, pool.map(_._3.size).sum.toLong)
    def micro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val want = pool.map { case (id, src, w) =>
      val logw = w.map(t =>
        micro(ct.getOrElse(t, 0L) + 1) - micro(nt + v)
          - micro(cr(t) + 1) + micro(nr + v)).sum
      (id, src, w.size.toLong, logw, logw / w.size)  // JVM / truncates like DIV
    }.sortBy { case (id, _, _, _, avg) => (-avg, id) }.take(200)
    assert(got.toSeq == want.toSeq)
    assert(got.forall(_._2 != "src0"), "target-source docs must not be selectable")
  }

  test("q162 tiers: cutoffs are the exact terciles at this size; occupancy near-balanced") {
    val rows = TextAnalysis.q162CcnetTiers(spark, sf).collect()
    val n = rows.length
    assert(n == Tables.documents(spark, sf).count())
    // exact terciles from a driver-side sort (the approx sketch at
    // acc=10000 must be exact for n << 10000)
    val sorted = rows.map(_.getAs[Long]("avg_nll_micro")).sorted
    val (c1, c2) = (sorted((n / 3.0).ceil.toInt - 1), sorted((2 * n / 3.0).ceil.toInt - 1))
    rows.foreach { r =>
      val (v, t) = (r.getAs[Long]("avg_nll_micro"), r.getAs[String]("tier"))
      val want = if (v <= c1) "head" else if (v <= c2) "middle" else "tail"
      assert(t == want, s"doc ${r.getAs[Long]("doc_id")}: $v tiered $t, want $want")
    }
    // ties can skew occupancy, but each tier must hold roughly a third
    val byTier = rows.groupBy(_.getAs[String]("tier")).map { case (k, v) => k -> v.length }
    assert(byTier.keySet == Set("head", "middle", "tail"), byTier.toString)
    byTier.values.foreach(c =>
      assert(math.abs(c - n / 3.0) <= n * 0.05, s"occupancy skew: $byTier"))
  }

  test("q153 training is deterministic: identical scores across independent fits") {
    val a = TextAnalysis.q153QualityModel(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_bp")).toMap
    TextAnalysis.invalidateQualityModelCache()
    val b = TextAnalysis.q153QualityModel(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_bp")).toMap
    assert(a == b, "refit on the same data must reproduce every score exactly")
  }

  test("q196 repetition: planted template spam and 5-gram loops trip their gates, prose passes") {
    import TestSpark.spark.implicits._
    val prose = "the quick brown fox jumps over a lazy dog while rain falls on " +
      "green hills and children read quiet books near warm fires every evening"
    val spam = ("click here " * 40).trim            // one bigram dominates
    val loop = (("alpha beta gamma delta epsilon " * 12).trim + " " + prose)
    val docs = Seq((1L, prose), (2L, spam), (3L, loop), (4L, "tiny"), (5L, ""))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_bigram_bp"), r.getAs[Long]("dup_5gram_bp"),
          r.getAs[Boolean]("keep"))).toMap
    assert(rows(1L)._3, s"prose must keep: ${rows(1L)}")
    assert(!rows(2L)._3 && rows(2L)._1 > 900, s"template spam must trip top-bigram: ${rows(2L)}")
    assert(!rows(3L)._3 && rows(3L)._2 > 1500, s"5-gram loop must trip dup gate: ${rows(3L)}")
    // short docs carry no repetition evidence: 0 bp, kept
    assert(rows(4L) == ((0L, 0L, true)) && rows(5L) == ((0L, 0L, true)))
    // determinism
    val again = TextAnalysis.repetitionOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("top_bigram_bp")).toMap
    assert(again == rows.map { case (k, v) => k -> v._1 })
  }
}
