package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** End-to-end corpus pipeline: filter → dedup → collapse → decontaminate →
  * normalize → publish, with a reconciling stage audit.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.01"

  test("corpus pipeline publishes a clean corpus with a reconciling audit") {
    val outDir = Files.createTempDirectory("graft-corpus").toString
    val (published, audit) = CorpusPipeline.run(spark, dir, outDir)

    val rows = audit.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val counts = rows.view.mapValues(_._1).toMap
    val tokens = rows.view.mapValues(_._2).toMap
    // stage doc AND token funnels shrink monotonically raw → published
    // (every stage drops docs or cuts/normalizes text downward — a token
    // INCREASE anywhere means a stage is synthesizing content)
    val order = Seq("raw", "url_deduped", "quality_filtered", "repetition_filtered",
      "safety_cleared", "exact_deduped", "near_dup_collapsed", "substr_cut",
      "decontaminated", "published")
    val seq = order.map(counts)
    assert(seq.zip(seq.tail).forall { case (a, b) => b <= a }, s"not monotone: $counts")
    val tseq = order.map(tokens)
    assert(tseq.zip(tseq.tail).forall { case (a, b) => b <= a },
      s"token funnel not monotone: $tokens")
    assert(counts("published") > 0 && tokens("published") > 0)
    // the substr-cut stage edits text without dropping docs at this SF's
    // planted geometry only when spans repeat; either way tokens obey
    // docs: a stage that kept all docs may still shed tokens, never gain
    assert(tokens("substr_cut") <= tokens("near_dup_collapsed"))
    assert(counts("published") == counts("decontaminated"))
    // the shipped corpus trips no placeholder blocklist term, so the
    // safety gate must pass everything the quality filter passed —
    // a smaller count here would mean the gate fires on clean prose
    assert(counts("safety_cleared") == counts("repetition_filtered"))
    // the repetition stage drops exactly the q196-rejected docs (the
    // calibration intentionally puts the corpus p99 above the top-bigram
    // gate, so a small real drop here proves the stage is live)
    val rejected = TextAnalysis.repetitionOf(Tables.documents(spark, dir))
      .filter(!col("keep")).select(col("doc_id"))
    assert(published.join(rejected, Seq("doc_id"), "left_semi").count() == 0)

    // every published doc passed the quality filter...
    val accepted = TextAnalysis.q65CorpusFilter(spark, dir)
      .filter(col("accept")).select(col("doc_id"))
    assert(published.join(accepted, Seq("doc_id"), "left_anti").count() == 0)
    // ...no benchmark doc leaked through...
    assert(published.filter(col("doc_id") % 97 === 0).count() == 0)
    // ...no near-dup cluster loser survived (survivor = cluster min id)
    val losers = Dedup.connectedComponents(
        Dedup.fastCandidatePairs(CorpusPipeline.exactDedup(
          CorpusPipeline.qualityFilter(spark, dir)))
          .select(col("doc_a"), col("doc_b")))
      .filter(col("doc_id") =!= col("label")).select(col("doc_id"))
    assert(published.join(losers, Seq("doc_id"), "left_semi").count() == 0)

    // published layout is lang-partitioned and the text is normalized
    assert(new java.io.File(outDir).listFiles().exists(_.getName.startsWith("lang=")))
    assert(published.filter(col("clean_text").rlike("[^a-z0-9 ]")).count() == 0)

    // the post-publish curation read: one verdict row per surviving
    // source, flags 0/1, risk = their sum, verdict derived from risk
    val report = CorpusPipeline.sourceReport(published).collect()
    val srcs = published.select("source").distinct().count()
    assert(report.length.toLong == srcs && srcs > 0)
    report.foreach { r =>
      val fl = Seq("flag_mirror", "flag_template", "flag_ocr", "flag_mix")
        .map(r.getAs[Long](_))
      assert(fl.forall(f => f == 0L || f == 1L))
      assert(r.getAs[Long]("risk") == fl.sum)
      val want = if (fl.sum >= 3) "review" else if (fl.sum == 2) "watch" else "ok"
      assert(r.getAs[String]("verdict") == want)
    }
    // corpus-relative flags are live on the published corpus too: some
    // axis separates the sources
    assert(report.map(_.getAs[Long]("risk")).distinct.length > 1)

    // the post-publish mixture read: q232's KL over the SAME published
    // frame, row-for-row (one sourceKlOf definition)
    val gotKl = CorpusPipeline.klReport(published).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[Any]("kl_micro")).map(_.asInstanceOf[Long]))).toSet
    val wantKl = TextAnalysis.sourceKlOf(
        published.withColumnRenamed("clean_text", "text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[Any]("kl_micro")).map(_.asInstanceOf[Long]))).toSet
    assert(gotKl == wantKl && gotKl.nonEmpty, "klReport != q232 over published")
  }

  test("substr-cut stage: non-owners lose the shared span, owner keeps it, fully-cut docs drop") {
    import TestSpark.spark.implicits._
    val span = (1 to 20).map(i => s"tok$i").mkString(" ") // 20 tokens ≥ W=15
    val docs = Seq(
      (1L, s"alpha beta $span gamma", "en", "s0"),  // owner: keeps the span
      (2L, s"$span delta epsilon", "en", "s0"),     // loses the span, keeps its tail
      (3L, "totally unique text here", "en", "s1"), // untouched
      (4L, span, "en", "s1"),                        // nothing but the span: drops
      (5L, "unique  doubled   spaces doc", "en", "s1"), // untouched, multi-space
      (6L, "   ", "en", "s1"))   // untouched whitespace-only: passes through
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val cut = CorpusPipeline.substrCut(docs, W = 15)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_chars"))).toMap
    // the drop rule is a consequence of CUTTING to nothing (doc 4), not
    // of being token-less: doc 6 had nothing cut and must pass through
    assert(cut.keySet == Set(1L, 2L, 3L, 5L, 6L), cut)
    assert(cut(6L)._1 == "   ", cut(6L))
    assert(cut(1L)._1 == s"alpha beta $span gamma") // min-id owner unchanged
    assert(cut(2L)._1 == "delta epsilon", cut(2L))  // span excised, remainder kept
    assert(cut(3L)._1 == "totally unique text here")
    // docs with NOTHING to cut keep their text byte-for-byte — the stage
    // must not silently collapse whitespace runs on untouched docs (their
    // raw-space 5-grams feed decontamination downstream)
    assert(cut(5L)._1 == "unique  doubled   spaces doc", cut(5L))
    assert(cut(5L)._2 == "unique  doubled   spaces doc".length.toLong)
    // n_chars follows the cut text, never the stale ingest value
    assert(cut(2L)._2 == "delta epsilon".length.toLong)
  }

  test("canonical URLs normalize the public set; url dedup keeps one copy per resource") {
    import spark.implicits._
    val pairs = Seq(
      ("HTTP://Example.COM:80/Path#frag", "http://example.com/Path"),
      ("https://a.com:443/x?utm_source=tw&b=1&utm_medium=m", "https://a.com/x?b=1"),
      ("https://a.com/?utm_campaign=c", "https://a.com"),
      // default ports are SCHEME-paired: https on :80 is a real
      // non-default endpoint and must not fold onto the bare host
      ("https://a.com:80/x", "https://a.com:80/x"),
      ("http://b.org:443/x", "http://b.org:443/x"),
      ("http://b.org/", "http://b.org"),
      ("http://b.org/p/", "http://b.org/p/"), // only the BARE-host slash drops
      ("src_a", "src_a")) // non-URL sources pass through verbatim
    val got = pairs.map(_._1).toDF("u")
      .select(CorpusPipeline.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == pairs.map(_._2), s"got $got")
    // dedup: case/port/fragment/tracking variants of one resource fold to
    // the min doc_id; distinct resources never collapse — and non-URL
    // sources are LABELS shared by many docs, so they never participate
    val docs = Seq(
      (1L, "t1", "en", "HTTP://Example.COM:80/Path#frag"),
      (2L, "t2", "en", "http://example.com/Path"),
      (3L, "t3", "en", "http://example.com/Other"),
      (4L, "t4", "en", "src_a"),
      (5L, "t5", "en", "src_b"),
      (6L, "t6", "en", "src_a")).toDF("doc_id", "text", "lang", "source")
    val kept = CorpusPipeline.urlDedup(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("langIdFill resolves only und labels; safetyFilter drops only unsafe rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "сегодня хорошая погода и мы идем гулять в парк", "und", "w"),
      (2L, "the quick brown fox jumps over the lazy dog again", "und", "w"),
      (3L, "whatever text this is", "fr", "w"), // concrete label kept
      (4L, "contains selfharmterm so the gate must drop it", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
    val filled = CorpusPipeline.langIdFill(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(filled(1L) == "ru" && filled(2L) == "en" && filled(3L) == "fr")
    assert(CorpusPipeline.langIdFill(docs).columns.toSeq == docs.columns.toSeq)
    val safe = CorpusPipeline.safetyFilter(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(safe == Seq(1L, 2L, 3L))
  }

  test("decontaminate catches verbatim benchmark text even when the benchmark doc was deduped away") {
    import spark.implicits._
    // doc 97 is a benchmark doc; doc 5 is its verbatim copy with a LOWER
    // id, so exact dedup keeps 5 and drops 97. The bench gram set must
    // come from the RAW frame or doc 5 (benchmark text!) leaks through.
    val benchText = "secret benchmark question about the meaning of life and everything else"
    val raw = Seq(
      (5L, benchText),
      (97L, benchText),
      (6L, "completely unrelated corpus document with its own distinct phrasing here"))
      .toDF("doc_id", "text")
    val afterDedup = CorpusPipeline.exactDedup(raw)
    assert(afterDedup.filter(col("doc_id") === 97L).count() == 0) // 97 deduped away
    val out = CorpusPipeline.decontaminate(afterDedup, raw)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!out.contains(5L), "verbatim benchmark text leaked into the corpus")
    assert(out.contains(6L))
  }

  test("stage 6 chunks: exact q174 geometry over the published corpus, lineage carried") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-chunks")
    val (published, _) = CorpusPipeline.runWithChunks(spark, sf,
      s"$dir/corpus", s"$dir/chunks")
    val chunks = spark.read.parquet(s"$dir/chunks")
    assert(chunks.count() > 0)
    // every published doc chunks; every chunk's doc exists; lineage intact
    val pubIds = published.select("doc_id").collect().map(_.getLong(0)).toSet
    val chunkIds = chunks.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(chunkIds == pubIds)
    val langs = published.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.select("doc_id", "lang", "chunk_key", "chunk_no").collect().foreach { r =>
      assert(r.getString(1) == langs(r.getLong(0)), s"chunk lang drift for doc ${r.getLong(0)}")
      assert(r.getString(2) == s"${r.getLong(0)}#${r.getLong(3)}")
    }
    // the geometry IS q174's: reconstruct one multi-chunk doc by hand
    val multi = chunks.groupBy("doc_id").count().filter(col("count") > 1)
      .select("doc_id").head().getLong(0)
    val toks = published.filter(col("doc_id") === multi)
      .select("clean_text").head().getString(0).split(" ").filter(_.nonEmpty)
    chunks.filter(col("doc_id") === multi).collect().foreach { r =>
      val i = r.getAs[Long]("chunk_no").toInt
      assert(r.getAs[String]("chunk_text") ==
        toks.slice(i * 24, i * 24 + 32).mkString(" "))
    }
  }

  // planted corpus with hand-countable overlaps for the q247/q248 kernels:
  // bench doc 0 (suite 0) is 13 words b0..b12; bench doc 97 (suite 1) is
  // 8 words c0..c7; corpus doc 1 embeds ALL of bench0 (+1 word), doc 2
  // exactly one 5-window of bench0, doc 3 one 5-window of bench1, doc 4
  // nothing.
  private def plantedDecontam = {
    import spark.implicits._
    Seq(
    (0L, (0 to 12).map(i => s"b$i").mkString(" ")),
    (97L, (0 to 7).map(i => s"c$i").mkString(" ")),
    (1L, (0 to 12).map(i => s"b$i").mkString(" ") + " x"),
    (2L, "z1 z2 b4 b5 b6 b7 b8 z3"),
    (3L, "y1 c0 c1 c2 c3 c4 y2"),
    (4L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
  }

  test("q247 sweep on a planted corpus: per-n counts equal hand arithmetic") {
    val got = TextAnalysis.decontamSweepOf(plantedDecontam).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // n=5: bench grams 9 (13-word doc) + 4 (8-word doc); docs 1,2,3 hit
    // with 9+1+1 grams; 3 of 4 corpus docs → 7500 bp
    assert(got(5) == ((13L, 4L, 3L, 11L, 7500L)))
    // n=8: bench grams 6+1; only doc 1 hits, with all 6 of bench0's
    assert(got(8) == ((7L, 4L, 1L, 6L, 2500L)))
    // n=13: the single 13-gram of bench0; doc 1 carries it verbatim
    assert(got(13) == ((1L, 4L, 1L, 1L, 2500L)))
  }

  test("q268 waterfall reconciles against its component queries, in order") {
    val got = TextAnalysis.q268PipelineWaterfall(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // component recompute: q65 verdicts (oracled) + q58 contaminated set
    // (oracled) + q28's canonical key, composed driver-side in the same
    // stage order
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 3))).as("ch"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val verdicts = TextAnalysis.q65CorpusFilter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Boolean]("accept")))).toMap
    val contam = TextAnalysis.q58Decontaminate(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val corpus = src.keys.filter(_ % 97 != 0).toSeq
    val minAcc = corpus.filter(id => verdicts(id)._2)
      .groupBy(id => src(id)._2).view.mapValues(_.min).toMap
    val rows = corpus.map { id =>
      val (s, ch) = src(id)
      val (nw, acc) = verdicts(id)
      val kept = acc && minAcc(ch) == id
      (s, nw, acc, kept, kept && !contam(id))
    }
    rows.groupBy(_._1).foreach { case (s, rs) =>
      val (n0, t0) = (rs.size.toLong, rs.map(_._2).sum)
      val stages = Seq(
        "0_raw" -> ((n0, t0)),
        "1_quality" -> ((rs.count(_._3).toLong, rs.filter(_._3).map(_._2).sum)),
        "2_exact_dedup" -> ((rs.count(_._4).toLong, rs.filter(_._4).map(_._2).sum)),
        "3_decontaminated" -> ((rs.count(_._5).toLong, rs.filter(_._5).map(_._2).sum)))
      stages.foreach { case (st, (n, t)) =>
        assert(got((s, st)) == ((n, t, n * 10000 / math.max(n0, 1),
          t * 10000 / math.max(t0, 1))), s"($s, $st) drifted")
      }
      // the funnel is monotone by construction — a violation means a
      // stage gained docs/tokens
      val seq = stages.map(_._2)
      assert(seq.zip(seq.tail).forall { case ((na, ta), (nb, tb)) => nb <= na && tb <= ta })
    }
  }

  test("q272 gate sensitivity equals a recompute off the oracled q65 stats; curves monotone") {
    val stats = TextAnalysis.q65CorpusFilter(spark, dir).collect()
      .map(r => Map(
        "n_words" -> r.getAs[Long]("n_words"),
        "word_len_x100" -> r.getAs[Long]("word_len_x100"),
        "digit_bp" -> r.getAs[Long]("digit_bp"),
        "stop_bp" -> r.getAs[Long]("stop_bp"),
        "tri_share_bp" -> r.getAs[Long]("tri_share_bp")))
    val n = stats.length.toLong
    def fails(gate: String, t: Long)(d: Map[String, Long]): Boolean = gate match {
      case "min_words"        => d("n_words") < t
      case "max_words"        => d("n_words") > t
      case "word_len_low"     => d("word_len_x100") < t
      case "word_len_high"    => d("word_len_x100") > t
      case "max_digit_bp"     => d("digit_bp") > t
      case "min_stop_bp"      => d("stop_bp") < t
      case "max_tri_share_bp" => d("tri_share_bp") > t
    }
    val got = TextAnalysis.q272GateSensitivity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == TextAnalysis.GateSweep.map { case (g, t, _) => (g, t) }.toSet)
    TextAnalysis.GateSweep.foreach { case (g, t, p) =>
      val f = stats.count(fails(g, t)).toLong
      assert(got((g, t)) == ((f, f * 10000 / n, p)), s"($g, $t) drifted")
    }
    // each min_* curve is nondecreasing in t, each max_*/word_len_high
    // curve nonincreasing — a violation means a predicate flipped
    got.keySet.map(_._1).foreach { g =>
      val curve = got.filter(_._1._1 == g).toSeq.sortBy(_._1._2).map(_._2._1)
      val pairs = curve.zip(curve.tail)
      if (g.startsWith("min_") || g == "word_len_low")
        assert(pairs.forall { case (a, b) => a <= b }, s"$g not nondecreasing")
      else assert(pairs.forall { case (a, b) => a >= b }, s"$g not nonincreasing")
    }
  }

  test("q275 cube marginals reproduce the oracled q268 funnel; kept implies accept") {
    val cube = TextAnalysis.q275GateOverlap(spark, dir).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(cube.keySet.forall { case (a, k, _) => a || !k },
      "a kept doc must be quality-accepted")
    val funnel = TextAnalysis.q268PipelineWaterfall(spark, dir).collect()
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(v =>
        (v.map(_._2._1).sum, v.map(_._2._2).sum)).toMap
    def mass(p: ((Boolean, Boolean, Boolean)) => Boolean): (Long, Long) = {
      val cells = cube.filter { case (kk, _) => p(kk) }.values
      (cells.map(_._1).sum, cells.map(_._2).sum)
    }
    assert(mass(_ => true) == funnel("0_raw"))
    assert(mass(_._1) == funnel("1_quality"))
    assert(mass(_._2) == funnel("2_exact_dedup"))
    assert(mass(k => k._2 && !k._3) == funnel("3_decontaminated"))
  }

  test("q279 production row reconciles with the oracled q174 chunks; geometry laws hold") {
    val got = TextAnalysis.q279ChunkStrideSweep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // the (32, 24) row IS q174's geometry: chunk count and token mass must
    // equal the exploded chunk table exactly
    val chunks = TextAnalysis.q174DocChunks(spark, dir)
      .agg(count(lit(1)), sum(col("n_chunk_tokens"))).collect()(0)
    val prod = got((32, 24))
    assert(prod._1 && prod._2 == chunks.getLong(0) && prod._3 == chunks.getLong(1),
      s"production row drifted from q174: $prod vs $chunks")
    assert(got.count(_._2._1) == 1, "exactly one production row")
    got.foreach { case ((w, s), (_, n, m, infl, fill)) =>
      assert(fill <= 10000, s"($w,$s) fill over 100%")
      assert(m >= n, "every chunk has at least one token")
      // non-overlapping stride (s == w) never inflates the corpus
      if (s == w) assert(infl <= 10000, s"($w,$s) inflated without overlap")
    }
    // at fixed w, shrinking the stride can only add chunks and mass
    Seq(16, 32).foreach { w =>
      val byS = got.collect { case ((`w`, s), v) => s -> v }.toSeq.sortBy(-_._1)
      byS.zip(byS.tail).foreach { case ((_, a), (_, b)) =>
        assert(b._2 >= a._2 && b._3 >= a._3, s"w=$w stride curve not monotone")
      }
    }
  }

  test("q280 scrub savings: planted span union equals hand arithmetic; scrub never exceeds drop") {
    import TestSpark.spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-scrub").toString
    // bench doc (id 0 ≡ 0 mod 97) carries grams b1..b5 / b2..b6 / b3..b7;
    // corpus doc 1 matches at 0-based starts {1, 2, 9}:
    // union [1,7)∪[9,14) = 11 of 15 tokens → savings 4/15 = 2666 bp
    Seq(
      (0L, "b1 b2 b3 b4 b5 b6 b7", "en", "B", 1L),
      (1L, "x1 b1 b2 b3 b4 b5 b6 x2 x3 b1 b2 b3 b4 b5 x4", "en", "A", 1L),
      (2L, "clean words only here nothing matches at all today", "en", "A", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$out/documents.parquet")
    val p = TextAnalysis.q280DecontamScrubSavings(spark, out).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(p == Map("A" -> ((1L, 15L, 11L, 2666L))), s"planted drifted: $p")
    // at sf: doc accounting matches the oracled q58 verdict, and the scrub
    // cost can never exceed the drop cost
    val rows = TextAnalysis.q280DecontamScrubSavings(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)} scrub > drop")
      assert(r.getLong(4) >= 0)
    }
    val q58Docs = TextAnalysis.q58Decontaminate(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == q58Docs,
      "contaminated-doc mass drifted from the oracled q58")
  }

  test("q281 interaction marginals reconcile with the oracled q226/q227 tables") {
    val rows = TextAnalysis.q281GateInteraction(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
    // lift columns are exact differences of the published bp columns
    rows.foreach { case (k, (_, _, acc, lacc, sacc, ll, ls)) =>
      assert(ll == acc - lacc && ls == acc - sacc, s"$k lift drifted")
    }
    // per-lang accepted mass equals q226's 'accepted' cells
    val q226 = TextAnalysis.q226LangFilterBias(spark, dir).collect()
      .filter(_.getString(1) == "accepted")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val langAcc = rows.groupBy(_._1._1).view
      .mapValues(_.map(_._2._2).sum).toMap
    assert(langAcc.filter(_._2 > 0) == q226,
      "lang marginals drifted from the oracled q226")
    // per-source accepted mass equals q227's 'accepted' cells
    val q227 = TextAnalysis.q227GateAttritionBySource(spark, dir).collect()
      .filter(_.getString(1) == "accepted")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val srcAcc = rows.groupBy(_._1._2).view
      .mapValues(_.map(_._2._2).sum).toMap
    assert(srcAcc.filter(_._2 > 0) == q227,
      "source marginals drifted from the oracled q227")
  }

  test("q284 release split reconciles with the pooled q268 funnel") {
    val got = TextAnalysis.q284ReleaseWaterfallDelta(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    // deltas are exact differences of the published bp columns; raw stage
    // is 10000/10000 by construction on both releases
    got.foreach { case (st, (_, b0, t0, _, b1, t1, db, tb)) =>
      assert(db == b1 - b0 && tb == t1 - t0, s"$st deltas")
      if (st == "0_raw") assert(b0 == 10000 && b1 == 10000 && t0 == 10000 && t1 == 10000)
    }
    // the two releases' doc masses sum to the pooled q268 stage totals
    val pooled = TextAnalysis.q268PipelineWaterfall(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { case (st, (n0, _, _, n1, _, _, _, _)) =>
      assert(n0 + n1 == pooled(st), s"$st mass drifted from the pooled funnel")
    }
  }

  test("q285 multiplicity: planted two-suite doc lands at k=2; mass reconciles with q248") {
    import TestSpark.spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-mult").toString
    // suite 0 = doc 0, suite 1 = doc 97; corpus doc 1 quotes one 5-gram
    // from EACH suite (k=2, 2 matched (suite, gram) pairs), doc 2 quotes
    // only suite 0 (k=1), doc 3 is clean
    Seq(
      (0L, "a1 a2 a3 a4 a5 a6", "en", "S", 1L),
      (97L, "b1 b2 b3 b4 b5 b6", "en", "S", 1L),
      (1L, "x a1 a2 a3 a4 a5 y b1 b2 b3 b4 b5 z", "en", "A", 1L),
      (2L, "p a2 a3 a4 a5 a6 q", "en", "A", 1L),
      (3L, "c1 c2 c3 c4 c5 c6 c7", "en", "A", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$out/documents.parquet")
    val p = TextAnalysis.q285ContaminationMultiplicity(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p == Map(2L -> ((1L, 2L, 5000L)), 1L -> ((1L, 1L, 5000L))),
      s"planted drifted: $p")
    // at sf: doc and gram mass reconcile with the oracled q248 table
    val hist = TextAnalysis.q285ContaminationMultiplicity(spark, dir).collect()
    val q248 = TextAnalysis.q248ContaminationByBenchmark(spark, dir).collect()
    assert(hist.map(_.getLong(2)).sum == q248.map(_.getLong(4)).sum,
      "matched-gram mass drifted from the oracled q248")
    assert(hist.map(_.getLong(3)).sum <= 10000 &&
      hist.map(_.getLong(3)).sum > 10000 - hist.length)
  }

  test("q296 agreement cells reconcile with the oracled q247 sweep; containment holds") {
    val cells = TextAnalysis.q296DecontamAgreement(spark, dir).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // structural containment: a 13-gram match implies 5-gram matches
    assert(!cells.contains((false, true)), "impossible (false, true) cell appeared")
    val sweep = TextAnalysis.q247DecontamNgramSweep(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    val hit5 = cells.collect { case ((true, _), n) => n }.sum
    val hit13 = cells.collect { case ((_, true), n) => n }.sum
    assert(hit5 == sweep(5), "hit@5 mass drifted from the oracled q247")
    assert(hit13 == sweep(13), "hit@13 mass drifted from the oracled q247")
    val corpus = Tables.documents(spark, dir).filter(col("doc_id") % 97 =!= 0).count()
    assert(cells.values.sum == corpus, "cells must cover the corpus")
  }

  test("q251 marginal grams on a planted corpus equal hand arithmetic") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-marginal").toString
    // s1 (11 tokens, rank 1): types {a1..a5, a2..a6}, both novel at rank 1;
    // s2 (6 tokens, rank 2): types {a2..a6 (owned by s1), a3..b1 (novel)}
    Seq(
      (1L, "a1 a2 a3 a4 a5 a6", "en", "s1", 17L),
      (2L, "a1 a2 a3 a4 a5", "en", "s1", 14L),
      (3L, "a2 a3 a4 a5 a6 b1", "en", "s2", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$outDir/documents.parquet")
    val got = TextAnalysis.q251SourceMarginalGrams(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == Map(
      1L -> (("s1", 11L, 2L, 2L, 10000L, 2L)),
      2L -> (("s2", 6L, 2L, 1L, 5000L, 3L))))
  }

  test("q252 lm-dup lift reconciles against the independently-oracled tier and cluster kernels") {
    val got = TextAnalysis.q252LmDupLift(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.nonEmpty)
    val clustered = graft.operators.Dedup.clusterMap(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val tiers = TextAnalysis.ccnetTiersOf(spark, dir, carry = Nil)
      .select("doc_id", "tier").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gn = tiers.length.toLong
    val gd = tiers.count { case (id, _) => clustered(id) }.toLong
    val want = tiers.groupBy(_._2).map { case (tier, docs) =>
      val n = docs.length.toLong
      val d = docs.count { case (id, _) => clustered(id) }.toLong
      tier -> ((n, d, d * 10000 / n, d * 10000 / n - gd * 10000 / gn))
    }
    assert(got == want)
    // liveness: the corpus carries near-dup families, so lift is a real
    // measurement, not a table of zeros
    assert(gd > 0, "no clustered docs at sf0.01 — the lift audit is vacuous")
  }

  test("q256 gram df profile on a planted corpus equals hand arithmetic") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-dfprof").toString
    // grams: "a1..a5" in docs 1,2 (df=2); "a2..a6" in doc 1 only (df=1);
    // doc 3 has no 5-gram (4 words)
    Seq(
      (1L, "a1 a2 a3 a4 a5 a6", "en", "s1", 17L),
      (2L, "a1 a2 a3 a4 a5", "en", "s1", 14L),
      (3L, "x1 x2 x3 x4", "en", "s2", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$outDir/documents.parquet")
    val got = TextAnalysis.q256GramDfProfile(spark, outDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // totals: 2 gram types, mass 3
    assert(got == Map(
      "1" -> ((1L, 1L, 5000L, 3333L)),
      "2" -> ((1L, 2L, 5000L, 6666L))))
  }

  test("q248 per-benchmark split on a planted corpus equals hand arithmetic") {
    val got = TextAnalysis.contaminationByBenchmarkOf(plantedDecontam).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == Set(0L, 1L), "one row per observed suite")
    // suite 0 (doc 0): 9 bench 5-grams; docs 1 (9 grams) + 2 (1) hit
    assert(got(0L) == ((1L, 9L, 2L, 10L, 5000L)))
    // suite 1 (doc 97): 4 bench 5-grams; doc 3 hits with 1
    assert(got(1L) == ((1L, 4L, 1L, 1L, 2500L)))
  }

  test("q304 template prefix: planted templated/organic/tie corpus + corpus driver recompute") {
    val s = spark
    import s.implicits._
    // templated feed: 6 of 20 docs share the same 8-token opening (3000
    // bp — over the bar); organic feed: all openings distinct; tie feed:
    // two openings at 2 each — the lexicographically SMALLER must win;
    // shorty: a 3-token doc is its own whole-text opening
    val tpl = "the quick brown fox jumps over the lazy"
    val planted =
      (1 to 6).map(i => ("tpl", s"$tpl dog tail$i")) ++
      (1 to 14).map(i => ("tpl", s"organic text number $i pads out to eight tokens plus")) ++
      (1 to 10).map(i => ("org", s"completely unique opening $i with its own eight tokens here")) ++
      Seq(("tie", "b b b b b b b b x"), ("tie", "b b b b b b b b y"),
          ("tie", "a a a a a a a a x"), ("tie", "a a a a a a a a y"),
          ("shorty", "tiny doc here"))
    val got = TextAnalysis.templatePrefixOf(planted.toDF("source", "text"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_prefixes"),
          r.getAs[String]("modal_prefix"), r.getAs[Long]("modal_n"),
          r.getAs[Long]("modal_bp"), r.getAs[Boolean]("templated")))).toMap
    assert(got("tpl") == ((20L, 15L, tpl, 6L, 3000L, true)), got("tpl").toString)
    assert(got("org")._6 == false && got("org")._4 == 1L, got("org").toString)
    assert(got("tie") == ((4L, 2L, "a a a a a a a a", 2L, 5000L, true)),
      got("tie").toString)
    assert(got("shorty") == ((1L, 1L, "tiny doc here", 1L, 10000L, true)),
      got("shorty").toString)
    // corpus: the census equals a driver-side recompute at sf
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ref = docs.groupBy(_._1).map { case (src, g) =>
      val prefixes = g.map(_._2.split(" ").filter(_.nonEmpty).take(8).mkString(" "))
      val counts = prefixes.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      val (mp, mn) = counts.toSeq.sortBy { case (p, n) => (-n, p) }.head
      src -> ((g.length.toLong, counts.size.toLong, mp, mn,
        mn * 10000 / g.length, mn * 10000 / g.length >= 2000))
    }
    val gotSf = TextAnalysis.q304TemplatePrefix(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_prefixes"),
          r.getAs[String]("modal_prefix"), r.getAs[Long]("modal_n"),
          r.getAs[Long]("modal_bp"), r.getAs[Boolean]("templated")))).toMap
    assert(gotSf == ref, s"got $gotSf\nref $ref")
  }
}
