package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Safety, TextAnalysis}

/** q189 char-n-gram language ID and the q190/q191 content-safety lanes —
  * the rows-only contracts the oracle can't carry: planted multi-script
  * documents for language ID, planted unsafe documents for the safety
  * lanes (the shipped synthetic corpus is hit-free by design).
  */
class SafetyLangSpec extends AnyFunSuite {
  import TestSpark._

  // ---------------- q189 language ID ----------------

  private val planted = Seq(
    // non-Latin scripts: decided by Unicode ranges regardless of length
    (1L, "сегодня хорошая погода и мы идем гулять в парк с друзьями", "ru"),
    (2L, "今天天气很好我们和朋友一起去公园散步看看花草树木", "zh"),
    (3L, "الطقس جميل اليوم ونحن ذاهبون إلى الحديقة مع الأصدقاء", "ar"),
    // Latin languages: decided by char-trigram profiles
    (4L, "yesterday we walked to the market and bought some bread for the family", "en"),
    (5L, "gestern sind wir zum markt gegangen und haben brot für die familie gekauft", "de"),
    (6L, "ayer caminamos al mercado y compramos pan para toda la familia", "es"),
    (7L, "hier nous sommes allés au marché et nous avons acheté du pain pour la famille", "fr"),
    // SHORT text — the case q36's whole-stopword heuristic cannot carry
    (8L, "und der hund", "de"),
    (9L, "the cat sat", "en"),
    (10L, "короткий текст", "ru"))

  test("q189 language ID: planted scripts and Latin languages classify correctly") {
    import spark.implicits._
    val docs = planted.map { case (id, text, _) => (id, text) }.toDF("doc_id", "text")
    val got = TextAnalysis.predictLang(docs)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    planted.foreach { case (id, text, expect) =>
      assert(got(id) == expect, s"doc $id ('${text.take(30)}...'): " +
        s"predicted ${got(id)}, expected $expect")
    }
  }

  test("q189 runs over the corpus: one row per doc, known predictions, deterministic") {
    val a = TextAnalysis.q189LangIdNgram(spark, sf).collect()
    assert(a.length == Tables.documents(spark, sf).count())
    val known = Set("en", "de", "es", "fr", "zh", "ru", "ar", "und")
    a.foreach(r => assert(known(r.getAs[String]("pred_lang"))))
    val b = TextAnalysis.q189LangIdNgram(spark, sf).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("langid model: empty/whitespace text is honestly undetermined") {
    import spark.implicits._
    val got = TextAnalysis.predictLang(Seq((1L, ""), (2L, "  !! 42 ")).toDF("doc_id", "text"))
      .select("pred_lang").collect().map(_.getString(0)).toSet
    assert(got == Set("und"))
  }

  // ---------------- q194 compression ratio ----------------

  test("q194 compression ratio: repetitive < prose < random; lanes route; deterministic") {
    import spark.implicits._
    import graft.functions.DeflateLen
    val rnd = new scala.util.Random(5)
    val repetitive = ("lorem ipsum " * 200).trim
    val prose = (1 to 120).map(_ =>
      Seq("the", "garden", "holds", "many", "plants", "and", "birds", "visit",
        "every", "morning", "while", "people", "walk")(rnd.nextInt(13))).mkString(" ")
    // full printable-ASCII randomness (~6.6 bits/byte) — hex randomness is
    // only half-entropy and lands in the prose band, measured 5540 bp
    val random = (1 to 1500).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    val ratios = Seq((1L, repetitive), (2L, prose), (3L, random)).toDF("doc_id", "text")
      .withColumn("r", DeflateLen.of(col("text")) * 10000 /
        length(encode(col("text"), "UTF-8")))
      .collect().map(row => row.getLong(0) -> row.getAs[Any]("r").toString.toDouble).toMap
    assert(ratios(1L) < ratios(2L) && ratios(2L) < ratios(3L),
      s"ordering violated: $ratios")
    // the full operator runs over the corpus: one row per doc, bands sane
    val rows = graft.operators.TextAnalysis.q194CompressionRatio(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, d, bp) = (r.getAs[Long]("n_bytes"), r.getAs[Long]("deflate_len"),
        r.getAs[Long]("ratio_bp"))
      assert(n > 0 && d > 0 && bp == d * 10000 / n, s"row $r inconsistent")
      assert(Set("repetitive", "keep", "random")(r.getAs[String]("lane")))
    }
    val again = graft.operators.TextAnalysis.q194CompressionRatio(spark, sf).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // planted lane routing through the operator's own bands
    val planted = Seq((1L, repetitive, "en", "w"), (3L, random, "en", "w"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q194").toString
    planted.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.q194CompressionRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lane")).toMap
    assert(got(1L) == "repetitive" && got(3L) == "random", got.toString)
  }

  // ---------------- q190/q191 content safety ----------------

  /** Planted corpus dir with documents.parquet: clean prose, category
    * hits, and a shouting doc — both verdict classes well represented. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-safety").toString
    val rnd = new scala.util.Random(7)
    val clean = (1L to 60L).map(i =>
      (i, s"ordinary document number $i about the weather and the market " +
        (1 to 20).map(_ => Seq("bread", "garden", "family", "walk", "book")(rnd.nextInt(5)))
          .mkString(" "), "en", "src_a"))
    val unsafe = Seq(
      (101L, "this mentions nsfwterm once in passing text", "en", "src_a"),
      (102L, "repeated adultterm and nsfwterm and adultterm content", "en", "src_a"),
      (103L, "a goreterm report with violenceterm description", "en", "src_b"),
      (104L, "contains selfharmterm which must hard-block", "en", "src_b"),
      (105L, "BUY NOW!!! AMAZING DEAL!!! CLICK HERE NOW!!! LIMITED TIME!!!", "en", "src_b"))
    (clean ++ unsafe).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q190 rule lane: category hits route with reasons; shipped corpus is all-clean") {
    val rows = Safety.q190ContentSafety(spark, plantedDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lane"), r.getAs[String]("reasons"),
          r.getAs[Long]("score_bp")))).toMap
    // single soft hit → review; stacked hits → blocked; selfharm → blocked
    assert(rows(101L)._1 == "review" && rows(101L)._2.contains("adult"))
    assert(rows(102L)._1 == "blocked" && rows(102L)._3 >= 8000)
    // two violence hits cap at 6000 bp — flagged for review, not blocked
    assert(rows(103L)._1 == "review" && rows(103L)._2 == "violence" &&
      rows(103L)._3 == 6000)
    assert(rows(104L)._1 == "blocked" && rows(104L)._2.contains("selfharm"))
    // the shouting heuristic fires without any blocklist hit
    assert(rows(105L)._1 != "clean" && rows(105L)._2.contains("shouting"))
    // every clean doc is clean with empty reasons and zero category hits
    (1L to 60L).foreach { i =>
      assert(rows(i)._1 == "clean" && rows(i)._2 == "", s"doc $i: ${rows(i)}")
    }
    // the shipped synthetic corpus never trips a placeholder term
    val corpus = Safety.q190ContentSafety(spark, sf)
    assert(corpus.filter(col("n_adult") + col("n_violence") + col("n_selfharm") > 0)
      .count() == 0)
  }

  test("s20 safety gate: per-row dual-root split, replay no-op, half-commit heals") {
    import graft.streaming.SafetyGate
    import spark.implicits._
    val root = Files.createTempDirectory("graft-safetygate").toString
    val (pub, quar) = (s"$root/published", s"$root/quarantine")
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RawDoc]
    val q = SafetyGate.gatedStream(spark, ms.toDF(), pub, quar, s"$root/ckpt")
    try {
      ms.addData(RawDoc(1, "a calm document about gardens and bread"),
        RawDoc(2, "contains selfharmterm so it must hard-block"),
        RawDoc(3, "mentions nsfwterm once for review"))
      q.processAllAvailable()
      assert(new java.io.File(s"$pub/gen=0").exists())
      assert(new java.io.File(s"$quar/gen=0").exists())
      val published = spark.read.parquet(pub)
      assert(published.count() == 1 && published.head().getAs[Long]("doc_id") == 1)
      val held = spark.read.parquet(quar).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("lane"), r.getAs[String]("reasons")))).toMap
      assert(held(2L)._1 == "blocked" && held(2L)._2.contains("selfharm"))
      assert(held(3L)._1 == "review" && held(3L)._2 == "adult")
    } finally q.stop()
    // replay of a committed id: full no-op
    SafetyGate.gateBatch(spark, Seq(RawDoc(99, "anything")).toDF(), 0L, pub, quar)
    assert(spark.read.parquet(pub).count() == 1)
    assert(spark.read.parquet(quar).count() == 2)
    // crash between the two commits: delete the quarantine half, replay
    // the original batch — only the missing half is written back
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$quar/gen=0"))
    val original = Seq(RawDoc(1, "a calm document about gardens and bread"),
      RawDoc(2, "contains selfharmterm so it must hard-block"),
      RawDoc(3, "mentions nsfwterm once for review")).toDF()
    SafetyGate.gateBatch(spark, original, 0L, pub, quar)
    assert(spark.read.parquet(pub).count() == 1, "published half must not duplicate")
    assert(spark.read.parquet(quar).count() == 2, "quarantine half healed")
  }

  test("q191 model lane: distilled scorer agrees >=90% with rules, both classes produced") {
    Safety.invalidateSafetyModelCache()
    val rows = Safety.q191SafetyModel(spark, plantedDir).collect()
    assert(rows.length == 65)
    val agree = rows.count(r =>
      r.getAs[Boolean]("flag_model") == r.getAs[Boolean]("flag_rules"))
    assert(agree >= (rows.length * 0.9).toInt, s"agreement $agree/${rows.length}")
    assert(rows.exists(_.getAs[Boolean]("flag_model")) &&
      rows.exists(!_.getAs[Boolean]("flag_model")), "model is degenerate")
    // deterministic (memoized model + seeded sample)
    val again = Safety.q191SafetyModel(spark, plantedDir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // single-class corpus degenerates honestly: all-clean shipped corpus
    // → every flag_model false is acceptable, no crash, rows complete
    val corpus = Safety.q191SafetyModel(spark, sf).collect()
    assert(corpus.length == Tables.documents(spark, sf).count())
    assert(corpus.forall(!_.getAs[Boolean]("flag_rules")))
  }
}
