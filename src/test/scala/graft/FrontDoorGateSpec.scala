package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FrontDoorGate

/** s16's stream element (top-level: Spark encoders can't see inner-class
  * scope). */
case class RawDoc(doc_id: Long, text: String)

/** s34's stream element. */
case class Vec(vec_id: Long, label: Int, embedding: Seq[Float])

/** s16: streaming front-door triage — per-row lane split with dual atomic
  * generation commits; replays idempotent, half-committed batches heal.
  */
class FrontDoorGateSpec extends AnyFunSuite {
  import TestSpark._

  private val prose =
    "a perfectly ordinary prose document with no markup whatsoever in it"
  private val navPage = "<ul>" + (1 to 8).map(i =>
    s"""<li><a href="/p$i">Navigation item number $i</a></li>""").mkString + "</ul>"

  test("mixed batch splits across both roots; replay and half-commit recovery are safe") {
    val root = Files.createTempDirectory("graft-frontdoor").toString
    val (pub, quar) = (s"$root/published", s"$root/quarantine")
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[RawDoc]
    val q = FrontDoorGate.triagedStream(spark, ms.toDF(), pub, quar, s"$root/ckpt")
    try {
      ms.addData(RawDoc(1, prose), RawDoc(2, navPage), RawDoc(3, prose + " again"))
      q.processAllAvailable()
      // per-row split: the SAME batch commits a generation under BOTH roots
      assert(new java.io.File(s"$pub/gen=0").exists())
      assert(new java.io.File(s"$quar/gen=0").exists())
      val published = spark.read.parquet(pub)
      assert(published.count() == 2 &&
        published.filter(col("doc_id") === 2).count() == 0)
      // clean rows carry EXTRACTED text; quarantine carries the ORIGINAL
      assert(published.filter(col("doc_id") === 1).head().getAs[String]("clean_text") == prose)
      val held = spark.read.parquet(quar)
      assert(held.count() == 1)
      val h = held.head()
      assert(h.getAs[Long]("doc_id") == 2 &&
        h.getAs[String]("lane") == "quarantine_boilerplate" &&
        h.getAs[String]("text") == navPage)
    } finally q.stop()
    // replay of a committed id with DIFFERENT content: full no-op
    import spark.implicits._
    val replay = Seq(RawDoc(99, prose)).toDF()
    FrontDoorGate.triageBatch(spark, replay, 0L, pub, quar)
    assert(spark.read.parquet(pub).count() == 2)
    assert(spark.read.parquet(quar).count() == 1)
    // crash between the two commits: delete the quarantine half, replay
    // the ORIGINAL batch — only the missing half is written back
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$quar/gen=0"))
    val original = Seq(RawDoc(1, prose), RawDoc(2, navPage),
      RawDoc(3, prose + " again")).toDF()
    FrontDoorGate.triageBatch(spark, original, 0L, pub, quar)
    assert(spark.read.parquet(pub).count() == 2, "published half must not duplicate")
    assert(spark.read.parquet(quar).count() == 1, "quarantine half healed")
  }

  test("all-clean batch still commits an (empty) quarantine generation") {
    val root = Files.createTempDirectory("graft-frontdoor2").toString
    val (pub, quar) = (s"$root/published", s"$root/quarantine")
    import spark.implicits._
    FrontDoorGate.triageBatch(spark, Seq(RawDoc(1, prose)).toDF(), 0L, pub, quar)
    assert(new java.io.File(s"$pub/gen=0").exists())
    // the empty generation is what makes half-commit detection per-root
    // sound: its existence marks "this root's share of batch 0 is done"
    assert(new java.io.File(s"$quar/gen=0").exists())
    assert(spark.read.parquet(s"$quar/gen=0").count() == 0)
  }

  test("s34 label gate: frozen centroids split the stream; verdict IS q278's kernel; replay no-op") {
    val root = Files.createTempDirectory("graft-labelgate").toString
    val (pub, quar) = (s"$root/published", s"$root/quarantine")
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val refDir = TestSpark.sf
    val centers = graft.operators.Similarity.labelCenters(spark, refDir)
    // planted: a vector AT label 0's centroid claiming label 0 publishes;
    // the same vector claiming another label quarantines tagged nearest=0
    val c0 = centers.head
    val other = centers(1)._1
    // ...and a ZERO-NORM vector: no cosine to any centroid exists, so the
    // shared projection yields nearest = NULL and the gate must route it
    // to quarantine — not publish it as "confidently label 0" (the NaN
    // sort-greatest trap), and not drop it between two non-matching lanes
    val planted = Seq(
      Vec(900L, c0._1, c0._2.map(_.toFloat)),
      Vec(901L, other, c0._2.map(_.toFloat)),
      Vec(902L, c0._1, c0._2.map(_ => 0.0f)))
    // plus the real reference vectors: the gate must re-derive q278's
    // per-vector assignment exactly
    val real = Tables.embeddings(spark, refDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => Vec(r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    val ms = MemoryStream[Vec]
    val q = graft.streaming.LabelGate.gatedStream(
      spark, ms.toDF(), refDir, pub, quar, s"$root/ckpt")
    try {
      ms.addData(planted: _*); q.processAllAvailable()
      ms.addData(real.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val held = spark.read.parquet(quar).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        Option(r.getAs[java.lang.Integer]("nearest")).map(_.toInt)).toMap
    val published = spark.read.parquet(pub).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(published.contains(900L) && held.get(901L).flatten.contains(c0._1))
    assert(!published.contains(902L) && held.get(902L).contains(None),
      "zero-norm vector must quarantine with nearest = NULL")
    // driver recompute of q278's assignment over the reference vectors
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val wantQuar = real.filter { v =>
      val e = v.embedding.map(_.toDouble)
      val nearest = centers
        .map { case (l, c) => (math.rint(cos(e, c) * 1e6) / 1e6, l) }
        .sortBy { case (s0, l) => (-s0, l) }.head._2
      nearest != v.label
    }.map(_.vec_id).toSet
    assert(held.keySet - 901L - 902L == wantQuar,
      "gate verdict drifted from q278's kernel")
    assert((published - 900L) == real.map(_.vec_id).toSet -- wantQuar)
    // replay of a committed id: full no-op
    graft.streaming.LabelGate.gateBatch(spark,
      Seq(Vec(999L, other, c0._2.map(_.toFloat))).toDF(), 0L, centers, pub, quar)
    assert(!spark.read.parquet(quar).collect().map(_.getAs[Long]("vec_id")).contains(999L))
  }

  test("s31 decontamination gate: frozen bench grams split the stream; verdict IS q58's kernel; replay no-op") {
    val root = Files.createTempDirectory("graft-decontam").toString
    val (pub, quar) = (s"$root/published", s"$root/quarantine")
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // benchmark: one 13-word eval doc; stream: doc 1 embeds one of its
    // 5-windows (contaminated, 1 distinct matched gram), doc 2 embeds a
    // 6-window (2 matched grams), doc 3 is clean
    val benchText = (0 to 12).map(i => s"e$i").mkString(" ")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val d1 = "x1 e3 e4 e5 e6 e7 x2"
    val d2 = "y1 e0 e1 e2 e3 e4 e5 y2"
    val d3 = "z1 z2 z3 z4 z5 z6 z7"
    val ms = MemoryStream[RawDoc]
    val q = graft.streaming.DecontamGate.gatedStream(
      spark, ms.toDF(), bench, pub, quar, s"$root/ckpt")
    try {
      ms.addData(RawDoc(1, d1), RawDoc(2, d2))
      q.processAllAvailable()
      ms.addData(RawDoc(3, d3))
      q.processAllAvailable()
    } finally q.stop()
    val published = spark.read.parquet(pub).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(published == Set(3L), s"published $published")
    val held = spark.read.parquet(quar).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated_grams"))
      .toMap
    assert(held == Map(1L -> 1L, 2L -> 2L), s"quarantined $held")
    // the gate's verdict is q58's kernel verbatim: recompute via the
    // shared probe over the same frozen set
    val benchGrams = graft.operators.TextAnalysis.nGrams(bench, 5)
      .select(col("g")).distinct()
    val probe = graft.operators.TextAnalysis.contaminatedGramsOf(
      Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"), benchGrams)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probe == held, "gate verdict drifted from q58's kernel")
    // replay of a committed id with different content: full no-op
    graft.streaming.DecontamGate.gateBatch(spark,
      Seq((9L, d1)).toDF("doc_id", "text"), 0L, benchGrams, pub, quar)
    assert(spark.read.parquet(pub).collect()
      .map(_.getAs[Long]("doc_id")).toSet == Set(3L))
    assert(spark.read.parquet(quar).count() == 2)
  }
}
