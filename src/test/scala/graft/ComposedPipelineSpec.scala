package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Safety, TextAnalysis}
import graft.streaming.{CrawlIngest, DecontamGate, FrontDoorGate, SafetyGate, WaterfallMonitor}

/** The composed streaming pipeline (r15 verdict #5): s21 WARC ingest →
  * s16 front door → s31 decontamination → s20 safety, chained through
  * REAL micro-batches (each stage stream-reads the previous stage's
  * published generations), with the s32 waterfall monitor riding the
  * ingested corpus — one corpus in, published + per-gate quarantines out.
  * Every stage's published set and quarantine mass must equal the batch
  * composition of the SAME shared kernels over the same corpus, and the
  * monitor's maintained funnel must equal the one-shot batch fold — so
  * drift between the composed online pipeline and the batch kernels
  * cannot ship silently.
  */
class ComposedPipelineSpec extends AnyFunSuite {
  import TestSpark._

  private val CRLF = "\r\n"

  private def record(uri: String, body: String, idx: Int): Array[Byte] = {
    val bodyB = body.getBytes(StandardCharsets.UTF_8)
    val block = (s"HTTP/1.1 200 OK$CRLF" +
      s"Content-Type: text/html; charset=utf-8$CRLF" +
      s"Content-Length: ${bodyB.length}$CRLF" + CRLF)
      .getBytes(StandardCharsets.US_ASCII) ++ bodyB
    val head = (s"WARC/1.0$CRLF" +
      s"WARC-Type: response$CRLF" +
      s"WARC-Target-URI: $uri$CRLF" +
      s"WARC-Date: 2024-01-0${1 + idx % 9}T00:00:00Z$CRLF" +
      s"WARC-Record-ID: <urn:uuid:rec-$idx>$CRLF" +
      s"Content-Type: application/http;msgtype=response$CRLF" +
      s"Content-Length: ${block.length}$CRLF" + CRLF).getBytes(StandardCharsets.US_ASCII)
    head ++ block ++ (CRLF + CRLF).getBytes(StandardCharsets.US_ASCII)
  }

  // prose long enough (and stopword-laden enough) to clear the quality
  // gate the s32 monitor applies; each body is one future document
  private val proseA = ("the city pipeline keeps a careful record of " +
    "every trip and the counters stay honest because the gates are " +
    "checked in order and the documents flow through them one batch at " +
    "a time while the monitor watches the totals with some patience")
  private val proseBad = proseA + " but this one contains selfharmterm inline"
  private val navPage = "<ul>" + (1 to 8).map(i =>
    s"""<li><a href="/p$i">Navigation item number $i</a></li>""").mkString + "</ul>"
  private val benchText =
    "the quick brown fox jumps over the lazy dog again today it seems"
  private val proseContam = ("an otherwise unremarkable page where the " +
    "phrase quick brown fox jumps over appears verbatim inside the " +
    "running text of the document so the decontamination gate must act " +
    "on it while the other gates let the very same words pass through")
  private val proseE = ("another perfectly calm document about the " +
    "weekly demand for trips across the river where the planner reads " +
    "the persistence table and decides that the habit zones deserve a " +
    "fixed stand while the festival zones get a temporary one instead")

  private def docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private def triageSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lane", StringType),
    StructField("clean_text", StringType)))

  private def idText(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet

  test("s21→s16→s31→s20 chained streams + s32 monitor equal the batch composition stage-for-stage") {
    val root = Files.createTempDirectory("graft-composed").toString
    val landing = s"$root/landing"
    Files.createDirectories(Paths.get(landing))
    def dirs(n: String) = (s"$root/$n/pub", s"$root/$n/quar", s"$root/$n/ckpt")
    val (pub1, quar1, ck1) = dirs("ingest")
    val (pub2, quar2, ck2) = dirs("frontdoor")
    val (pub3, quar3, ck3) = dirs("decontam")
    val (pub4, quar4, ck4) = dirs("safety")

    import spark.implicits._
    val benchDocs = Seq((9000L, benchText)).toDF("doc_id", "text")
    val benchGrams = TextAnalysis.nGrams(benchDocs, 5)
      .select(col("g")).distinct().localCheckpoint()

    // wave 1 lands before the chain starts
    Files.write(Paths.get(s"$landing/a0.warc"),
      record("http://x.example/a", proseA, 0) ++
        record("http://x.example/bad", proseBad, 1) ++
        record("http://x.example/nav", navPage, 2))

    val q1 = CrawlIngest.ingestStream(spark, landing, pub1, quar1, ck1)
    val q2 = FrontDoorGate.triagedStream(spark,
      spark.readStream.schema(docSchema).parquet(s"$pub1/gen=*"),
      pub2, quar2, ck2)
    val q3 = DecontamGate.gatedStream(spark,
      spark.readStream.schema(triageSchema).parquet(s"$pub2/gen=*")
        .select(col("doc_id"), col("clean_text").as("text")),
      benchDocs, pub3, quar3, ck3)
    val q4 = SafetyGate.gatedStream(spark,
      spark.readStream.schema(docSchema).parquet(s"$pub3/gen=*"),
      pub4, quar4, ck4)
    // the monitor rides the INGESTED corpus (pub1): maintained funnel +
    // cross-batch first-wins dedup state, s32's published-state idiom
    val counters = scala.collection.mutable.Map.empty[String, Array[Long]]
    val seenHashes = scala.collection.mutable.Set.empty[String]
    var lastApplied = Option.empty[Long]
    def store(): Option[(DataFrame, DataFrame, Long)] = lastApplied.map { id =>
      (counters.toSeq.map { case (s0, a) =>
        (s0, a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7))
      }.toDF("source", "n0", "t0", "n1", "t1", "n2", "t2", "n3", "t3"),
        seenHashes.toSeq.toDF("content_hash"), id)
    }
    def publishDelta(delta: DataFrame, hashes: DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        counters(r.getAs[String]("source")) =
          Array("n0", "t0", "n1", "t1", "n2", "t2", "n3", "t3")
            .map(c => r.getAs[Long](c))
      }
      hashes.collect().foreach(r => seenHashes += r.getAs[String]("content_hash"))
      lastApplied = Some(batchId)
    }
    val qm = WaterfallMonitor.waterfallMonitorStream(
      spark.readStream.schema(docSchema).parquet(s"$pub1/gen=*")
        .withColumn("source", lit("crawl")),
      benchDocs, store _)(publishDelta)
      .option("checkpointLocation", s"$root/monitor/ckpt").start()

    def drain(): Unit = {
      q1.processAllAvailable(); q2.processAllAvailable()
      q3.processAllAvailable(); q4.processAllAvailable()
      qm.processAllAvailable()
    }
    try {
      drain()
      // wave 2 lands MID-STREAM: a contaminated doc, a fresh clean doc,
      // and a VERBATIM duplicate of wave 1's text under a new uri (the
      // monitor's cross-batch first-wins case)
      Files.write(Paths.get(s"$landing/a1.warc"),
        record("http://y.example/contam", proseContam, 0) ++
          record("http://y.example/e", proseE, 1) ++
          record("http://y.example/dup", proseA, 2))
      drain()
    } finally { Seq(q1, q2, q3, q4, qm).foreach(_.stop()) }

    // ---- the batch mirror: same corpus, same shared kernels, one shot ----
    val docs0 = CorpusPipeline.fromWarc(spark, landing)
    val r1 = Safety.route(docs0)
    val m1 = r1.filter(col("lane") === "clean").select(col("doc_id"), col("text"))
    val t2 = TextAnalysis.markupExtract(m1)
    val m2 = t2.filter(not(col("lane").startsWith("quarantine")))
      .select(col("doc_id"), col("lane"), col("clean_text"))
    val m2docs = m2.select(col("doc_id"), col("clean_text").as("text"))
    val contam = TextAnalysis.contaminatedGramsOf(m2docs, benchGrams)
      .select(col("doc_id"))
    val m3 = m2docs.join(contam, Seq("doc_id"), "left_anti")
    val r4 = Safety.route(m3)
    val m4 = r4.filter(col("lane") === "clean").select(col("doc_id"), col("text"))

    // stage-for-stage: published sets identical, quarantine masses identical
    assert(idText(spark.read.parquet(pub1)) == idText(m1), "ingest stage drifted")
    assert(spark.read.parquet(quar1).count() ==
      r1.filter(col("lane") =!= "clean").count(), "ingest quarantine mass")
    val pub2got = spark.read.parquet(pub2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"))).toSet
    assert(pub2got == m2.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"))).toSet,
      "front-door stage drifted")
    assert(spark.read.parquet(quar2).count() ==
      t2.filter(col("lane").startsWith("quarantine")).count(), "front-door quarantine mass")
    assert(idText(spark.read.parquet(pub3)) == idText(m3), "decontam stage drifted")
    assert(spark.read.parquet(quar3).count() == contam.count(), "decontam quarantine mass")
    assert(idText(spark.read.parquet(pub4)) == idText(m4), "safety stage drifted")
    assert(spark.read.parquet(quar4).count() ==
      r4.filter(col("lane") =!= "clean").count(), "safety quarantine mass")

    // the planted shape actually exercised every gate
    assert(spark.read.parquet(quar1).count() == 1) // selfharm at ingest
    assert(spark.read.parquet(quar2).count() == 1) // nav page at the front door
    assert(spark.read.parquet(quar3).count() == 1) // benchmark 5-gram
    assert(spark.read.parquet(pub4).count() == 3)  // proseA + proseE + dup

    // ---- the monitor equals the one-shot batch fold over the same corpus:
    // maintained counters (built across two micro-batches with carried
    // dedup state) == q268's flags+counts kernels applied once; the
    // verbatim duplicate must be counted at stage 2 exactly once
    val corpus = spark.read.parquet(pub1).withColumn("source", lit("crawl"))
    val emptySeen = Seq.empty[String].toDF("content_hash")
    val oneShot = TextAnalysis.waterfallStages(TextAnalysis.waterfallCounts(
      WaterfallMonitor.flaggedOf(corpus, benchGrams, emptySeen))).collect()
      .map(_.toSeq).toSet
    val maintained = WaterfallMonitor.profile(store().get._1).collect()
      .map(_.toSeq).toSet
    assert(maintained == oneShot, s"maintained funnel drifted:\n$maintained\nvs\n$oneShot")
    // and the dedup stage really dropped one doc (the wave-2 duplicate)
    val stages = WaterfallMonitor.profile(store().get._1).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(stages("0_raw") == 5L && stages("2_exact_dedup") == stages("1_quality") - 1,
      s"expected the cross-batch duplicate to fall at dedup: $stages")
  }
}
