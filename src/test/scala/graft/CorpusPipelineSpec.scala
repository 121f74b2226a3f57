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

    val counts = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage counts shrink monotonically raw → published
    val order = Seq("raw", "quality_filtered", "exact_deduped",
      "near_dup_collapsed", "decontaminated", "published")
    val seq = order.map(counts)
    assert(seq.zip(seq.tail).forall { case (a, b) => b <= a }, s"not monotone: $counts")
    assert(counts("published") > 0)
    assert(counts("published") == counts("decontaminated"))

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
  }
}
