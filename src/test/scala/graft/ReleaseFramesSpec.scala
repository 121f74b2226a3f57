package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextAnalysis}

/** Real release frames for the drift/delta pair (r15 verdict #4): two
  * CommitLog VERSIONS wired end-to-end through `embeddingDriftOf` (q201)
  * and `releaseWaterfallDeltaOf` (q284). The stand-in queries split one
  * table by id parity; here the SAME rows are published as two actual
  * commit versions, releases are derived from version MEMBERSHIP (not
  * parity), and each kernel's output must equal the stand-in's exactly —
  * so the deterministic oracle rows and the production release path are
  * provably the same math.
  */
class ReleaseFramesSpec extends AnyFunSuite {
  import TestSpark._

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("q201 over two CommitLog versions equals the parity stand-in on identical data") {
    val root = Files.createTempDirectory("graft-rel-emb").toString + "/tbl"
    val e = Tables.embeddings(spark, sf)
    // release 0 ships as version 1; release 1 lands as version 2's delta
    assert(CommitLog.append(e.filter(col("vec_id") % 2 === 0), root) == Some(1L))
    assert(CommitLog.append(e.filter(col("vec_id") % 2 === 1), root) == Some(2L))
    val ref = CommitLog.snapshot(spark, root, asOf = 1)
    // the candidate release = exactly the rows version 2 ADDED (version
    // diff by key, not parity arithmetic)
    val cand = CommitLog.snapshot(spark, root, asOf = 2)
      .join(ref.select(col("vec_id")), Seq("vec_id"), "left_anti")
    sameRows(
      Similarity.embeddingDriftOf(ref, cand).orderBy("dim"),
      Similarity.q201EmbeddingDrift(spark, sf).orderBy("dim"))
  }

  test("q284 over two CommitLog versions equals the parity stand-in on identical data") {
    val root = Files.createTempDirectory("graft-rel-doc").toString + "/tbl"
    val d = Tables.documents(spark, sf)
    assert(CommitLog.append(d.filter(col("doc_id") % 2 === 0), root) == Some(1L))
    assert(CommitLog.append(d.filter(col("doc_id") % 2 === 1), root) == Some(2L))
    // the production shape: ONE corpus read from the table head, each doc
    // tagged with the release that introduced it (version membership) —
    // the pipeline stays global across releases, exactly as q284 demands
    val v1ids = CommitLog.snapshot(spark, root, asOf = 1)
      .select(col("doc_id"), lit(0).as("rel0"))
    val head = CommitLog.snapshot(spark, root)
    val flagged = TextAnalysis.waterfallFlagsOf(head)
      .join(broadcast(v1ids), Seq("doc_id"), "left")
      .withColumn("release", coalesce(col("rel0"), lit(1)).cast("int"))
      .drop("rel0")
    sameRows(
      TextAnalysis.releaseWaterfallDeltaOf(flagged).orderBy("stage"),
      TextAnalysis.q284ReleaseWaterfallDelta(spark, sf).orderBy("stage"))
  }

  test("a third release (version 3) shifts the delta: the real path tracks new data, not parity") {
    // regression guard: the version-membership path must NOT be secretly
    // reading id parity — a v3 whose ids are all EVEN must land in
    // release 1's side of a (v1 | v2∪v3) split and change the report
    val root = Files.createTempDirectory("graft-rel-emb3").toString + "/tbl"
    val e = Tables.embeddings(spark, sf)
    CommitLog.append(e.filter(col("vec_id") % 2 === 0), root)
    CommitLog.append(e.filter(col("vec_id") % 2 === 1), root)
    // v3: even-id vectors re-embedded with a +0.5 shift on dim 0 — a real
    // model change arriving as a new release delta
    val shifted = e.filter(col("vec_id") % 2 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        transform(col("embedding"), (v, i) =>
          when(i === 0, v + lit(0.5f)).otherwise(v)))
    CommitLog.append(shifted, root)
    val ref = CommitLog.snapshot(spark, root, asOf = 1)
    val cand = CommitLog.snapshot(spark, root)
      .join(ref.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val drift = Similarity.embeddingDriftOf(ref, cand).collect()
    val dim0 = drift.find(_.getAs[Long]("dim") == 0L).get
    assert(dim0.getAs[Boolean]("drifted"),
      s"planted +0.5 shift on dim 0 must trip the gate: $dim0")
    // and the candidate side counts BOTH releases' vectors
    val nCand = dim0.getAs[Long]("n_cand")
    val nRef = dim0.getAs[Long]("n_ref")
    assert(nCand == 2 * nRef, s"n_cand $nCand != 2×n_ref $nRef")
  }
}
