package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.ClusterSink

/** s38: the near-dup cluster map as a MAINTAINED CommitLog table —
  * incremental connected components (touched-components merge) landing as
  * delta-sized merge versions, signatures as append versions, with the
  * versioned-table dividends (time travel = "clusters as of batch n",
  * CDC = only moved memberships, SQL catalog reads) spec-pinned. */
class ClusterSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def rebuild(docs: org.apache.spark.sql.DataFrame) =
    Dedup.connectedComponents(
        Dedup.fastCandidatePairs(docs).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("label").as("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def mapOf(root: String) =
    CommitLog.snapshot(spark, root).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap

  test("s38 maintained cluster map: batch-at-a-time merges equal the full rebuild; versions, time travel, CDC, delta-sized rewrites, replay") {
    val s0 = spark
    import s0.implicits._
    val wh = Files.createTempDirectory("graft-clustersink").toString
    val mapRoot = s"$wh/db/clusters"
    val sigRoot = s"$wh/db/cluster_sigs"
    // planted corpus: cluster A (verbatim dups 1,2 then 3 arriving later),
    // cluster B (verbatim dups 10,11), and a singleton 20 — texts long
    // enough to shingle, A/B sharing no gram
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tb = "one two three four five six seven eight nine ten eleven"
    val tc = "solo unique text with nothing shared across any cluster here"
    val b1 = Seq((1L, ta), (2L, ta)).toDF("doc_id", "text")
    val b2 = Seq((10L, tb), (11L, tb), (20L, tc)).toDF("doc_id", "text")
    val b3 = Seq((3L, ta)).toDF("doc_id", "text")

    ClusterSink.applyBatch(b1, mapRoot, sigRoot, 0L)
    val v1 = CommitLog.headVersion(spark, mapRoot)
    assert(mapOf(mapRoot) == Map(1L -> 1L, 2L -> 1L))
    ClusterSink.applyBatch(b2, mapRoot, sigRoot, 1L)
    val filesAfterB2 = CommitLog.liveFiles(spark, mapRoot).toSet
    assert(mapOf(mapRoot) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    val v2 = CommitLog.headVersion(spark, mapRoot)
    ClusterSink.applyBatch(b3, mapRoot, sigRoot, 2L)
    // maintained ≡ the batch rebuild over everything streamed so far —
    // doc 3 joined cluster A through the CROSS pair path (its dup
    // partners live only in the published signature table)
    val all = b1.unionByName(b2).unionByName(b3)
    assert(mapOf(mapRoot) == rebuild(all))
    assert(mapOf(mapRoot)(3L) == 1L)

    // versioned-table dividends: time travel reads "clusters as of batch
    // 1" exactly; history is all merges on the map, all appends on sigs
    val atV1 = CommitLog.snapshot(spark, mapRoot, asOf = v1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(atV1 == Map(1L -> 1L, 2L -> 1L))
    assert(CommitLog.history(spark, mapRoot).collect()
      .map(_.getAs[String]("op")).forall(_ == "merge"))
    assert(CommitLog.history(spark, sigRoot).collect()
      .map(_.getAs[String]("op")).forall(_ == "append"))
    assert(CommitLog.headVersion(spark, sigRoot) == 3L) // one per batch

    // delta-sized: batch 3 touched only cluster A — cluster B's data
    // files keep their IDENTITY across the merge (the CommitLog.merge
    // pruning property, exercised through the sink)
    val filesAfterB3 = CommitLog.liveFiles(spark, mapRoot).toSet
    val bFiles = filesAfterB2.filter { f =>
      CommitLog.statFold(CommitLog.log(spark, mapRoot), "doc_id")
        .get(f).exists(st => st.min >= 10L)
    }
    assert(bFiles.nonEmpty && bFiles.subsetOf(filesAfterB3),
      s"cluster B's files must survive an A-only merge: $bFiles vs $filesAfterB3")

    // CDC: the batch-3 feed carries ONLY the moved/new A memberships
    val (cdc, cursor) = CommitLog.changesSince(spark, mapRoot, v2)
    val moved = cdc.get.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(moved == Set(1L, 2L, 3L), moved.toString)
    assert(cursor == CommitLog.headVersion(spark, mapRoot))

    // exactly-once: replaying batch 3 (same id) commits NOTHING on
    // either root and leaves the map byte-identical
    val (mh, sh) = (CommitLog.headVersion(spark, mapRoot),
      CommitLog.headVersion(spark, sigRoot))
    ClusterSink.applyBatch(b3, mapRoot, sigRoot, 2L)
    assert(CommitLog.headVersion(spark, mapRoot) == mh)
    assert(CommitLog.headVersion(spark, sigRoot) == sh)
    assert(mapOf(mapRoot) == rebuild(all))

    // crash-window heal: the map merge commits, the process dies BEFORE
    // the signature append (the ordered dual-root window) — the replayed
    // batch must no-op the merge on its token and land ONLY the append
    val b4 = Seq((12L, tb)).toDF("doc_id", "text")
    val sigs4 = Dedup.fastBandSignaturesOf(b4).localCheckpoint()
    val pairs4 = Dedup.crossCandidatePairs(sigs4, CommitLog.snapshot(spark, sigRoot))
    val delta4 = Dedup.mergeClusterBatchDelta(
      CommitLog.snapshot(spark, mapRoot), pairs4)
    CommitLog.merge(delta4, mapRoot, "doc_id",
      Some(Seq("doc_id")), Some(ClusterSink.mapToken(3L)))
    val mhCrash = CommitLog.headVersion(spark, mapRoot) // "crash" here
    ClusterSink.applyBatch(b4, mapRoot, sigRoot, 3L)    // engine replay
    assert(CommitLog.headVersion(spark, mapRoot) == mhCrash,
      "replayed merge must no-op on its token")
    assert(CommitLog.headVersion(spark, sigRoot) == sh + 1,
      "the lost signature append must heal")
    assert(mapOf(mapRoot)(12L) == 10L)

    // the SQL catalog serves the maintained map, time travel included
    spark.conf.set("spark.sql.catalog.ccat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ccat.warehouse", wh)
    val viaSql = spark.sql(
      s"SELECT doc_id, cluster_id FROM ccat.db.clusters VERSION AS OF $v1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == atV1)
  }

  test("s38 through the real engine: a MemoryStream of documents maintains the same map as the batch rebuild") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val wh = Files.createTempDirectory("graft-clustersink-ms").toString
    // a real slice of the documents table, split mid-corpus so near-dup
    // families straddle micro-batches
    val docs = Tables.documents(s0, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String)]
    val q = ClusterSink.clusterStream(
      ms.toDS().toDF("doc_id", "text"),
      s"$wh/map", s"$wh/sigs", s"$wh/ckpt")
    try {
      val (h, t) = docs.splitAt(docs.size / 2)
      ms.addData(h); q.processAllAvailable()
      ms.addData(t); q.processAllAvailable()
    } finally q.stop()
    val want = rebuild(Tables.documents(s0, sf).select("doc_id", "text"))
    if (want.isEmpty)
      assert(CommitLog.headVersion(spark, s"$wh/map") == 0L)
    else
      assert(mapOf(s"$wh/map") == want)
  }
}
