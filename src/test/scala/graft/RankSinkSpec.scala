package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RankSink

/** s39: the maintained-table idiom pointed at a graph estimator —
  * streaming incremental PageRank. The invariant is EXACT equality: the
  * maintained rank table after any batch cadence equals q146's integer
  * iteration over the union of all edges observed so far (the
  * collapse-then-iterate discipline makes the per-batch re-derivation
  * O(entity graph), and integer arithmetic makes equality testable). */
class RankSinkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ranksOf(root: String): Map[Long, Long] =
    CommitLog.snapshot(spark, root).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_micro")).toMap

  private def rebuild(edges: Seq[(Long, Long)]): Map[Long, Long] =
    graft.operators.Graph.pagerankOfEdges(
      edges.toDF("src", "dst").groupBy("src", "dst").agg(count(lit(1)).as("w")))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_micro")).toMap

  test("maintained ranks equal the from-scratch iteration after every batch; edge weights accumulate; replays no-op; versions audit") {
    val work = Files.createTempDirectory("graft-ranksink").toString
    val (edgeRoot, rankRoot) = (s"$work/edges", s"$work/ranks")
    val b1 = Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 0L))
    val b2 = Seq((0L, 1L), (2L, 1L), (3L, 0L))
    val b3 = Seq((1L, 0L), (3L, 2L), (3L, 2L))

    RankSink.applyBatch(b1.toDF("src", "dst"), edgeRoot, rankRoot, 1L)
    assert(ranksOf(rankRoot) == rebuild(b1))
    RankSink.applyBatch(b2.toDF("src", "dst"), edgeRoot, rankRoot, 2L)
    assert(ranksOf(rankRoot) == rebuild(b1 ++ b2))
    RankSink.applyBatch(b3.toDF("src", "dst"), edgeRoot, rankRoot, 3L)
    assert(ranksOf(rankRoot) == rebuild(b1 ++ b2 ++ b3))

    // edge weights accumulated across batches, exactly
    val w = CommitLog.snapshot(spark, edgeRoot).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) -> r.getAs[Long]("w")).toMap
    val expected = (b1 ++ b2 ++ b3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(w == expected, s"got $w expected $expected")

    // exactly-once: a full replay of batch 3 no-ops BOTH tables
    val (ev, rv) = (CommitLog.headVersion(spark, edgeRoot),
      CommitLog.headVersion(spark, rankRoot))
    RankSink.applyBatch(b3.toDF("src", "dst"), edgeRoot, rankRoot, 3L)
    assert(CommitLog.headVersion(spark, edgeRoot) == ev, "edge replay must no-op")
    assert(CommitLog.headVersion(spark, rankRoot) == rv, "rank replay must no-op")
    assert(ranksOf(rankRoot) == rebuild(b1 ++ b2 ++ b3))

    // crash WINDOW: the edge merge commits, the process dies BEFORE the
    // rank merge (the ordered dual-root window) — replicate the first
    // half with the engine's own token, then let the replayed batch heal:
    // edge merge no-ops on its token, the rank merge re-derives from the
    // already-updated edge state
    val b4 = Seq((2L, 3L))
    val keyed4 = b4.toDF("src", "dst")
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .select((col("src") * (1L << 20) + col("dst")).as("edge_id"),
        col("src"), col("dst"), col("w"))
    CommitLog.merge(keyed4, edgeRoot, "edge_id",
      Some(Seq("edge_id")), Some(RankSink.edgeToken(4L)))
    val ehCrash = CommitLog.headVersion(spark, edgeRoot) // "crash" here
    RankSink.applyBatch(b4.toDF("src", "dst"), edgeRoot, rankRoot, 4L)
    assert(CommitLog.headVersion(spark, edgeRoot) == ehCrash,
      "replayed edge merge must no-op on its token")
    assert(ranksOf(rankRoot) == rebuild(b1 ++ b2 ++ b3 ++ b4),
      "replay after a rank-side crash must heal to the exact ranking")
    // edge weights were NOT double-counted by the replay
    val w4 = CommitLog.snapshot(spark, edgeRoot)
      .filter(col("src") === 2L && col("dst") === 3L).head().getAs[Long]("w")
    assert(w4 == 1L, s"edge (2,3) double-counted: w=$w4")

    // the versioned audit: rank-as-of-batch-1 is servable and differs
    val v1 = CommitLog.snapshot(spark, rankRoot, asOf = 1L).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_micro")).toMap
    assert(v1 == rebuild(b1), "VERSION AS OF 1 must serve batch 1's ranking")

    // packing guard: out-of-domain node ids decline loudly
    val e = intercept[IllegalArgumentException] {
      RankSink.applyBatch(Seq((-1L, 5L)).toDF("src", "dst"),
        s"$work/edges2", s"$work/ranks2", 1L)
    }
    assert(e.getMessage.contains("collision-free"))
  }
}
