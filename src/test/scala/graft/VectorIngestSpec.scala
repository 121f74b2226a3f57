package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfIndex
import graft.streaming.{SemanticGate, VectorIngest}

/** s14: streaming vector ingest — atomic batch-id publish into the serving
  * index, replay no-ops, crash-litter invisibility, live probes, and
  * compaction equivalence.
  */
class VectorIngestSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.Row

  private def freshIndex(): String = {
    val d = Files.createTempDirectory("graft-vingest").toString
    IvfIndex.build(spark, sf, d, k = 16, iters = 3)
    d
  }

  /** A batch of new vectors cloned from existing embeddings with fresh ids
    * (so their nearest neighbor is known: the vector they were cloned from).
    */
  private def cloneBatch(idOffset: Long, mod: Int): org.apache.spark.sql.DataFrame =
    Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === mod)
      .select((col("vec_id") + idOffset).as("vec_id"), col("embedding"))

  test("publish is atomic and replay-idempotent; staging litter is invisible") {
    val dir = freshIndex()
    val batch = cloneBatch(100000L, 7)
    val n = batch.count()
    assert(n > 0)
    VectorIngest.publish(spark, dir, batch, batchId = 0L)
    val lane = spark.read.parquet(s"$dir/ingest")
    assert(lane.count() == n)
    // replay of batch 0 with DIFFERENT content must be a no-op: the
    // committed generation wins (the retry-after-lost-success case)
    VectorIngest.publish(spark, dir, cloneBatch(200000L, 11), batchId = 0L)
    assert(spark.read.parquet(s"$dir/ingest").count() == n)
    // a crashed stage (no rename) leaves only dot-litter readers skip
    cloneBatch(300000L, 13)
      .withColumn("cell", lit(1))
      .write.mode("overwrite").parquet(s"$dir/ingest/.staging-99-crashed")
    assert(spark.read.parquet(s"$dir/ingest").count() == n)
  }

  test("probeLive serves streamed vectors immediately; compact folds them into the base") {
    val dir = freshIndex()
    // ingested vectors are REVERSED copies of existing embeddings — a
    // direction not present in the base corpus (cosine is not
    // permutation-invariant) — and the queries carry the same reversed
    // embeddings under non-colliding ids, so the only exact match for each
    // query is its ingested twin
    val reversedBatch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 7)
      .select((col("vec_id") + 100000L).as("vec_id"), reverse(col("embedding")).as("embedding"))
    val probeQs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 7)
      .select((col("vec_id") + 900000L).as("query_id"), reverse(col("embedding")).as("qe"))
    val before = IvfIndex.probe(spark, dir, probeQs, nprobe = 16)
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("cos_sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    VectorIngest.publish(spark, dir, reversedBatch, batchId = 0L)
    val after = VectorIngest.probeLive(spark, dir, probeQs, nprobe = 16)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(after.nonEmpty)
    // every query's top-1 is now its ingested clone at cosine 1.0 (the
    // clone shares the exact embedding; ids were offset to avoid the
    // self-match exclusion)
    after.foreach { case (qid, nid, cs) =>
      assert(nid == qid - 900000L + 100000L, s"query $qid matched $nid")
      assert(cs == 1.0, s"query $qid top cosine $cs")
    }
    assert(before.values.forall(_ < 1.0), "reversed vectors must not pre-exist in the base")
    // compaction: same results served from the base layout, lane emptied
    val folded = VectorIngest.compact(spark, dir)
    assert(folded == Seq(0L))
    val compacted = IvfIndex.probe(spark, dir, probeQs, nprobe = 16)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(compacted == after.toSet)
    assert(VectorIngest.compact(spark, dir).isEmpty) // nothing left to fold
  }

  test("ingestStream applies micro-batches as committed generations") {
    val dir = freshIndex()
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Array[Float])]
    val stream = ms.toDF().toDF("vec_id", "embedding")
    val b1 = Tables.embeddings(spark, sf).filter(col("vec_id") % 50 === 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = VectorIngest.ingestStream(spark, dir, stream)
    try {
      ms.addData(b1.toSeq)
      q.processAllAvailable()
      val gens = new java.io.File(s"$dir/ingest").listFiles()
        .filter(_.getName.startsWith("gen=")).map(_.getName).sorted
      assert(gens.nonEmpty)
      assert(spark.read.parquet(s"$dir/ingest").count() == b1.length)
      // second tranche → a later generation, cumulative lane
      val b2 = b1.map { case (id, e) => (id + 100000L, e) }
      ms.addData(b2.toSeq)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/ingest").count() == 2L * b1.length)
      assert(new java.io.File(s"$dir/ingest").listFiles()
        .count(_.getName.startsWith("gen=")) == 2)
    } finally q.stop()
  }

  test("dimension mismatch is rejected before any file lands") {
    val dir = freshIndex()
    import spark.implicits._
    val bad = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorIngest.publish(spark, dir, bad, batchId = 5L)
    }
    assert(e.getMessage.contains("does not match the stored model"))
    assert(!new java.io.File(s"$dir/ingest/gen=5").exists())
  }

  test("s19 semantic gate: resident twins rejected, batch twins collapse, replay + crash recovery") {
    val dir = freshIndex()
    import spark.implicits._
    val resident = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 100).head().getSeq[Float](1)
    val novel = Seq.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val batch = Seq(
      (900001L, resident), // exact clone of a resident vector -> resident_dup
      (900002L, novel),    // fresh direction -> admitted
      (900003L, novel)     // twin of 900002 in the SAME batch -> batch_dup
    ).toDF("vec_id", "embedding")
    assert(SemanticGate.gateBatch(spark, dir, batch, batchId = 5L))
    val lane = spark.read.parquet(s"$dir/ingest")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lane == Set(900002L), s"ingest lane: $lane")
    val rej = spark.read.parquet(s"$dir/rejects")
      .select("vec_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rej == Map(900001L -> "resident_dup", 900003L -> "batch_dup"), s"rejects: $rej")
    // replay of a decided batch id is a no-op (ingest commit = decision marker)
    assert(!SemanticGate.gateBatch(spark, dir, batch, batchId = 5L))
    assert(spark.read.parquet(s"$dir/ingest").count() == 1)
    // the admitted vector serves immediately
    val hit = VectorIngest.probeLive(spark, dir,
        Seq((1L, novel)).toDF("query_id", "qe"))
      .orderBy(col("rnk")).head()
    assert(hit.getAs[Long]("neighbor_id") == 900002L &&
      hit.getAs[Double]("cos_sim") == 1.0)
    // crash between the two commits: rejects landed, ingest did not —
    // the replay re-lands only the missing ingest half
    val batch9 = Seq((900010L, resident), (900011L, novel.map(-_)))
      .toDF("vec_id", "embedding")
    assert(SemanticGate.gateBatch(spark, dir, batch9, batchId = 9L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/ingest/gen=9"), true)
    assert(SemanticGate.gateBatch(spark, dir, batch9, batchId = 9L),
      "replay after crash must re-decide")
    assert(spark.read.parquet(s"$dir/ingest/gen=9")
      .select("vec_id").collect().map(_.getLong(0)).toSet == Set(900011L))
    assert(spark.read.parquet(s"$dir/rejects/gen=9")
      .select("vec_id").collect().map(_.getLong(0)).toSet == Set(900010L))
  }
}
