package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.CommitLog
import graft.operators.Dedup

/** s38: streaming near-dup CLUSTER-MAP maintenance THROUGH the CommitLog —
  * the q56 cluster table as a standing, versioned, incrementally-merged
  * corpus asset instead of a per-release rebuild. Each document
  * micro-batch:
  *
  *  1. band-signs the batch (`fastBandSignaturesOf` — the q49 xxhash64
  *     production path; only the batch is ever shingled),
  *  2. finds candidate pairs WITHIN the batch ([[Dedup.expandPairs]]) and
  *     BETWEEN batch and history ([[Dedup.crossCandidatePairs]] against
  *     the published signature table — touched-bucket-pruned, so the
  *     corpus-scale side is read only where the batch lands),
  *  3. folds the pairs into the map via [[Dedup.mergeClusterBatchDelta]]
  *     — connected components re-run over TOUCHED components only
  *     (published clusters re-enter as star edges to their min-id root),
  *     so compute is O(touched), never O(corpus),
  *  4. upserts the delta as ONE `CommitLog.merge` version on the map
  *     table (delta-sized file rewrites: untouched files keep identity —
  *     the s23 property, here for cluster rows), and
  *  5. appends the batch's signatures as ONE version on the signature
  *     table — the state the NEXT batch's cross-pair join probes.
  *
  * What the CommitLog idiom buys over s-series parquet state: the
  * maintained map is a real versioned table — `VERSION AS OF n` is
  * "cluster assignments as of batch n" (a reproducibility primitive:
  * pin the exact dedup state a training run consumed), `history` is the
  * ingest audit, CDC (`changesSince`) feeds downstream re-canonicalizers
  * only the memberships that actually moved, and the SQL catalog serves
  * all of it to plain SQL.
  *
  * Exactly-once across TWO roots: the map merge commits FIRST under
  * token `cluster-map-batch-<id>`, then the signature append under
  * `cluster-sigs-batch-<id>` — a crash between the two replays the
  * batch, the merge no-ops on its token (before any data write), the
  * append heals; a crash after both no-ops both. Order matters: were
  * signatures committed first, a crash would let the re-run's cross
  * join see the batch's OWN signatures as history. `checkpointDir` is
  * required and the two roots take one stream each (the s22/s23 token
  * contract). Batches whose pairs touch nothing commit no map version
  * (an empty merge would be a no-op version; the signature append still
  * records the batch).
  *
  * Invariant (spec-pinned): after any batch cadence, the maintained map
  * equals the batch rebuild `connectedComponents(fastCandidatePairs(all
  * docs so far))` row-for-row — pair coverage is exact because
  * within-batch ∪ batch↔history = all-pairs over the union (both sides
  * inherit the band machinery's hot-bucket cap; a degenerate
  * constant-text corpus degrades both paths identically).
  */
object ClusterSink {

  private[graft] def mapToken(batchId: Long): String = s"cluster-map-batch-$batchId"
  private[graft] def sigToken(batchId: Long): String = s"cluster-sigs-batch-$batchId"

  private val MapSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster_id", LongType)))

  def clusterStream(docs: DataFrame, mapRoot: String, sigRoot: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), mapRoot, sigRoot, batchId)
      }
      .start()

  /** One micro-batch applied to the two maintained tables — factored out
    * so specs can drive crash/replay schedules batch-at-a-time. */
  private[graft] def applyBatch(batch: DataFrame, mapRoot: String,
      sigRoot: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val sigs = Dedup.fastBandSignaturesOf(batch).localCheckpoint()
    val within = Dedup.expandPairs(s, sigs)
      .select(col("doc_a"), col("doc_b"))
    val pairs =
      if (CommitLog.headVersion(s, sigRoot) == 0L) within // bootstrap
      else within.unionByName(
        Dedup.crossCandidatePairs(sigs, CommitLog.snapshot(s, sigRoot)))
    val published =
      if (CommitLog.headVersion(s, mapRoot) == 0L)
        s.createDataFrame(new java.util.ArrayList[Row](), MapSchema)
      else CommitLog.snapshot(s, mapRoot)
    val delta = Dedup.mergeClusterBatchDelta(published, pairs).localCheckpoint()
    if (!delta.isEmpty)
      CommitLog.merge(delta, mapRoot, "doc_id",
        statsFor = Some(Seq("doc_id")), txnId = Some(mapToken(batchId))): Unit
    CommitLog.append(sigs, sigRoot, txnId = Some(sigToken(batchId))): Unit
  }
}
