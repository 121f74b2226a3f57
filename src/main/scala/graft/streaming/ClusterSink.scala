package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{array, col, explode}
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
  * BOUNDED PROBES (r17 verdict task #2 — the one structural scale
  * hazard found that round): the published sides are never full-scanned
  * per batch. Both maintained tables carry per-file BLOOM metadata in
  * their commits ([[CommitLog.FileBloom]]: `sig` on the signature
  * table; `doc_id` + `cluster_id` on the map), and each batch reads
  * them through [[CommitLog.snapshotProbe]]: only files that MIGHT hold
  * the batch's signature keys (resp. the pairs' touched doc ids, then
  * the touched clusters' ids) are opened. For a mostly-novel stream,
  * old files genuinely lack the new batch's hash keys and are bloom-
  * skipped without a read — per-batch read cost tracks the batch's
  * ACTUAL overlap with history, not the table's age
  * ([[graft.ClusterCensus]] measures exactly this at 1× vs 10×).
  * Superset-safe throughout: the downstream semi-joins re-apply exact
  * key matching, so a bloom false positive costs one extra file read,
  * never a wrong pair. Probe key sets above
  * `graft.cluster.maxProbeKeys` (default 100k) fall back to the full
  * snapshot — same answers, the old cost.
  *
  * Invariant (spec-pinned): after any batch cadence in which no
  * (band_id, sig) bucket ever exceeds `graft.dedup.maxBucketSize`, the
  * maintained map equals the batch rebuild
  * `connectedComponents(fastCandidatePairs(all docs so far))`
  * row-for-row — pair coverage is exact because within-batch ∪
  * batch↔history = all-pairs over the union. NEAR THE CAP the
  * maintained map is a monotone SUPERSET of the rebuild: cross pairs
  * honor the rebuild's COMBINED bucket cap (crossCandidatePairs), but
  * memberships merged while a bucket was still under the cap are
  * retained, whereas a fresh rebuild whose bucket has since crossed
  * the cap drops the whole bucket — retention is the deliberate side
  * of that trade (a published cluster never silently dissolves because
  * the corpus grew).
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

  /** Per-batch probe-read observability for [[graft.ClusterCensus]]:
    * (files opened, live files) per published table at the LAST
    * [[applyBatch]] — the flat-in-table-age claim made measurable. */
  @volatile private[graft] var lastProbe: Map[String, (Int, Int)] = Map.empty

  /** One micro-batch applied to the two maintained tables — factored out
    * so specs can drive crash/replay schedules batch-at-a-time. */
  private[graft] def applyBatch(batch: DataFrame, mapRoot: String,
      sigRoot: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val maxProbeKeys = s.conf.getOption("graft.cluster.maxProbeKeys")
      .map(_.toInt).getOrElse(100000)
    // the sink's writes carry bloom metadata for the probe columns —
    // threaded EXPLICITLY through append/merge (r18 advice: the former
    // save/set/restore of the session-wide graft.commitlog.bloomColumns
    // conf could clobber, or be clobbered by, a concurrent writer in the
    // same session, silently dropping bloom metadata)
    locally {
      val sigs = Dedup.fastBandSignaturesOf(batch).localCheckpoint()
      val within = Dedup.expandPairs(s, sigs)
        .select(col("doc_a"), col("doc_b"))
      var probes = Map.empty[String, (Int, Int)]
      val pairs0 =
        if (CommitLog.headVersion(s, sigRoot) == 0L) within // bootstrap
        else {
          // bloom-probe the signature table with the batch's sig keys
          val sigKeys = sigs.select(col("sig").cast("long")).distinct()
            .limit(maxProbeKeys + 1).collect().map(_.getLong(0)).toSeq
          val published =
            if (sigKeys.size > maxProbeKeys) CommitLog.snapshot(s, sigRoot)
            else {
              val (df, kept, live) =
                CommitLog.snapshotProbe(s, sigRoot, "sig", sigKeys)
              probes += ("sigs" -> (kept, live))
              df
            }
          within.unionByName(Dedup.crossCandidatePairs(sigs, published))
        }
      val pairs = pairs0.localCheckpoint()
      val published =
        if (CommitLog.headVersion(s, mapRoot) == 0L)
          s.createDataFrame(new java.util.ArrayList[Row](), MapSchema)
        else {
          // two probe rounds: touched doc ids → their cluster ids → every
          // row of a touched cluster (bloom superset-safety guarantees no
          // member file is skipped; mergeClusterBatchDelta's semi-joins
          // then compute the exact touched set as before)
          // the cap bounds the COLLECT itself (limit before the driver
          // fetch), not just the decision after it — an adversarial
          // dup-heavy batch must not balloon the driver first
          val touched = pairs
            .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
            .distinct().limit(maxProbeKeys + 1)
            .collect().map(_.getLong(0)).toSeq
          if (touched.isEmpty)
            s.createDataFrame(new java.util.ArrayList[Row](), MapSchema)
          else if (touched.size > maxProbeKeys) CommitLog.snapshot(s, mapRoot)
          else {
            import s.implicits._
            val (r1, _, _) = CommitLog.snapshotProbe(s, mapRoot, "doc_id", touched)
            val clusterIds = r1
              .join(touched.toDF("doc_id"), Seq("doc_id"), "left_semi")
              .select(col("cluster_id")).distinct()
              .limit(maxProbeKeys + 1).collect().map(_.getLong(0)).toSeq
            if (clusterIds.isEmpty)
              s.createDataFrame(new java.util.ArrayList[Row](), MapSchema)
            else if (clusterIds.size > maxProbeKeys) CommitLog.snapshot(s, mapRoot)
            else {
              val (df, kept, live) =
                CommitLog.snapshotProbe(s, mapRoot, "cluster_id", clusterIds)
              probes += ("map" -> (kept, live))
              df
            }
          }
        }
      lastProbe = probes
      val delta = Dedup.mergeClusterBatchDelta(published, pairs).localCheckpoint()
      if (!delta.isEmpty)
        CommitLog.merge(delta, mapRoot, "doc_id",
          statsFor = Some(Seq("doc_id", "cluster_id")),
          txnId = Some(mapToken(batchId)),
          bloomFor = Seq("doc_id", "cluster_id")): Unit
      CommitLog.append(sigs, sigRoot, txnId = Some(sigToken(batchId)),
        bloomFor = Seq("sig")): Unit
    }
  }
}
