package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Similarity

/** s34: the streaming LABEL-SANITY gate — q278's nearest-centroid audit
  * applied at vector-ingest time, so a mislabeled embedding never reaches
  * the published vector table unflagged (the s20/s31 front-door argument
  * on the label axis):
  *
  *  - rows whose nearest frozen centroid IS their claimed label publish;
  *  - rows assigned elsewhere land in the quarantine root tagged with the
  *    `nearest` label they actually resemble — preserved, attributable,
  *    replayable after a relabel pass.
  *
  * One definition of "misassigned": the gate scores with the SAME
  * [[Similarity.nearestLabelCol]] projection q278 audits with, against a
  * centroid model FROZEN from a reference corpus at stream build (s27's
  * frozen-model idiom — an online model re-centered per batch would let
  * two batches disagree about the same vector). The model is |labels|×dim
  * doubles on the driver (q48's small-learned-model discipline), so the
  * verdict is a PURE projection — zero state, zero shuffle per batch.
  *
  * Idempotence under at-least-once foreachBatch: both roots commit under
  * the same batch id via [[AtomicGen]], every batch writes a generation
  * to BOTH roots (possibly empty), and the verdict is a pure function of
  * (batch, frozen model) — a replayed batch re-derives the identical
  * split (s16's argument, unchanged).
  */
object LabelGate {

  /** Gate one batch: assign, split, commit both roots atomically. */
  private[graft] def gateBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      centers: Array[(Int, Seq[Double])],
      publishDir: String, quarantineDir: String): Unit = {
    val routed = batch
      .withColumn("nearest", Similarity.nearestLabelCol(centers))
      .localCheckpoint() // both lane writes share one scoring pass
    AtomicGen.publish(s, publishDir, batchId) { staged =>
      routed.filter(col("nearest") === col("label"))
        .drop("nearest")
        .write.mode("overwrite").parquet(staged)
    }: Unit
    AtomicGen.publish(s, quarantineDir, batchId) { staged =>
      // null-safe: a degenerate (zero-norm/null) embedding gets nearest =
      // NULL from the shared projection — it must land HERE, not publish,
      // and must not vanish between two non-matching filters
      routed.filter(not(col("nearest") <=> col("label")))
        .write.mode("overwrite").parquet(staged)
    }: Unit
  }

  /** The streaming entry: micro-batches of (vec_id, label, embedding)
    * split into the published table and the nearest-tagged quarantine,
    * against label centroids frozen HERE from `referenceDir`'s embeddings
    * table. `checkpointDir` is REQUIRED (the CrawlIngest contract). */
  def gatedStream(s: SparkSession, stream: DataFrame, referenceDir: String,
      publishDir: String, quarantineDir: String,
      checkpointDir: String): StreamingQuery = {
    val centers = Similarity.labelCenters(s, referenceDir) // frozen once
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gateBatch(s, batch.toDF(), batchId, centers, publishDir, quarantineDir)
      }
      .start()
  }
}
