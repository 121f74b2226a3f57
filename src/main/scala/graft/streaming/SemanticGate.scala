package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.VectorOps
import graft.operators.{IvfIndex, Similarity}

/** s19: streaming semantic-dedup gate — q175's SemDeDup verdict applied at
  * INGEST time. Each micro-batch of embeddings is admitted to the serving
  * index only if no ≥ τ cosine twin is already resident (base corpus ∪
  * committed ingest lane) and no better-anchored twin arrived in the SAME
  * batch (q175's (centroid-sim, vec_id) dominance — a batch of N clones
  * admits exactly one). Rejects land in an auditable `rejects/gen=<id>`
  * lane with a reason column instead of vanishing: the curation trail an
  * operator reads when admission rates drop.
  *
  * Commit protocol (two roots, one decision): rejects commit FIRST and the
  * ingest generation LAST, so the INGEST commit is the decision marker a
  * replay checks. A crash between the two renames leaves a committed
  * rejects generation; the replayed recompute is deterministic (same batch
  * content, same resident state under AtomicGen's single-writer contract —
  * the only writer that could have changed the resident set between crash
  * and replay is this stream, and batch N's own ingest commit is exactly
  * the missing half), so the replay re-lands the ingest generation while
  * AtomicGen discards the duplicate rejects stage as an ordinary lost
  * race. When a vector has BOTH a resident and a batch twin, the recorded
  * reason is the alphabetical min ("batch_dup") — arbitrary but
  * deterministic across replays.
  *
  * Scale shape: per batch — a k-cell assignment projection, ONE
  * partition-pruned resident read over the batch's cells (cell list is
  * driver-computed from the model, bounded by k), a batch×resident-in-cell
  * cosine join and cell-local within-batch pairs. Cost tracks the BATCH
  * and the touched cells, never the full index.
  */
object SemanticGate {

  /** Gate + publish one batch. Returns true iff this call decided the
    * batch (false = the batch id was already decided — the replay no-op).
    */
  def gateBatch(s: SparkSession, indexDir: String, batch: DataFrame,
      batchId: Long, tau: Double = 0.95): Boolean = {
    val ingestRoot = s"$indexDir/ingest"
    val rejectRoot = s"$indexDir/rejects"
    if (AtomicGen.committed(s, ingestRoot, batchId)) return false
    val centers = VectorIngest.validateBatch(s, indexDir, batch)
    val assigned = batch
      .select(col("vec_id"), col("embedding"))
      .withColumn("best", Similarity.bestScoredCell(col("embedding"), centers))
      .select(col("vec_id"), col("embedding"),
        (-col("best").getField("negcell")).as("cell"),
        col("best").getField("cs").as("cent_sim"))
      .localCheckpoint() // batch-bounded; four consumers below
    val cells = assigned.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val resident = {
      val base = s.read.parquet(s"$indexDir/corpus")
        .select(col("cell"), col("vec_id"), col("embedding"))
      VectorIngest.ingestFrame(s, indexDir).fold(base)(base.unionByName(_))
        .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    }
    val dupResident = assigned.alias("b")
      .join(resident.alias("r"), Seq("cell"))
      .filter(VectorOps.cosine(col("b.embedding"), col("r.embedding")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("reason", lit("resident_dup"))
    val l = assigned.select(col("cell"), col("vec_id").as("ia"),
      col("embedding").as("ea"), col("cent_sim").as("ca"))
    val r2 = assigned.select(col("cell"), col("vec_id").as("ib"),
      col("embedding").as("eb"), col("cent_sim").as("cb"))
    val dupBatch = l.join(r2, Seq("cell"))
      .filter((col("ca") < col("cb")) ||
        (col("ca") === col("cb") && col("ia") < col("ib")))
      .filter(VectorOps.cosine(col("ea"), col("eb")) >= tau)
      .select(col("ib").as("vec_id")).distinct()
      .withColumn("reason", lit("batch_dup"))
    val rejects = dupResident.unionByName(dupBatch)
      .groupBy(col("vec_id")).agg(min(col("reason")).as("reason"))
      .localCheckpoint() // consumed twice: the audit lane + the anti-join
    AtomicGen.publish(s, rejectRoot, batchId) { staged =>
      assigned.join(rejects, Seq("vec_id"))
        .select(col("vec_id"), col("cell"), col("reason"))
        .coalesce(1).write.mode("overwrite").parquet(staged)
    }
    val kept = assigned.join(rejects, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("cell"))
    // cells were assigned above with THIS index's stored model — publish
    // them as-is instead of re-deriving the k-cosine argmax per vector
    VectorIngest.publishAssigned(s, indexDir, kept, batchId)
    true
  }

  /** The streaming entry: embeddings stream → per-micro-batch gated,
    * idempotent index admission. `checkpointDir` is REQUIRED for the
    * replay contract to mean anything across restarts: without a durable
    * checkpoint Spark restarts batch ids at 0 and `gen=0` onward read as
    * already-decided replays — new data would be silently dropped, not
    * gated.
    */
  def gatedStream(s: SparkSession, indexDir: String, stream: DataFrame,
      checkpointDir: String, tau: Double = 0.95): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        gateBatch(s, indexDir, b.toDF(), id, tau): Unit
      }
      .start()
}
