package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{IvfIndex, Similarity}

/** s14: streaming vector-index maintenance — new embeddings flow from a
  * stream into the serving ANN index with EXACTLY-ONCE visibility.
  *
  * [[graft.operators.IvfIndex.appendBatch]] documents its at-least-once
  * gap: a retried append after an unreported success double-inserts the
  * batch. This module closes that gap for the streaming path with
  * [[RollupSink]]'s commit idiom: each micro-batch is assigned with the
  * STORED model (no retrain), staged to an invisible dot-directory, and
  * published by one atomic rename to `indexDir/ingest/gen=<batchId>/` — the
  * batch id IS the directory name, so rows and id become visible together
  * and a replay of an already-committed id is a no-op. [[probeLive]] serves
  * ANN queries over base corpus ∪ ingest generations; [[compact]] folds
  * committed generations into the base layout (one appendBatch + deletes)
  * when the ingest lane grows — after which the SAME vectors are served
  * from the base partitions instead.
  *
  * Scale shape: per batch, work is O(batch)·k cosine assignments (the
  * model is a driver-held k×dim broadcast, same as probe) and one rename;
  * the ingest lane is bounded by compaction cadence, not stream lifetime.
  */
object VectorIngest {

  /** Stage + atomically publish one assigned batch as `ingest/gen=<id>`.
    * Files inside a generation are partitioned by cell, so a probe's
    * pushed `cell IN (...)` predicate prunes within the lane too.
    */
  def publish(s: SparkSession, indexDir: String, batch: DataFrame, batchId: Long): Unit = {
    AtomicGen.publish(s, s"$indexDir/ingest", batchId) { staged =>
      // validation runs inside the publish thunk: a replay of a committed
      // batch skips it entirely (AtomicGen's exists-check short-circuits)
      val centers = validateBatch(s, indexDir, batch)
      batch
        .select(col("vec_id"), col("embedding"))
        .withColumn("cell", Similarity.nearestCell(col("embedding"), centers))
        .write.mode("overwrite").partitionBy("cell").parquet(staged)
    }: Unit
  }

  /** The shared batch validator: shape + dimension against the stored
    * model; returns the loaded centers so callers assign without a second
    * load. ONE definition — [[SemanticGate]] validates through this too,
    * so the two ingest doors cannot drift.
    */
  private[streaming] def validateBatch(s: SparkSession, indexDir: String,
      batch: DataFrame): Array[Array[Double]] = {
    require(batch.columns.contains("vec_id") && batch.columns.contains("embedding"),
      s"vector ingest: batch must carry (vec_id, embedding), got ${batch.columns.mkString(", ")}")
    val centers = IvfIndex.loadCenters(s, indexDir)
    val dim = centers.head.length
    val bad = batch.select(size(col("embedding")).as("d"))
      .filter(col("d") =!= dim).limit(1).collect()
    require(bad.isEmpty,
      s"vector ingest: embedding dim ${bad.headOption.map(_.get(0)).getOrElse("?")} " +
        s"does not match the stored model's dim $dim")
    centers
  }

  /** Publish a batch whose cells are ALREADY assigned (column `cell`) —
    * the gate path, where assignment happened during the dedup decision
    * and re-deriving it would double the k-cosine work. The caller owns
    * having assigned with THIS index's stored model.
    */
  private[streaming] def publishAssigned(s: SparkSession, indexDir: String,
      assigned: DataFrame, batchId: Long): Unit = {
    AtomicGen.publish(s, s"$indexDir/ingest", batchId) { staged =>
      assigned.select(col("vec_id"), col("embedding"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(staged)
    }: Unit
  }

  /** The streaming entry: embeddings stream → per-micro-batch idempotent
    * index appends. foreachBatch is the right tool (same reasoning as
    * s04/s10): the sink is a transactional directory publish keyed by
    * batch id, not a row-append.
    *
    * Pass `checkpointDir` in production: batch-id idempotence only
    * survives a RESTART with a durable checkpoint — without one, Spark
    * restarts ids at 0 and `gen=0` onward read as already-committed
    * replays, silently dropping new data (the [[SemanticGate]] contract,
    * shared here). The default (None — engine temp checkpoint) is for
    * single-run tests only.
    */
  def ingestStream(s: SparkSession, indexDir: String,
      stream: DataFrame, checkpointDir: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append")
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        publish(s, indexDir, batch.toDF(), batchId)
      }
      .start()
  }

  /** Committed ingest generations (dot-staging litter is invisible).
    * Shared with [[SemanticGate]] — the lane-discovery rule (gen=
    * directories only) must not fork.
    */
  private[streaming] def ingestFrame(s: SparkSession, indexDir: String): Option[DataFrame] = {
    val root = new Path(s"$indexDir/ingest")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasGen = fs.exists(root) && fs.listStatus(root)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
    if (!hasGen) None
    else Some(s.read.parquet(s"$indexDir/ingest")
      .select(col("cell"), col("vec_id"), col("embedding")))
  }

  /** ANN probe over base corpus ∪ the ingest lane — what the serving tier
    * runs between compactions. Identical result contract to
    * [[IvfIndex.probe]]; streamed vectors are first-class neighbors the
    * moment their generation's rename lands.
    */
  def probeLive(s: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int = 8, topK: Int = 5): DataFrame = {
    val extra = ingestFrame(s, indexDir)
    IvfIndex.probeWith(s, indexDir, queries, extra, nprobe, topK)
  }

  /** Fold all committed generations into the base cell-partitioned layout
    * and drop the lane: one [[IvfIndex.appendBatch]] call (its per-call
    * atomicity is enough here — a crash before the deletes just leaves
    * generations that are ALSO in the base, which is exactly the
    * double-serve compaction caveat RollupSink.gc documents, resolved by
    * re-running compact) — so run it from the maintenance process, not
    * beside a live probe. Returns the folded batch ids.
    */
  def compact(s: SparkSession, indexDir: String): Seq[Long] = {
    val root = new Path(s"$indexDir/ingest")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val gens = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong).sorted
    if (gens.isEmpty) return Nil
    val lane = s.read.parquet(s"$indexDir/ingest")
      .filter(col("gen").cast("long").isin(gens.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id"), col("embedding"))
      // fold point: materialize the lane BEFORE touching its directories
      .localCheckpoint()
    IvfIndex.appendBatch(s, indexDir, lane)
    gens.foreach(g => fs.delete(new Path(s"$indexDir/ingest/gen=$g"), true))
    gens
  }
}
