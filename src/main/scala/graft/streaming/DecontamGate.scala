package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** s31: the streaming DECONTAMINATION gate — q58's benchmark-overlap
  * check applied at ingest, per micro-batch, so eval-set text never
  * reaches the published corpus in the first place (q58 is the audit
  * over data at rest; this is the front door — the s20 SafetyGate
  * argument on the contamination axis). Dual-root idiom verbatim:
  *
  *  - docs sharing ZERO word-5-grams with the benchmark publish with
  *    their text;
  *  - contaminated docs land in the quarantine root with their matched
  *    distinct-gram count — preserved and attributable (a re-crawled
  *    eval page is evidence, not garbage), replayable after a benchmark
  *    registry update.
  *
  * One definition of "contaminated": the gate calls the SAME
  * [[TextAnalysis.contaminatedGramsOf]] probe q58 runs, against a
  * benchmark gram set FROZEN at stream build (s27's frozen-model idiom —
  * eval registries version explicitly; a silently drifting gate would
  * make two batches disagree about the same doc). The frozen set is a
  * localCheckpointed distinct-gram frame broadcast into every batch —
  * eval sets are tiny by construction, the q58 scale argument.
  *
  * Idempotence under at-least-once foreachBatch: both roots commit under
  * the same batch id via [[AtomicGen]], every batch writes a generation
  * to BOTH roots (possibly empty), and the verdict is a pure projection
  * of (batch, frozen set) — a replayed batch re-derives the identical
  * split (s16's argument, unchanged).
  */
object DecontamGate {

  /** Gate one batch: probe, split, commit both roots atomically. */
  private[graft] def gateBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      benchGrams: DataFrame, publishDir: String, quarantineDir: String): Unit = {
    val routed = batch.select(col("doc_id"), col("text"))
      .join(TextAnalysis.contaminatedGramsOf(batch, benchGrams),
        Seq("doc_id"), "left")
      .withColumn("n_contaminated_grams",
        coalesce(col("n_contaminated_grams"), lit(0L)))
      .localCheckpoint() // both lane writes share one probe pass
    AtomicGen.publish(s, publishDir, batchId) { staged =>
      routed.filter(col("n_contaminated_grams") === 0L)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(staged)
    }: Unit
    AtomicGen.publish(s, quarantineDir, batchId) { staged =>
      routed.filter(col("n_contaminated_grams") > 0L)
        .select(col("doc_id"), col("text"), col("n_contaminated_grams"))
        .write.mode("overwrite").parquet(staged)
    }: Unit
  }

  /** The streaming entry: micro-batches of (doc_id, text) split into the
    * published corpus and the gram-count-tagged quarantine, against the
    * benchmark docs' 5-gram set frozen HERE. `checkpointDir` is REQUIRED
    * (the CrawlIngest contract): without it a restarted query reuses
    * batch ids and AtomicGen's replay guard would swallow new data.
    */
  def gatedStream(s: SparkSession, stream: DataFrame, benchDocs: DataFrame,
      publishDir: String, quarantineDir: String,
      checkpointDir: String): StreamingQuery = {
    val benchGrams = TextAnalysis.nGrams(benchDocs, 5)
      .select(col("g")).distinct()
      .localCheckpoint() // frozen once; broadcast into every batch probe
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gateBatch(s, batch.toDF(), batchId, benchGrams, publishDir, quarantineDir)
      }
      .start()
  }
}
