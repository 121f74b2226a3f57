package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.operators.TextAnalysis

/** s32: streaming pipeline-WATERFALL monitor — the online form of q268:
  * each document micro-batch is flagged through the SAME three gates the
  * batch query composes — quality ([[TextAnalysis.corpusFilterOf]]),
  * exact dedup (q28's canonical key via [[TextAnalysis.contentHashCol]]),
  * decontamination ([[TextAnalysis.contaminatedGramsOf]] against a gram
  * set FROZEN at stream build, s27/s31's idiom) — folded by the SAME
  * [[TextAnalysis.waterfallCounts]] conditional-sum kernel, and
  * additively merged into the maintained (source → 8 counters) table.
  * The published per-source funnel comes from the maintained counters via
  * the SAME [[TextAnalysis.waterfallStages]] derivation, so "which stage
  * is eating THIS feed's tokens" updates one micro-batch after the feed
  * changes, without a corpus rescan.
  *
  * Dedup state: streaming exact dedup is FIRST-ACCEPTED-WINS — a hash
  * kept in an earlier batch blocks every later accepted copy. The seen
  * set is part of the published state (content_hash rows appended per
  * batch, set-union idempotent); when the stream replays the corpus in
  * doc_id order the maintained funnel is row-for-row the batch q268
  * (min-doc_id-wins ≡ first-wins under ordered arrival — spec-pinned).
  * At 100 TB the seen table is a bucketed hash table keyed by
  * content_hash (the Dedup.writeSignatureTableBucketed discipline); here
  * it joins broadcast-or-shuffle as AQE sizes it.
  *
  * State architecture otherwise s25/s26 verbatim: NO in-flight streaming
  * state — the published counters + seen hashes + last-applied batch id
  * ARE the state; the replay guard skips already-applied ids (additive
  * counters would double-count, and a replayed batch would wrongly see
  * its OWN hashes as dupes — the guard covers both hazards).
  */
object WaterfallMonitor {

  /** Flag one batch through the three gates against the frozen benchmark
    * grams and the seen-hash state — q268's per-doc flag contract
    * (source, n_words, accept, kept, contam), with `kept` additionally
    * requiring the hash to be unseen in prior batches. */
  private[graft] def flaggedOf(batch: DataFrame, benchGrams: DataFrame,
      seenHashes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy(col("content_hash"))
    TextAnalysis.corpusFilterOf(batch, carry = Seq("source", "text"))
      .withColumn("content_hash", TextAnalysis.contentHashCol)
      .drop("text")
      .join(seenHashes.select(col("content_hash"), lit(true).as("seen")),
        Seq("content_hash"), "left")
      .withColumn("min_acc_id",
        min(when(col("accept"), col("doc_id"))).over(byHash))
      .withColumn("kept",
        col("accept") && col("doc_id") === col("min_acc_id") && col("seen").isNull)
      .join(TextAnalysis.contaminatedGramsOf(batch, benchGrams)
          .select(col("doc_id"), lit(true).as("contam")),
        Seq("doc_id"), "left")
      .withColumn("contam", coalesce(col("contam"), lit(false)))
  }

  /** One micro-batch applied to the maintained state: returns the merged
    * TOUCHED counter rows and the batch's newly-kept hashes, or None on a
    * replayed batch id. `current` is (counters, seenHashes, lastApplied);
    * None on the very first batch. */
  private[graft] def waterfallBatch(
      current: Option[(DataFrame, DataFrame, Long)],
      batch: DataFrame,
      benchGrams: DataFrame,
      batchId: Long): Option[(DataFrame, DataFrame)] = current match {
    case Some((_, _, lastApplied)) if batchId <= lastApplied => None
    case cur =>
      val seen = cur.map(_._2).getOrElse(
        batch.sparkSession.emptyDataFrame
          .withColumn("content_hash", lit("")).limit(0))
      val flagged = flaggedOf(batch, benchGrams, seen)
      val frag = TextAnalysis.waterfallCounts(flagged)
      val newHashes = flagged.filter(col("kept"))
        .select(col("content_hash")).distinct()
      val merged = cur match {
        case Some((table, _, _)) =>
          val touched = frag.select(col("source")).distinct()
          mergeCounts(table.join(touched, Seq("source"), "left_semi"), frag)
        case None => frag
      }
      Some((merged, newHashes))
  }

  /** Additive monoid merge of (source → 8 counters) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val sums = Seq("n0", "t0", "n1", "t1", "n2", "t2", "n3", "t3")
      .map(c => sum(col(c)).as(c))
    a.unionByName(b).groupBy(col("source")).agg(sums.head, sums.tail: _*)
  }

  /** q268's stage table derived from the MAINTAINED counters — the batch
    * kernel serves the stream unchanged (one definition, zero drift). */
  def profile(counts: DataFrame): DataFrame =
    TextAnalysis.waterfallStages(counts)

  /** The stream: documents in, (touched counter rows, new kept hashes)
    * out via `publishDelta(countersDelta, newHashes, batchId)`. The
    * benchmark gram set is frozen HERE (s31's contract). */
  def waterfallMonitorStream(
      docs: DataFrame,
      benchDocs: DataFrame,
      store: () => Option[(DataFrame, DataFrame, Long)])(
      publishDelta: (DataFrame, DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val benchGrams = TextAnalysis.nGrams(benchDocs, 5)
      .select(col("g")).distinct()
      .localCheckpoint() // frozen once; broadcast into every batch probe
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        waterfallBatch(store(), batch, benchGrams, batchId)
          .foreach { case (delta, hashes) => publishDelta(delta, hashes, batchId) }
      }
  }
}
