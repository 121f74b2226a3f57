package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s25: streaming SOURCE-MIX curation monitor — the online form of q211:
  * each document micro-batch becomes a (source, lang) count fragment and
  * is MERGED into the maintained count table (a pure additive monoid, so
  * maintained ≡ rebuilt after any batch cadence), and the dominant-lang /
  * entropy profile is derived from the MAINTAINED counts by the very same
  * [[graft.operators.Entropy.dominantAndEntropy]] kernel the batch query
  * uses — a drift in a source's language mix shows up one micro-batch
  * after it happens, without a corpus rescan.
  *
  * Same state architecture as s10 (`EventStream.rollupStream`): NO
  * in-flight streaming state — the published count table plus its
  * last-applied batch id ARE the state; `publishDelta` receives only the
  * TOUCHED (source, lang) cells, so per-batch cost is O(fragment), never
  * O(corpus age). The at-least-once replay guard and the sink atomicity
  * contract are exactly s10's (see rollupStream's scaladoc and
  * [[RollupSink]] for a sink that commits rows and batch id in one
  * rename); counts here are additive counters, so an unguarded replay
  * would double-count — the spec proves the skip.
  */
object CurationMonitor {

  /** One micro-batch's (source, lang, cnt) fragment merged into the
    * maintained table: replay-guarded, delta-shaped (only cells the
    * fragment touches are read, merged, and returned).
    */
  private[graft] def mixCountsBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val touched = frag.select(col("source"), col("lang")).distinct()
      val affected = table.join(touched, Seq("source", "lang"), "left_semi")
      Some(mergeCounts(affected, frag))
    case None => Some(frag)
  }

  /** Additive monoid merge of (source, lang, cnt) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("lang"))
      .agg(sum(col("cnt")).as("cnt"))

  /** q211's profile derived from maintained counts — the batch kernel
    * serves the stream unchanged (one definition, zero drift).
    */
  def profile(counts: DataFrame): DataFrame =
    graft.operators.Entropy.dominantAndEntropy(counts, "source", "lang")
      .select(col("source"), col("n_total").as("n_docs"),
        col("n_bins").as("n_langs"), col("top_bin").as("top_lang"),
        col("top_share_bp"), col("entropy_x1000"))

  /** The stream: documents in, touched count cells out via
    * `publishDelta(delta, batchId)`.
    */
  def mixMonitorStream(
      docs: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frag = batch.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("cnt"))
        mixCountsBatch(store(), frag, batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
