package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s37: streaming TEMPLATE-prefix monitor — the online form of q304: each
  * document micro-batch folds via the SAME
  * [[graft.operators.TextAnalysis.prefixCountsOf]] kernel to its
  * (source, prefix, n) opening-count fragment, MERGED into the maintained
  * count table (a pure additive monoid, so maintained ≡ rebuilt after any
  * batch cadence), and the template census derives from the MAINTAINED
  * counts by the very same
  * [[graft.operators.TextAnalysis.templateFromPrefixCounts]] the batch
  * query uses — a feed that starts stamping a boilerplate header on every
  * document flips its `templated` verdict one micro-batch after the
  * modal share crosses the bar, without a corpus rescan.
  *
  * State architecture is s25's (which is s10's): NO in-flight streaming
  * state — the published count table plus its last-applied batch id ARE
  * the state; `publishDelta` receives only the TOUCHED (source, prefix)
  * cells, so per-batch cost is O(fragment), never O(corpus age). The
  * state is opening-domain bounded: |distinct openings| cells, which in
  * the templated regime this monitor exists to catch collapses toward
  * |templates| per source (the q304 scale argument — an opening is
  * digest-sized, text never enters state). At-least-once replay guard as
  * s25: counts are additive and would double-count on replay — the
  * batch-id check skips already-applied batches (spec-proven).
  */
object TemplateMonitor {

  /** One micro-batch's (source, prefix, n) fragment merged into the
    * maintained table: replay-guarded, delta-shaped (only cells the
    * fragment touches are read, merged, and returned).
    */
  private[graft] def prefixCountsBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val touched = frag.select(col("source"), col("prefix")).distinct()
      val affected = table.join(touched, Seq("source", "prefix"), "left_semi")
      Some(mergeCounts(affected, frag))
    case None => Some(frag)
  }

  /** Additive monoid merge of (source, prefix, n) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("prefix"))
      .agg(sum(col("n")).as("n"))

  /** q304's census derived from maintained counts — the batch kernel
    * serves the stream unchanged (one definition, zero drift).
    */
  def census(counts: DataFrame): DataFrame =
    graft.operators.TextAnalysis.templateFromPrefixCounts(counts)

  /** The stream: documents in, touched opening-count cells out via
    * `publishDelta(delta, batchId)`.
    */
  def templateMonitorStream(
      docs: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frag = graft.operators.TextAnalysis.prefixCountsOf(batch)
        prefixCountsBatch(store(), frag, batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
