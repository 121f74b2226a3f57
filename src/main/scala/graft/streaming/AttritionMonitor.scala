package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s26: streaming gate-ATTRITION monitor — the online form of q227: each
  * document micro-batch is scored by q65's verdict projection (every q65
  * stat is per-doc self-contained, so a batch scores identically to the
  * batch query — [[graft.operators.TextAnalysis.corpusFilterOf]] is the
  * ONE shared definition), folded to a (source, outcome) count fragment,
  * and MERGED into the maintained attrition table (pure additive monoid:
  * maintained ≡ rebuilt after any batch cadence). A feed whose docs start
  * dying at a new gate — a format change tripping word-length, a language
  * shift tripping the stopword gate — surfaces one micro-batch later,
  * without a corpus rescan.
  *
  * State architecture is s10/s25's verbatim: NO in-flight streaming
  * state — the published count table plus its last-applied batch id ARE
  * the state; `publishDelta` receives only the TOUCHED (source, outcome)
  * cells, so per-batch cost is O(fragment), never O(corpus age); the
  * at-least-once replay guard skips already-applied batch ids (additive
  * counters would double-count otherwise — spec-pinned), and the sink
  * atomicity contract is inherited from s10/[[RollupSink]].
  */
object AttritionMonitor {

  /** One micro-batch's (source, outcome, cnt) fragment merged into the
    * maintained table: replay-guarded, delta-shaped.
    */
  private[graft] def attritionCountsBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val touched = frag.select(col("source"), col("outcome")).distinct()
      val affected = table.join(touched, Seq("source", "outcome"), "left_semi")
      Some(mergeCounts(affected, frag))
    case None => Some(frag)
  }

  /** Additive monoid merge of (source, outcome, cnt) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("outcome"))
      .agg(sum(col("cnt")).as("cnt"))

  /** One batch's verdict fragment — q65's shared projection, folded.
    * The source axis rides through the verdict via the carry columns
    * (q227's single-scan shape), no doc_id re-join.
    */
  private[graft] def fragmentOf(batch: DataFrame): DataFrame =
    graft.operators.TextAnalysis.corpusFilterOf(batch, carry = Seq("source"))
      .withColumn("outcome", coalesce(col("reject_reason"), lit("accepted")))
      .groupBy(col("source"), col("outcome")).agg(count(lit(1)).as("cnt"))

  /** q227's table derived from maintained counts — n_docs + within-source
    * share bp, the same integer formula as the batch query (one
    * definition, zero drift).
    */
  def profile(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("outcome"), col("cnt").as("n_docs"),
        expr("(cnt * 10000) DIV tot").as("share_bp"))
  }

  /** The stream: documents in, touched attrition cells out via
    * `publishDelta(delta, batchId)`.
    */
  def attritionMonitorStream(
      docs: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        attritionCountsBatch(store(), fragmentOf(batch), batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
