package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.Tables
import graft.operators.TextAnalysis

/** s27: streaming LM-quality TIER monitor — the online form of q162/q229
  * the way CCNet actually deploys its LM: the bigram model AND the
  * tercile cutoffs are FROZEN from a reference corpus (an online model
  * that retrained per batch would silently move every historical tier
  * count — frozen artifacts are the only form whose maintained table has
  * a meaning), each document micro-batch is scored by q156's micro-nat
  * formula against the frozen model ([[TextAnalysis.lmScoreAgainst]] —
  * the SAME scoring definition the batch query uses), bucketed by the
  * frozen cutoffs (the same [[TextAnalysis.tierColumn]] rule), folded to
  * a (source, tier, cnt, sum_nll) fragment and additively merged.
  *
  * Novel text the frozen model never saw smooths through the same
  * add-one form (an unseen bigram of a seen word scores ln 1 − ln(c1+V);
  * a wholly unseen word ln 1 − ln V, the most-surprising value) — so a
  * feed drifting into gibberish lands in `tail` one micro-batch later,
  * which is exactly where a curator looks for it.
  *
  * State architecture is s25/s26's verbatim: NO in-flight streaming
  * state — the published table plus its last-applied batch id ARE the
  * state; `publishDelta` receives only the TOUCHED (source, tier) cells,
  * so per-batch cost is O(fragment), never O(corpus age); the
  * at-least-once replay guard skips already-applied batch ids (both
  * maintained columns are additive counters — an unguarded replay would
  * double-count), and the sink atomicity contract is inherited from
  * s10/[[RollupSink]].
  */
object TierMonitor {

  /** Frozen serving artifacts: the reference corpus's MATERIALIZED
    * (localCheckpointed) V²-bounded bigram model + unigram margins +
    * 1-row vocab frame, the two tercile cutoff literals, and the
    * broadcast switch from the freezing session's `graft.lm.broadcastModel`
    * (q156's escape hatch for models too large to broadcast — the stream
    * honors it too). Every frame is materialized at freeze time: a lazy
    * plan here would rescan the REFERENCE corpus on every micro-batch,
    * and — worse — pick up files added to the reference dir mid-stream,
    * silently moving the "frozen" model (the exact failure the freeze
    * exists to prevent).
    *
    * Lifetime note: localCheckpoint blocks live on executors WITHOUT
    * lineage — right for a single-JVM monitor, but on a cluster an
    * executor loss after freeze() breaks every later batch. For durable
    * serving, [[persist]] the artifacts to a parquet root and [[load]]
    * them (a plain reliable-storage read) on the serving side.
    */
  final case class FrozenLm(model: DataFrame, uni: DataFrame,
      vocab: DataFrame, c1Cut: Long, c2Cut: Long, bcastModel: Boolean)

  /** One training + cutoff pass over the reference corpus. Fails loudly
    * on an empty corpus (tier cutoffs are undefined there — a bare NPE
    * from a null percentile row names nothing). */
  def freeze(s: SparkSession, dir: String): FrozenLm = {
    val docs = Tables.documents(s, dir)
    val (model0, uni0, vocab0) = TextAnalysis.lmTrain(docs)
    // lmTrain returns LAZY frames (the q156 query path fuses them into one
    // execution); the freeze invariant — never rescan the reference corpus
    // after freeze() — is pinned HERE, where it belongs, by checkpointing
    // all three artifacts.
    val model = model0.localCheckpoint()
    val uni = uni0.localCheckpoint()
    val vocab = vocab0.localCheckpoint()
    val bcast = TextAnalysis.lmBroadcastModel(s)
    val cuts = TextAnalysis
      .lmScoreAgainst(docs, model, uni, vocab, Nil, bcastModel = bcast)
      .agg(expr(
        "percentile_approx(avg_nll_micro, array(CAST(1.0/3 AS DOUBLE), CAST(2.0/3 AS DOUBLE)), 10000)")
        .as("c"))
      .select(col("c")(0), col("c")(1)).head()
    if (cuts.isNullAt(0) || cuts.isNullAt(1))
      throw new IllegalStateException(
        s"TierMonitor.freeze: reference corpus at $dir has no documents — " +
          "tier cutoffs are undefined")
    FrozenLm(model, uni, vocab, cuts.getLong(0), cuts.getLong(1), bcast)
  }

  /** Durable form of the frozen artifacts: model/uni/vocab as parquet
    * plus a 1-row cuts table — reliable storage, so a serving cluster
    * survives executor loss and restarts (the localCheckpoint form is
    * single-JVM). */
  def persist(f: FrozenLm, root: String): Unit = {
    f.model.write.mode("overwrite").parquet(s"$root/model.parquet")
    f.uni.write.mode("overwrite").parquet(s"$root/uni.parquet")
    f.vocab.write.mode("overwrite").parquet(s"$root/vocab.parquet")
    val s = f.model.sparkSession
    import s.implicits._
    Seq((f.c1Cut, f.c2Cut, f.bcastModel)).toDF("c1", "c2", "bcast")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/cuts.parquet")
  }

  def load(s: SparkSession, root: String): FrozenLm = {
    val cuts = s.read.parquet(s"$root/cuts.parquet").head()
    // pin the loaded frames too (the FrozenLm materialization invariant):
    // a lazy parquet read would re-list the artifact root every
    // micro-batch and score against a silently-swapped model if anyone
    // re-persisted over it mid-stream
    FrozenLm(
      s.read.parquet(s"$root/model.parquet").localCheckpoint(),
      s.read.parquet(s"$root/uni.parquet").localCheckpoint(),
      s.read.parquet(s"$root/vocab.parquet").localCheckpoint(),
      cuts.getAs[Long]("c1"), cuts.getAs[Long]("c2"),
      cuts.getAs[Boolean]("bcast"))
  }

  /** One micro-batch's (source, tier, cnt, sum_nll) fragment — frozen
    * scoring + frozen cutoffs, folded. */
  private[graft] def fragmentOf(batch: DataFrame, f: FrozenLm): DataFrame =
    TextAnalysis
      .lmScoreAgainst(batch, f.model, f.uni, f.vocab, Seq("source"),
        bcastModel = f.bcastModel)
      .withColumn("tier", TextAnalysis.tierColumn(
        col("avg_nll_micro"), lit(f.c1Cut), lit(f.c2Cut)))
      .groupBy(col("source"), col("tier"))
      .agg(count(lit(1)).as("cnt"), sum(col("avg_nll_micro")).as("sum_nll"))

  /** One fragment merged into the maintained table: replay-guarded,
    * delta-shaped (only touched cells are read, merged, returned). The
    * fragment is checkpointed before its two consumers — it is the
    * OUTPUT of the join-heavy scoring pass, and evaluating it twice
    * (touched-cells probe + merge union) would score the batch twice.
    */
  private[graft] def tierCountsBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val f = frag.localCheckpoint()
      val touched = f.select(col("source"), col("tier")).distinct()
      val affected = table.join(touched, Seq("source", "tier"), "left_semi")
      Some(mergeCounts(affected, f))
    // the first batch checkpoints too: the lazy scoring plan references
    // the foreachBatch micro-batch frame (only valid inside the
    // callback), and a publishDelta taking two actions on it would
    // score batch 0 twice
    case None => Some(frag.localCheckpoint())
  }

  /** Additive monoid merge of (source, tier, cnt, sum_nll) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("tier"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_nll")).as("sum_nll"))

  /** q229's table derived from maintained counts — same integer share and
    * mean formulas (one definition, zero drift). When the streamed corpus
    * IS the frozen reference corpus, this equals the batch q229 table
    * row for row (frozen scores ≡ q156 self-scores, frozen cutoffs ≡
    * q162's — spec-pinned).
    */
  def profile(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("tier"), col("cnt").as("n_docs"),
        expr("(cnt * 10000) DIV tot").as("share_bp"),
        expr("sum_nll DIV cnt").as("mean_nll_micro"))
  }

  /** The stream: documents in, touched tier cells out via
    * `publishDelta(delta, batchId)`. */
  def tierMonitorStream(
      docs: DataFrame,
      frozen: FrozenLm,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tierCountsBatch(store(), fragmentOf(batch, frozen), batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
