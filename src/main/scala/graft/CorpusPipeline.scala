package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** The end-to-end LLM-training-corpus pipeline, composed from the shipped
  * operators: quality filter → exact dedup → near-dup cluster collapse →
  * benchmark decontamination → normalization → partitioned publish, with a
  * per-stage document-count audit the way [[Pipeline.cleanAudit]] audits
  * the event path.
  *
  * Each stage is DataFrame→DataFrame; the expensive stages (near-dup
  * banding, trigram stats) run on the ALREADY-FILTERED corpus, so work
  * shrinks monotonically down the pipeline. At 100 TB the only wide
  * operations are the dedup shuffles and the final write — identical to
  * running q65/q28/q49+q56/q58 standalone, minus their re-scans.
  */
object CorpusPipeline {

  /** Stage 0 — raw-crawl ingest: WARC response records (the `graft-warc`
    * DSv2 source, sources/WarcSource.scala) re-expressed as the
    * `documents` table contract (doc_id, text, lang, source) the rest of
    * the pipeline consumes. Keeps only well-framed HTTP 200 responses
    * with a decoded payload; doc_id is the stable (path, record_idx)
    * hash so re-running an ingest is idempotent; lang is `und` — the
    * language-ID stage (q36/q189) owns that column downstream; source
    * carries the crawl URI for q115's per-source overlap accounting.
    * One narrow scan, no shuffle; at 100 TB the parallel unit is the
    * archive file, exactly how the crawl is sharded.
    */
  def fromWarc(s: SparkSession, warcPath: String): DataFrame =
    s.read.format("graft-warc").load(warcPath)
      .filter(col("parse_ok") && col("warc_type") === "response" &&
        col("http_status") === 200 && col("body_text").isNotNull)
      .select(
        xxhash64(col("path"), col("record_idx")).as("doc_id"),
        col("body_text").as("text"),
        lit("und").as("lang"),
        col("target_uri").as("source"))

  /** Canonical URL for crawl-dedup keys (the public normalization set:
    * lower-case scheme+host, default ports dropped, fragment dropped,
    * tracking params — utm_* / fbclid / gclid — stripped, trailing '?'
    * and lone trailing '/' on a bare host removed). Pure codegen regex
    * chain, zero shuffle; two syntactically different URLs of the same
    * resource collapse to one key BEFORE content ever downloads twice —
    * the cheapest dedup rung, ahead of q28's content hash.
    */
  def canonicalUrl(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lowered = concat(
      lower(regexp_extract(u, "^([^/]*//[^/]*)", 1)),
      regexp_extract(u, "^[^/]*//[^/]*(.*)$", 1))
    val noFragment = regexp_replace(lowered, "#.*$", "")
    // scheme-PAIRED default ports: https://host:80 is a real non-default
    // endpoint and must NOT fold onto https://host (and vice versa)
    val noDefaultPort = regexp_replace(
      regexp_replace(noFragment, "^(http://[^/:]+):80(/|$)", "$1$2"),
      "^(https://[^/:]+):443(/|$)", "$1$2")
    val noTracking = regexp_replace(noDefaultPort,
      "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    val noDanglingAmp = regexp_replace(regexp_replace(noTracking,
      "\\?&+", "?"), "&+", "&")
    val noEmptyQuery = regexp_replace(noDanglingAmp, "[?&]+$", "")
    val canon = regexp_replace(noEmptyQuery, "^(https?://[^/]+)/$", "$1")
    // non-URL sources (the synthetic corpus's labels, file paths) pass
    // through VERBATIM: the scheme extracts would otherwise collapse
    // every non-URL to the empty key and urlDedup would fold the corpus
    when(u.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), canon).otherwise(u)
  }

  /** Stage 0b — crawl URL dedup: one document per canonical URL (min
    * doc_id keeps the deterministic copy) — runs ahead of the content
    * hashes because it needs no text at all. Documents whose source is
    * NOT a URL never participate: their dedup key is their own doc_id
    * (many docs legitimately share one non-URL source LABEL — folding
    * them would delete the corpus; URL identity only means duplicate
    * when the source actually is a URL).
    */
  def urlDedup(docs: DataFrame): DataFrame = {
    val isUrl = col("source").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://")
    val keep = docs
      .groupBy(when(isUrl, canonicalUrl(col("source")))
        .otherwise(concat(lit("doc:"), col("doc_id").cast("string"))).as("cu"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Stage 1 — quality filter: keep q65-accepted documents. The `docs`
    * form lets run() apply the rule AFTER url dedup without duplicating
    * the accept semi-join (one definition, no drift). */
  def qualityFilterOf(s: SparkSession, dir: String, docs: DataFrame): DataFrame =
    docs.join(TextAnalysis.q65CorpusFilter(s, dir)
      .filter(col("accept")).select(col("doc_id")), Seq("doc_id"), "left_semi")

  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityFilterOf(s, dir, Tables.documents(s, dir))

  /** Stage 1d — repetition filter (q196's Gopher-style rule, r11): drop
    * documents whose top-bigram or duplicated-5-gram share trips the
    * gates — the template-spam lane the q65 surface stats pass. Runs
    * AFTER the q65 gate so its (doc, gram) exchange only carries
    * already-accepted docs.
    */
  def repetitionFilter(docs: DataFrame): DataFrame =
    docs.join(TextAnalysis.repetitionOf(docs)
      .filter(col("keep")).select(col("doc_id")), Seq("doc_id"), "left_semi")

  /** Stage 1b — content-safety gate (q190's rule lanes, r9): only `clean`
    * documents continue; blocked/review rows are the s20 quarantine's
    * batch twin and are dropped from the PUBLISHED corpus here (the
    * caller keeps the full routed frame if it wants the quarantine —
    * `Safety.route` is the one shared projection).
    */
  def safetyFilter(docs: DataFrame): DataFrame =
    graft.operators.Safety.route(docs)
      .filter(col("lane") === "clean")
      .select(docs.columns.map(col): _*)

  /** Stage 1c — language-ID fill (q189's two-stage predictor, r9): crawl
    * ingest ships lang='und'; this resolves it so the partitioned publish
    * and the q68-style rebalance see real languages. Documents arriving
    * with a concrete lang keep it (the generator's labels stay
    * oracle-stable).
    */
  def langIdFill(docs: DataFrame): DataFrame =
    TextAnalysis.predictLang(docs)
      .withColumn("lang",
        when(col("lang") === "und", col("pred_lang")).otherwise(col("lang")))
      .select(docs.columns.map(col): _*)

  /** Stage 2 — exact dedup: one survivor per identical text (min doc_id). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Stage 3 — near-dup collapse: xxhash64 band pairs → connected
    * components → drop every non-survivor (keep-min-id per cluster).
    */
  def nearDupCollapse(docs: DataFrame): DataFrame = {
    val losers = Dedup.connectedComponents(
        Dedup.fastCandidatePairs(docs).select(col("doc_a"), col("doc_b")))
      .filter(col("doc_id") =!= col("label"))
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Stage 3b — cross-document SUBSTRING cut (the Lee-et-al ExactSubstr
    * pass; q154's machinery through [[TextAnalysis.substrCut]]): spans of
    * ≥ W consecutive tokens that also occur verbatim in ANOTHER surviving
    * document are cut from every non-owner copy (the min-doc_id owner
    * keeps one copy, so no content is lost from the corpus), and a
    * document cut to nothing drops. Runs AFTER the document-level dedups
    * — they remove whole-document copies cheaply; this pass pays one more
    * windowed corpus scan for the partial overlaps (pasted boilerplate
    * paragraphs, syndicated bodies) they cannot see — and BEFORE
    * decontamination/normalize, which must judge the text that actually
    * ships. `n_chars` is recomputed for the cut text when present.
    * Production W = 50 (the published ExactSubstr choice); the synthetic
    * test corpus exercises the cut at W = 15.
    */
  def substrCut(docs: DataFrame, W: Int = 50): DataFrame = {
    // Docs with NOTHING to cut keep their original text byte-for-byte:
    // new_text is the tokens rejoined with single spaces, which silently
    // collapses whitespace runs even on untouched docs — and the later
    // decontamination stage 5-grams on raw-space splits, so a normalized
    // copy could shift its grams off the bench set and miss a match the
    // raw text would have made. The drop rule applies only to docs that
    // were ACTUALLY cut (to nothing): an untouched empty/whitespace-only
    // doc has new_text = "" too, and "pass through byte-for-byte" must
    // include it — dropping is a consequence of cutting, not of being
    // short.
    val cut = docs
      .join(TextAnalysis.substrCut(docs, W)
        .filter(col("n_cut_tokens") === 0 || length(col("new_text")) > 0)
        .select(col("doc_id"), col("new_text"), col("n_cut_tokens")),
        Seq("doc_id"))
      .withColumn("text",
        when(col("n_cut_tokens") > 0, col("new_text")).otherwise(col("text")))
      .drop("new_text", "n_cut_tokens")
      .select(docs.columns.map(col): _*)
    if (cut.columns.contains("n_chars"))
      cut.withColumn("n_chars", length(col("text")).cast("long"))
    else cut
  }

  /** Stage 4 — decontamination: drop documents sharing any word-5-gram
    * with the held-out benchmark subset (doc_id % 97 == 0 stands in; the
    * benchmark docs themselves are also excluded from the corpus).
    *
    * CRITICAL: the benchmark gram set is derived from `rawDocs` — the
    * UNfiltered corpus — not from `docs`. Deriving it from the filtered
    * frame would un-gram any benchmark doc the earlier stages removed
    * (e.g. exact-deduped away in favor of a lower-id verbatim copy), and
    * that copy — literally benchmark text — would then pass
    * decontamination into the published corpus.
    */
  def decontaminate(docs: DataFrame, rawDocs: DataFrame): DataFrame = {
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = TextAnalysis.fiveGrams(rawDocs.filter(col("doc_id") % 97 === 0))
      .select(col("g")).distinct()
    val contaminated = TextAnalysis.fiveGrams(corpus)
      .join(broadcast(bench), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Stage 5 — normalize: the q64 cleaning transform (same stoplist via
    * [[TextAnalysis.enStopInList]] — no drifting copy), keeping lineage.
    */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"), col("source"),
      array_join(expr(
        s"""filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '),
           x -> x <> '' AND x NOT IN ${TextAnalysis.enStopInList})"""), " ")
        .as("clean_text"))

  /** Stage 6 (serving prep, optional) — context chunking: the published
    * clean corpus re-expressed as overlapping token-window chunks with
    * stable keys (q174's exact geometry via the SHARED
    * [[TextAnalysis.chunksOf]] transform — one definition, no drift),
    * carrying lang/source onto every chunk. What the embedding/retrieval
    * tier actually ingests; pure narrow transform, zero exchanges.
    */
  def chunk(published: DataFrame): DataFrame =
    TextAnalysis.chunksOf(published, "clean_text", Seq("lang", "source"))

  final case class Audit(stage: String, n_docs: Long, n_tokens: Long)

  /** One job per stage row: doc count + whitespace-token mass together
    * (the frames are localCheckpointed, so this re-reads checkpoint
    * blocks, not the upstream pipeline). Token attrition turns the doc
    * funnel into the budget table training actually plans against — a
    * stage that drops 1% of docs but 30% of tokens (a long-doc cut) and
    * one that drops 30% of docs but 1% of tokens (a short-spam gate)
    * read identically in docs and OPPOSITELY in tokens.
    */
  private def stageAudit(name: String, df: DataFrame,
      textCol: String = "text"): Audit = {
    val r = df.agg(
      count(lit(1)),
      coalesce(sum(graft.functions.TokenCount(col(textCol))),
        lit(0L))).head
    Audit(name, r.getLong(0), r.getLong(1))
  }

  /** Full run: documents → published clean corpus (parquet partitioned by
    * lang) + the per-stage audit. Each stage output is localCheckpointed so
    * the audit counts and the next stage share one computation instead of
    * re-running the upstream pipeline per count.
    */
  /** [[run]] with chunk output: also writes the stage-6 chunk frame
    * beside the corpus so a re-publish regenerates both together.
    */
  def runWithChunks(s: SparkSession, dir: String, outDir: String,
      chunksDir: String): (DataFrame, DataFrame) = {
    val (published, audit) = run(s, dir, outDir)
    chunk(published).write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(chunksDir)
    (published, audit)
  }

  /** Post-publish curation read: the q216 source-verdict table (dup
    * burden / hapax noise / lang-mix / length axes, corpus-relative
    * flags, ok/watch/review) regenerated over the PUBLISHED corpus — the
    * table a curator reads after every pipeline run to decide which
    * sources to drop or de-weight NEXT run. Pass a materialized frame
    * (the parquet readback [[run]] returns): the four axis scans would
    * otherwise re-run the upstream pipeline once per axis.
    */
  def sourceReport(published: DataFrame): DataFrame =
    graft.operators.TextAnalysis.sourceVerdictsOf(textColumn(published))

  /** Post-publish MIXTURE read: q232's per-source KL-from-the-blend over
    * the PUBLISHED corpus — the distance table a re-weighting (q155) or
    * DSIR-style selection consumes, regenerated after every run so the
    * mixture math always prices what actually shipped (the pipeline's
    * gates shift each source's language, so pre-pipeline KL is stale by
    * construction). Same materialized-frame contract as [[sourceReport]].
    */
  def klReport(published: DataFrame): DataFrame =
    graft.operators.TextAnalysis.sourceKlOf(textColumn(published))

  private def textColumn(published: DataFrame): DataFrame =
    // published corpora carry clean_text; raw frames carry text
    if (published.columns.contains("text")) published
    else published.withColumnRenamed("clean_text", "text")

  def run(s: SparkSession, dir: String, outDir: String,
      substrW: Int = 50): (DataFrame, DataFrame) = {
    import s.implicits._
    val raw = Tables.documents(s, dir)
    val urlDeduped = urlDedup(raw).localCheckpoint()
    val quality = qualityFilterOf(s, dir, urlDeduped).localCheckpoint()
    val filtered = repetitionFilter(quality).localCheckpoint()
    val safe = safetyFilter(langIdFill(filtered)).localCheckpoint()
    val exact = exactDedup(safe).localCheckpoint()
    val nearDup = nearDupCollapse(exact).localCheckpoint()
    val cut = substrCut(nearDup, substrW).localCheckpoint()
    val decon = decontaminate(cut, raw).localCheckpoint()
    val published = normalize(decon)
    published.write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(outDir)
    val audit = Seq(
      stageAudit("raw", raw),
      stageAudit("url_deduped", urlDeduped),
      stageAudit("quality_filtered", quality),
      stageAudit("repetition_filtered", filtered),
      stageAudit("safety_cleared", safe),
      stageAudit("exact_deduped", exact),
      stageAudit("near_dup_collapsed", nearDup),
      stageAudit("substr_cut", cut),
      stageAudit("decontaminated", decon),
      stageAudit("published", s.read.parquet(outDir), "clean_text")).toDF()
    (s.read.parquet(outDir), audit)
  }
}
