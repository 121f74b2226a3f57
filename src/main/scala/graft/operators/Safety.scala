package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** S-block: content-safety filtering — the curation lane the quality /
  * perplexity / dedup / PII stack leaves open: route documents containing
  * unsafe content OUT of the training corpus, with reasons, before
  * anything downstream sees them.
  *
  * Two lanes, the q65/q153 rule-vs-model pair:
  *  - q190: RULE lane — category blocklists (regex term classes) plus
  *    shouting heuristics, integer-exact scoring, deterministic routing
  *    to `blocked` / `review` / `clean` with a reasons column. Fully
  *    SQL-oracled: every count, ratio and gate is shared verbatim with
  *    the DuckDB mirror (the q57 PII discipline — the synthetic corpus
  *    is hit-free, so the oracle gates the full zero-hit output and
  *    SafetySpec plants real hits).
  *  - q191: MODEL lane — a logistic scorer DISTILLED from q190's own
  *    verdicts (the q153 pattern verbatim: bounded hash-ordered sample,
  *    driver-trained weights, scoring as a pure codegen projection).
  *    Rows-only; SafetySpec trains it on a planted two-class corpus.
  *
  * The BLOCKLISTS ARE PLACEHOLDERS: category terms like `nsfwterm` stand
  * in for a deployment's real lexicon (which is config, not code — teams
  * maintain it like the PII patterns). The mechanism — category counts →
  * capped score → lane + reasons — is what ships and what the specs pin.
  *
  * Scale shape: q190 is a pure projection (three codegen regex counts +
  * integer arithmetic — no shuffle at any scale; the s15 gate idiom
  * `.filter($"lane" =!= 'clean').write` applies unchanged on a stream);
  * q191 adds one bounded TakeOrdered sample for training.
  */
object Safety {

  /** Category blocklists (placeholder lexicons; see object doc). Kept to
    * the regex subset Java and RE2 read identically — q57's rule. */
  private[graft] val AdultRe    = "\\b(nsfwterm|adultterm)\\b"
  private[graft] val ViolenceRe = "\\b(violenceterm|goreterm)\\b"
  private[graft] val SelfharmRe = "\\b(selfharmterm)\\b"

  /** Weights/caps of the rule score, shared with the oracle: category
    * hits are capped (two hits of one class are evidence, twenty are the
    * same document shouting), selfharm routes straight to `blocked`. */
  private val WAdult = 4000L
  private val WViolence = 3000L
  private val WSelfharm = 5000L

  /** The scoring/lane formula as ONE SQL string both engines run (the
    * q99 shared-builder rule): input columns n_adult / n_violence /
    * n_selfharm / upper_bp / excl_bp must already exist. */
  private def scoreSql: Seq[String] = Seq(
    s"""least(10000,
          $WAdult * least(n_adult, 2) +
          $WViolence * least(n_violence, 2) +
          $WSelfharm * least(n_selfharm, 2) +
          (CASE WHEN upper_bp > 3000 AND n_letters >= 20
                THEN (upper_bp - 3000) / 2 ELSE 0 END) +
          (CASE WHEN excl_bp > 500
                THEN least((excl_bp - 500) * 2, 2000) ELSE 0 END)) AS score_bp""",
    """CASE WHEN n_selfharm > 0 THEN 'blocked'
            WHEN score_bp >= 8000 THEN 'blocked'
            WHEN score_bp >= 3000 THEN 'review'
            ELSE 'clean' END AS lane""",
    """concat_ws(',',
         CASE WHEN n_adult > 0 THEN 'adult' END,
         CASE WHEN n_violence > 0 THEN 'violence' END,
         CASE WHEN n_selfharm > 0 THEN 'selfharm' END,
         CASE WHEN upper_bp > 3000 AND n_letters >= 20 THEN 'shouting' END,
         CASE WHEN excl_bp > 500 THEN 'exclamation' END) AS reasons""")

  // NOTE: score_bp's integer divisions are all on NONNEGATIVE integers,
  // so Spark's truncating `/`-via-DIV and DuckDB's flooring `//` agree;
  // the oracle mirrors with `//`. Spark's CASE arms use DIV explicitly.
  private def scoreSqlSpark: Seq[String] = scoreSql.map(_
    .replace("(upper_bp - 3000) / 2", "(upper_bp - 3000) DIV 2"))
  private def scoreSqlDuck: Seq[String] = scoreSql.map(_
    .replace("(upper_bp - 3000) / 2", "(upper_bp - 3000) // 2"))

  /** q190's feature projection over ANY (doc_id, text) frame. */
  private[graft] def ruleFeatures(docs: DataFrame): DataFrame = docs
    .withColumn("n_adult", regexp_count(lower(col("text")), lit(AdultRe)).cast("long"))
    .withColumn("n_violence", regexp_count(lower(col("text")), lit(ViolenceRe)).cast("long"))
    .withColumn("n_selfharm", regexp_count(lower(col("text")), lit(SelfharmRe)).cast("long"))
    .withColumn("n_letters",
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z]", ""))).cast("long"))
    .withColumn("n_upper",
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Z]", ""))).cast("long"))
    .withColumn("upper_bp", expr("n_upper * 10000 DIV greatest(n_letters, 1)"))
    .withColumn("excl_bp", expr(
      "CAST(length(text) - length(replace(text, '!', '')) AS BIGINT) * 10000" +
        " DIV greatest(length(text), 1)"))

  /** The rule-lane routing over ANY (doc_id, text) frame — q190's body
    * and the per-batch projection [[graft.streaming.SafetyGate]] (s20)
    * runs at ingest. A pure stateless projection: a replayed micro-batch
    * re-derives the identical lanes, which is what makes the gate's
    * per-root committed checks safe (the s16 argument). */
  def route(docs: DataFrame): DataFrame =
    ruleFeatures(docs)
      .withColumn("score_bp", expr(scoreSqlSpark.head.stripSuffix(" AS score_bp")))
      .withColumn("lane", expr(scoreSqlSpark(1).stripSuffix(" AS lane")))
      .withColumn("reasons", expr(scoreSqlSpark(2).stripSuffix(" AS reasons")))

  /** q190: rule-lane content-safety routing (see object doc). */
  def q190ContentSafety(s: SparkSession, dir: String): DataFrame =
    route(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_adult"), col("n_violence"), col("n_selfharm"),
        col("upper_bp"), col("excl_bp"), col("score_bp"), col("lane"), col("reasons"))

  /** q191's model cache — the q153 memoization contract: keyed on
    * (session identityHashCode, path) like every other driver-held model
    * memo (clusterMap, BPE merges), so a fresh session over changed data
    * at the same path retrains instead of reusing stale weights;
    * [[invalidateSafetyModelCache]] stays the same-session
    * content-staleness escape hatch. Entries for GC'd sessions can never
    * be looked up again — [[graft.DriverMemo]]'s LRU cap bounds that
    * orphan growth (round-10 advice). */
  private val safetyModelCache = new graft.DriverMemo[
    (Int, String), (Array[Double], Array[Double], Array[Double])]()

  def invalidateSafetyModelCache(): Unit = safetyModelCache.clear()

  /** model features (driver + Column side must match): ln(1+hits),
    * upper share, exclamation share, ln(1+text length). */
  private def safetyFeatureCols: Seq[Column] = Seq(
    log(col("n_adult") + col("n_violence") + col("n_selfharm") + 1),
    col("upper_bp") / 10000.0,
    col("excl_bp") / 10000.0,
    log(length(col("text")).cast("double") + 1))

  private[graft] def trainSafetyModel(
      s: SparkSession, dir: String): (Array[Double], Array[Double], Array[Double]) =
    safetyModelCache.getOrElseUpdate((System.identityHashCode(s), dir)) {
      // route() retains text (q190's final select is what drops it), so
      // the features + label come from ONE corpus pass — re-joining the
      // documents table here would add a second scan and a corpus-scale
      // shuffle join for a column the projection already has
      val rows = Safety.route(Tables.documents(s, dir))
        .withColumn("r", xxhash64(col("doc_id")))
        .orderBy(col("r"), col("doc_id")).limit(4096)
        .select((safetyFeatureCols :+
          (col("lane") =!= "clean").cast("double").as("y")): _*)
        .collect()
      val n = rows.length
      val dims = 4
      if (n == 0) (Array.fill(dims + 1)(0.0),
        Array.fill(dims)(0.0), Array.fill(dims)(1.0))
      else {
        val x = Array.tabulate(n, dims)((i, j) => rows(i).getDouble(j))
        val y = Array.tabulate(n)(i => rows(i).getDouble(dims))
        val mu = Array.tabulate(dims)(j => x.map(_(j)).sum / n)
        val sd = Array.tabulate(dims)(j =>
          math.sqrt(x.map(r => (r(j) - mu(j)) * (r(j) - mu(j))).sum / n) + 1e-9)
        val xs = Array.tabulate(n, dims)((i, j) => (x(i)(j) - mu(j)) / sd(j))
        val w = Array.fill(dims + 1)(0.0)
        for (_ <- 0 until 300) {
          val grad = Array.fill(dims + 1)(0.0)
          var i = 0
          while (i < n) {
            var z = w(0); var j = 0
            while (j < dims) { z += w(j + 1) * xs(i)(j); j += 1 }
            val err = 1.0 / (1.0 + math.exp(-z)) - y(i)
            grad(0) += err; j = 0
            while (j < dims) { grad(j + 1) += err * xs(i)(j); j += 1 }
            i += 1
          }
          for (j <- 0 to dims) w(j) -= 1.0 * grad(j) / n
        }
        (w, mu, sd)
      }
    }

  /** q191: MODEL-scored safety — the distilled-classifier lane (q153's
    * pattern over q190's verdicts: on a single-class corpus the logistic
    * degenerates to a bias-only model predicting that class, which is
    * the honest answer; SafetySpec trains on a planted two-class corpus
    * and demands ≥ 90% rule agreement + both verdicts produced).
    * Rows-only: the learned weights have no static SQL mirror.
    */
  def q191SafetyModel(s: SparkSession, dir: String): DataFrame = {
    val (w, mu, sd) = trainSafetyModel(s, dir)
    val z = safetyFeatureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * ((f - lit(mu(j))) / lit(sd(j)))
    }
    // serve off route() directly — it retains text, so q191 is a pure
    // projection over ONE corpus scan exactly like q190 (the earlier
    // doc_id re-join added a second scan + a corpus-scale shuffle for a
    // column the projection already had)
    route(Tables.documents(s, dir))
      .withColumn("model_bp",
        round(lit(10000.0) / (lit(1.0) + exp(-z))).cast("long"))
      .select(col("doc_id"), col("model_bp"),
        (col("model_bp") >= 5000).as("flag_model"),
        (col("lane") =!= "clean").as("flag_rules"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q190_content_safety" -> (q190ContentSafety _),
    "q191_safety_model"   -> (q191SafetyModel _))

  val oracles: Map[String, String] = Map(
    "q190_content_safety" ->
      s"""WITH f AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '$AdultRe')) AS BIGINT) AS n_adult,
                   CAST(len(regexp_extract_all(lower(text), '$ViolenceRe')) AS BIGINT) AS n_violence,
                   CAST(len(regexp_extract_all(lower(text), '$SelfharmRe')) AS BIGINT) AS n_selfharm,
                   CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_letters,
                   CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
                   CAST(length(text) - length(replace(text, '!', '')) AS BIGINT) AS n_excl,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents),
          r AS (
            SELECT doc_id, n_adult, n_violence, n_selfharm, n_letters,
                   n_upper * 10000 // greatest(n_letters, 1) AS upper_bp,
                   n_excl * 10000 // greatest(n_chars, 1) AS excl_bp
            FROM f),
          sc AS (
            SELECT *, ${scoreSqlDuck.head}
            FROM r),
          ln AS (
            SELECT *, ${scoreSqlDuck(1)}
            FROM sc)
          SELECT doc_id, n_adult, n_violence, n_selfharm, upper_bp, excl_bp,
                 score_bp, lane, ${scoreSqlDuck(2)}
          FROM ln""")
}
