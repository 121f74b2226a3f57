package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BottomKSample, CharBigrams, CosineSimilarity, CutTokens, EditDistance, FrequentItems, GramianAgg, JaroWinkler, MinHashAgg, MoneySumUnits, RollingHash, StopCount, TokenCount, Tokens, TopNgramCount, WordNgrams}

/** SparkSessionExtensions entry point: registers graft's native functions
  * for SQL use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_char_bigrams"),
      new ExpressionInfo(classOf[CharBigrams].getName, "graft_char_bigrams"),
      (exprs: Seq[Expression]) => CharBigrams(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (exprs: Seq[Expression]) =>
        WordNgrams(exprs.head,
          GraftExtensions.foldableInt("graft_word_ngrams", "n", exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("graft_top_ngram_count"),
      new ExpressionInfo(classOf[TopNgramCount].getName, "graft_top_ngram_count"),
      (exprs: Seq[Expression]) =>
        TopNgramCount(exprs.head,
          GraftExtensions.foldableInt("graft_top_ngram_count", "n", exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("graft_cut_tokens"),
      new ExpressionInfo(classOf[CutTokens].getName, "graft_cut_tokens"),
      (exprs: Seq[Expression]) => CutTokens(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[Tokens].getName, "graft_tokens"),
      (exprs: Seq[Expression]) => Tokens(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count"),
      (exprs: Seq[Expression]) => TokenCount(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_stop_count"),
      new ExpressionInfo(classOf[StopCount].getName, "graft_stop_count"),
      (exprs: Seq[Expression]) => StopCount(exprs.head, GraftExtensions.stringList(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_edit_distance"),
      new ExpressionInfo(classOf[EditDistance].getName, "graft_edit_distance"),
      (exprs: Seq[Expression]) => EditDistance(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_frequent_items"),
      new ExpressionInfo(classOf[FrequentItems].getName, "graft_frequent_items"),
      GraftExtensions.buildFrequentItems))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      GraftExtensions.buildMinHash))
    e.injectFunction((
      FunctionIdentifier("graft_bottom_k"),
      new ExpressionInfo(classOf[BottomKSample].getName, "graft_bottom_k"),
      GraftExtensions.buildBottomK))
    e.injectFunction((
      FunctionIdentifier("graft_gramian"),
      new ExpressionInfo(classOf[GramianAgg].getName, "graft_gramian"),
      GraftExtensions.buildGramian))
    e.injectFunction((
      FunctionIdentifier("graft_money_sum"),
      new ExpressionInfo(classOf[MoneySumUnits].getName, "graft_money_sum"),
      GraftExtensions.buildMoneySum))
    e.injectOptimizerRule(_ => CosineFusion)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL MERGE INTO on catalog-served CommitLog tables → one delta-sized
    // CommitLog.merge version (see GraftMergeRule for the shape contract)
    e.injectPostHocResolutionRule(_ => GraftMergeRule)
  }
}

object GraftExtensions {
  /** Evaluates a foldable array<string> argument (e.g. `array('a','b')`)
    * into the Scala word list a [[StopCount]] needs at plan time.
    * Guarded: a column reference (not foldable), a non-array type, a NULL
    * array, or a NULL element would otherwise surface as an obscure
    * NPE/ClassCastException from inside the analyzer instead of an error
    * naming the function and its contract.
    */
  private[plans] def stringList(e: Expression): Seq[String] = {
    val okType = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    require(e.foldable && okType,
      "graft_stop_count: the word list must be a foldable array<string> " +
        s"literal (e.g. array('the','a')), got ${e.sql}")
    val arr = e.eval()
    require(arr != null, "graft_stop_count: the word list must not be NULL")
    arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map { v =>
        require(v != null,
          "graft_stop_count: the word list must not contain NULL elements")
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      }
      .toSeq
  }

  /** Validated foldable integer argument — the ONE plan-time contract
    * behind graft_word_ngrams' n, graft_top_ngram_count's n, and every
    * (col, k) aggregate's k (a drifted copy already misworded its error
    * once). */
  private[plans] def foldableInt(name: String, arg: String,
      e: Expression): Int = {
    require(e.foldable, s"$name: $arg must be a literal integer, got ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be an integer literal, got '$other'")
    }
  }
  /** Registers graft's SQL functions on an already-running session
    * (extensions only apply at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimilarity(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash",
      exprs => RollingHash(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_bigrams",
      exprs => CharBigrams(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_ngrams",
      exprs => WordNgrams(exprs.head,
        foldableInt("graft_word_ngrams", "n", exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_ngram_count",
      exprs => TopNgramCount(exprs.head,
        foldableInt("graft_top_ngram_count", "n", exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cut_tokens",
      exprs => CutTokens(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokens",
      exprs => Tokens(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_count",
      exprs => TokenCount(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_stop_count",
      exprs => StopCount(exprs.head, stringList(exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinkler(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_edit_distance",
      exprs => EditDistance(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_frequent_items",
      buildFrequentItems,
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      buildMinHash,
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gramian",
      buildGramian,
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_money_sum",
      buildMoneySum,
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottom_k",
      buildBottomK,
      "built-in")
  }

  /** Validated (col, k) SQL-builder contract, shared by every
    * k-parameterized aggregate: checked arity and a foldable integer k,
    * and returns the BARE AggregateFunction — the analyzer attaches the
    * AggregateExpression wrapper itself, which is what lets `FILTER
    * (WHERE ...)` clauses work and gives DISTINCT the proper error.
    */
  private def validatedColK(name: String, ctor: (Expression, Int) => Expression)(
      exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$name(col, k) takes exactly 2 arguments, got ${exprs.length}")
    ctor(exprs.head, foldableInt(name, "k", exprs(1)))
  }

  private[plans] val buildFrequentItems: Seq[Expression] => Expression =
    validatedColK("graft_frequent_items", FrequentItems(_, _))

  private[plans] val buildMinHash: Seq[Expression] => Expression =
    validatedColK("graft_minhash", MinHashAgg(_, _))

  /** graft_bottom_k(rank, id, k): same validated-literal-k contract as the
    * (col, k) aggregates, one position over. */
  private[plans] val buildBottomK: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_bottom_k(rank, id, k) takes exactly 3 arguments, got ${exprs.length}")
    BottomKSample(exprs.head, exprs(1),
      foldableInt("graft_bottom_k", "k", exprs(2)))
  }

  /** graft_gramian(vec): the PCA sufficient-statistics aggregate. */
  private[plans] val buildGramian: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_gramian(vec) takes exactly 1 argument, got ${exprs.length}")
    GramianAgg(exprs.head)
  }

  /** graft_money_sum(units, scale): the exact-money SUM over scaled
    * integer units (same validated-literal contract as the k-arg
    * aggregates; scale positions the decimal point of the exact total —
    * `graft_money_sum(CAST(x*100+0.5 AS BIGINT), 2)` sums cents). */
  private[plans] val buildMoneySum: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_money_sum(units, scale) takes exactly 2 arguments, got ${exprs.length}")
    MoneySumUnits(exprs.head, foldableInt("graft_money_sum", "scale", exprs(1)))
  }
}
