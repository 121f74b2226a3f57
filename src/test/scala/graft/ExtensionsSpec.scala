package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps
import graft.operators.Multimodal

/** I-block: native CosineSimilarity expression + SQL registration. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("native cosine is bit-identical to the composed HOF form") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val paired = e.as("a").crossJoin(e.as("b")).limit(2000)
      .select(
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        VectorOps.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(paired.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_cosine is SQL-callable via GraftExtensions") {
    val prev = spark // materialize shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate() // new session on the shared SparkContext
    try {
      val row = s2.sql(
        "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        "       graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o").head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(1)) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_cosine registers on an existing session") {
    graft.plans.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c").head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("graft_gramian is SQL-callable and groups correctly") {
    graft.plans.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT k, graft_gramian(v) AS g FROM VALUES
           (1, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
           (1, array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
           (2, array(CAST(5.0 AS FLOAT), CAST(6.0 AS FLOAT))) AS t(k, v)
         GROUP BY k""").collect()
      .map(r => r.getInt(0) -> r.getStruct(1)).toMap
    assert(rows(1).getLong(0) == 2L)
    assert(rows(1).getSeq[Double](1) == Seq(4.0, 6.0))
    assert(rows(1).getSeq[Double](2) == Seq(10.0, 14.0, 20.0))
    assert(rows(2).getLong(0) == 1L)
    assert(rows(2).getSeq[Double](2) == Seq(25.0, 30.0, 36.0))
  }

  test("graft_money_sum is SQL-callable: exact cents sum, FILTER support, null group, literal-scale contract") {
    graft.plans.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT k,
                CAST(graft_money_sum(c, 2) AS STRING) AS s,
                CAST(graft_money_sum(c, 2) FILTER (WHERE c > 100) AS STRING) AS big
         FROM VALUES (1, CAST(1 AS BIGINT)), (1, CAST(250 AS BIGINT)),
                     (1, CAST(NULL AS BIGINT)), (2, CAST(NULL AS BIGINT))
              AS t(k, c)
         GROUP BY k""").collect()
      .map(r => r.getInt(0) -> ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(rows(1) == ((Some("2.51"), Some("2.50"))))
    assert(rows(2) == ((None, None))) // all-NULL group sums to NULL
    val e = intercept[Exception] {
      spark.sql("SELECT graft_money_sum(CAST(1 AS BIGINT), k) FROM VALUES (2) AS t(k)")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("native cosine matches HOF NULL semantics on ragged and null-element arrays") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)) AS ragged,
                graft_cosine(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS withnull,
                graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nullarr""").head()
    assert(r.isNullAt(0), "unequal lengths must be NULL like the zip_with fold")
    assert(r.isNullAt(1), "null element must be NULL like the zip_with fold")
    assert(r.isNullAt(2))
    // HOF reference agrees
    val hofDf = spark.sql(
      """SELECT aggregate(zip_with(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D),
                          (x, y) -> x * y), 0.0D, (a, v) -> a + v) AS dot""")
    assert(hofDf.head().isNullAt(0))
  }

  test("native cosine mirrors Divide on zero-norm/empty arrays: ANSI throws, non-ANSI NULL") {
    graft.plans.GraftExtensions.register(spark)
    def firstRow(sql: String) = spark.sql(sql).head()
    def rootIsDivByZero(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[ArithmeticException] ||
        (t.getMessage != null && t.getMessage.contains("DIVIDE_BY_ZERO")) ||
        rootIsDivByZero(t.getCause))
    val hofZeroNorm =
      """aggregate(zip_with(array(0.0D, 0.0D), array(1.0D, 2.0D), (x, y) -> x * y),
                   0.0D, (a, v) -> a + v) /
         (sqrt(aggregate(zip_with(array(0.0D, 0.0D), array(0.0D, 0.0D), (x, y) -> x * y),
                         0.0D, (a, v) -> a + v)) *
          sqrt(aggregate(zip_with(array(1.0D, 2.0D), array(1.0D, 2.0D), (x, y) -> x * y),
                         0.0D, (a, v) -> a + v)))"""
    // ANSI (the Spark 4 default in every graft session): the composed form
    // throws DIVIDE_BY_ZERO, so the fused kernel must throw too — not NaN
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true", "precondition: ANSI default")
    // the reflective construction must yield Spark's real error type (the
    // SparkThrowable handlers that catch Divide's error must catch ours)
    val err = graft.functions.CosineSimilarity.divideByZeroError()
    assert(err.getClass.getName == "org.apache.spark.SparkArithmeticException",
      s"reflection fell back to ${err.getClass.getName}")
    assert(err.getMessage.contains("DIVIDE_BY_ZERO"), err.getMessage)
    assert(rootIsDivByZero(intercept[Exception] {
      firstRow(s"SELECT $hofZeroNorm AS c") }), "HOF reference must throw under ANSI")
    assert(rootIsDivByZero(intercept[Exception] {
      firstRow("SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c") }),
      "native kernel must throw under ANSI like Divide")
    assert(rootIsDivByZero(intercept[Exception] {
      firstRow("SELECT graft_cosine(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS c") }),
      "empty arrays are a zero divisor too")
    // non-ANSI: Divide yields SQL NULL — so must the kernel (never NaN)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val r = firstRow(
        s"""SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS zleft,
                   graft_cosine(array(1.0D, 2.0D), array(0.0D, 0.0D)) AS zright,
                   graft_cosine(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS empty,
                   $hofZeroNorm AS hof""")
      assert(r.isNullAt(0), "zero-norm left must be NULL, not NaN")
      assert(r.isNullAt(1), "zero-norm right must be NULL, not NaN")
      assert(r.isNullAt(2), "empty arrays must be NULL, not NaN")
      assert(r.isNullAt(3), "HOF reference must itself be NULL non-ANSI")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("native rolling hash is bit-identical to the HOF fold, incl. multibyte text") {
    val d = Tables.documents(spark, sf)
      .select(
        graft.functions.RollingHash(col("text")).as("native"),
        expr("""aggregate(split(text, ''), CAST(0 AS BIGINT),
                (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)""").as("hof"),
        col("lang"))
    assert(d.count() > 0)
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
    // corpus includes zh docs → multibyte code points are exercised
    assert(d.filter(col("lang") === "zh").count() > 0)
    // edge cases: empty string hashes to 0; null stays null
    graft.plans.GraftExtensions.register(spark)
    val edge = spark.sql(
      "SELECT graft_rolling_hash('') AS e, graft_rolling_hash(CAST(NULL AS STRING)) AS n, " +
      "       graft_rolling_hash('ab') AS ab").head()
    assert(edge.getLong(0) == 0L)
    assert(edge.isNullAt(1))
    assert(edge.getLong(2) == (97L * 31 + 98) % 1000000007L)
  }

  test("native char bigrams are bit-identical to the HOF form, incl. multibyte text") {
    val d = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 2) // the HOF reference needs the guard
      .select(
        graft.functions.CharBigrams(col("text")).as("native"),
        expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
          .as("hof"),
        col("lang"))
    assert(d.count() > 0)
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
    // corpus includes zh docs → multibyte code points are exercised
    assert(d.filter(col("lang") === "zh").count() > 0)
    // edge cases: short strings yield empty (the HOF form can't even
    // express these without the guard — sequence(1, 0) descends)
    graft.plans.GraftExtensions.register(spark)
    val edge = spark.sql(
      "SELECT graft_char_bigrams('') AS e, graft_char_bigrams('a') AS one, " +
      "       graft_char_bigrams(CAST(NULL AS STRING)) AS n, " +
      "       graft_char_bigrams('abc') AS abc").head()
    assert(edge.getSeq[String](0).isEmpty)
    assert(edge.getSeq[String](1).isEmpty)
    assert(edge.isNullAt(2))
    assert(edge.getSeq[String](3) == Seq("ab", "bc"))
  }

  test("native word ngrams are bit-identical to the HOF shingle idiom") {
    val d = Tables.documents(spark, sf)
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("w"))
      .filter(size(col("w")) >= 5)
      .select(
        graft.functions.WordNgrams(col("w"), 5).as("native5"),
        expr("""transform(sequence(1, size(w)-4),
                i -> concat_ws(' ', w[i-1], w[i], w[i+1], w[i+2], w[i+3]))""")
          .as("hof5"),
        graft.functions.WordNgrams(col("w"), 2).as("native2"),
        expr("transform(sequence(1, size(w)-1), i -> concat_ws(' ', w[i-1], w[i]))")
          .as("hof2"),
        graft.functions.WordNgrams(col("w"), 50).as("native50"),
        when(size(col("w")) >= 50, expr(
          "transform(sequence(1, size(w)-49), i -> concat_ws(' ', slice(w, i, 50)))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")).as("hof50"))
    assert(d.count() > 0)
    for (c <- Seq(("native5", "hof5"), ("native2", "hof2"), ("native50", "hof50")))
      assert(d.filter(col(c._1) =!= col(c._2)).count() == 0, c)
    // wide windows really occur (the slice variant is exercised, not vacuous)
    assert(d.filter(size(col("native50")) > 0).count() > 0)
    // edge cases: size < n → empty; NULL stays NULL; n = 1 is identity
    graft.plans.GraftExtensions.register(spark)
    val edge = spark.sql(
      "SELECT graft_word_ngrams(array('a'), 2) AS short, " +
      "       graft_word_ngrams(CAST(NULL AS ARRAY<STRING>), 3) AS n, " +
      "       graft_word_ngrams(array('x', 'y', 'z'), 1) AS one").head()
    assert(edge.getSeq[String](0).isEmpty)
    assert(edge.isNullAt(1))
    assert(edge.getSeq[String](2) == Seq("x", "y", "z"))
  }

  test("native tokens/token_count are bit-identical to the filter(split) idiom") {
    val d = Tables.documents(spark, sf)
      .select(
        graft.functions.Tokens(col("text")).as("native"),
        expr("filter(split(text, ' '), x -> x <> '')").as("hof"),
        graft.functions.TokenCount(col("text")).as("ncnt"),
        expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)").as("hcnt"),
        col("lang"))
    assert(d.count() > 0)
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
    assert(d.filter(col("ncnt") =!= col("hcnt")).count() == 0)
    assert(d.filter(col("lang") === "zh").count() > 0) // multibyte exercised
    // edges: empty, all-spaces, multi-space runs, leading/trailing —
    // split-on-' ' produces empties the filter drops; runs must match
    graft.plans.GraftExtensions.register(spark)
    for (t <- Seq("", " ", "   ", "a", " a", "a ", "a  b", "  a b  c ", "a b")) {
      val r = spark.sql(
        s"SELECT graft_tokens('$t') AS n, filter(split('$t', ' '), x -> x <> '') AS h, " +
        s"       graft_token_count('$t') AS nc").head()
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"tokens mismatch on '$t'")
      assert(r.getLong(2) == r.getSeq[String](1).length.toLong, s"count mismatch on '$t'")
    }
    val nr = spark.sql("SELECT graft_tokens(CAST(NULL AS STRING)) AS a, " +
      "graft_token_count(CAST(NULL AS STRING)) AS b").head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("native stop count is bit-identical to the IN-list filter idiom") {
    val en = Seq("the", "a", "of", "to", "and", "is")
    val inList = en.map(w => s"'$w'").mkString("(", ", ", ")")
    val d = Tables.documents(spark, sf)
      .withColumn("w", split(col("text"), " "))
      .select(
        graft.functions.StopCount(col("w"), en).as("native"),
        expr(s"size(filter(w, x -> x IN $inList))").as("hof"))
    assert(d.count() > 0)
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
    // the count is INT (the size() idiom's type) — swapped plans keep
    // their schemas bit-identical
    assert(d.schema("native").dataType == d.schema("hof").dataType)
    // edges: empty array, no hits, all hits, null element never matches
    val e = spark.sql(
      "SELECT CAST(array() AS ARRAY<STRING>) AS e0, array('x','y') AS miss, " +
      "       array('the','a','the') AS hit, array(CAST(NULL AS STRING),'the') AS nl")
      .select(
        graft.functions.StopCount(col("e0"), en).as("a"),
        graft.functions.StopCount(col("miss"), en).as("b"),
        graft.functions.StopCount(col("hit"), en).as("c"),
        graft.functions.StopCount(col("nl"), en).as("d")).head()
    assert(e.getInt(0) == 0 && e.getInt(1) == 0 && e.getInt(2) == 3 && e.getInt(3) == 1)
    // SQL registration with a foldable array literal
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_stop_count(array('the','cat','a'), array('the','a','of')) AS c").head()
    assert(r.getInt(0) == 2)
  }

  test("native top-ngram count equals max(c) of the groupBy form on the real corpus") {
    // the kernel replaces q65's (doc, trigram) explode + exchange + join:
    // max multiplicity of the window multiset must equal the groupBy max
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.WordNgrams(col("w"), 3)).as("sh"))
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).cast("int").as("agg_max"))
    val fused = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TopNgramCount(split(col("text"), " "), 3).as("tnc"),
        size(split(col("text"), " ")).as("nw"))
    val joined = fused.join(grams, Seq("doc_id"), "left").cache()
    assert(joined.count() > 0)
    // docs with >= 3 raw tokens: kernel == groupBy max; shorter docs: 0
    assert(joined.filter(col("nw") >= 3)
      .filter(col("tnc") =!= col("agg_max")).count() == 0)
    assert(joined.filter(col("nw") < 3).filter(col("tnc") =!= 0).count() == 0)
    joined.unpersist()
    // edges: empty, under-n, exact-n, all-same (overlapping windows of a
    // constant array are all equal), and SQL registration with literal n
    graft.plans.GraftExtensions.register(spark)
    val e = spark.sql(
      "SELECT graft_top_ngram_count(CAST(array() AS ARRAY<STRING>), 3) AS a, " +
      "       graft_top_ngram_count(array('x','y'), 3) AS b, " +
      "       graft_top_ngram_count(array('x','y','z'), 3) AS c, " +
      "       graft_top_ngram_count(array('x','x','x','x'), 3) AS d, " +
      "       graft_top_ngram_count(CAST(NULL AS ARRAY<STRING>), 3) AS e").head()
    assert(e.getInt(0) == 0 && e.getInt(1) == 0 && e.getInt(2) == 1 && e.getInt(3) == 2)
    assert(e.isNullAt(4))
  }

  test("native cut-tokens join is bit-identical to the index-lambda filter form on the real cut") {
    // drive the REAL q154 covered arrays (not synthetic ones) through
    // both forms: the kernel and the HOF it replaced must agree byte-
    // for-byte on every document that actually has something cut
    val docs = Tables.documents(spark, sf)
    val occ = docs
      .select(col("doc_id"), graft.functions.Tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 15)
      .select(col("doc_id"),
        posexplode(graft.functions.WordNgrams(col("w"), 15)).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), md5(col("win")).as("g"))
    val own = occ.groupBy(col("g"))
      .agg(min(col("doc_id")).as("owner"), countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("g"), col("owner"))
    val cutPos = occ.join(own, Seq("g")).filter(col("doc_id") =!= col("owner"))
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("starts"))
      .select(col("doc_id"), expr(
        "array_sort(array_distinct(flatten(transform(starts, p -> sequence(p, p + 14)))))")
        .as("covered"))
    val both = docs
      .select(col("doc_id"), graft.functions.Tokens(col("text")).as("w"))
      .join(cutPos, Seq("doc_id"))
      .select(
        graft.functions.CutTokens(col("w"), col("covered")).as("native"),
        expr("array_join(filter(w, (x, i) -> NOT array_contains(covered, CAST(i AS BIGINT))), ' ')")
          .as("hof"))
    assert(both.count() > 0, "the corpus must exercise the cut")
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // edges: empty cover, full cover, out-of-range positions ignored,
    // null token omitted like array_join, null inputs null
    graft.plans.GraftExtensions.register(spark)
    val e = spark.sql(
      "SELECT graft_cut_tokens(array('a','b','c'), CAST(array() AS ARRAY<BIGINT>)) AS a, " +
      "       graft_cut_tokens(array('a','b','c'), array(0L, 1L, 2L)) AS b, " +
      "       graft_cut_tokens(array('a','b','c'), array(1L, 99L)) AS c, " +
      "       graft_cut_tokens(array('a', CAST(NULL AS STRING), 'c'), array(2L)) AS d, " +
      "       graft_cut_tokens(CAST(NULL AS ARRAY<STRING>), array(1L)) AS e").head()
    assert(e.getString(0) == "a b c")
    assert(e.getString(1) == "")
    assert(e.getString(2) == "a c")
    assert(e.getString(3) == "a")
    assert(e.isNullAt(4))
    // public-contract guards: an UNSORTED cover cuts correctly (detected
    // and defensively sorted — the HOF form was order-insensitive and a
    // silent wrong cut is unacceptable from SQL), and a NULL cover
    // element is rejected by name
    val u = spark.sql(
      "SELECT graft_cut_tokens(array('a','b','c'), array(2L, 0L)) AS x").head()
    assert(u.getString(0) == "b")
    val nerr = intercept[Exception] {
      spark.sql("SELECT graft_cut_tokens(array('a','b'), " +
        "array(CAST(NULL AS BIGINT))) AS x").collect()
    }
    assert(nerr.getMessage.contains("NULL elements"), nerr.getMessage)
  }

  test("kernel fuzz: TopNgramCount and CutTokens match driver recomputes on 300 seeded random cases") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(14L)
    // small alphabets force heavy window collisions; sizes cross every
    // under-n / exact-n / long boundary
    val cases = (1 to 300).map { i =>
      val alpha = 2 + rnd.nextInt(9)
      val sz = rnd.nextInt(61)
      val toks = (0 until sz).map(_ => s"t${rnd.nextInt(alpha)}")
      val nCut = rnd.nextInt(sz + 3)
      val cover = (0 until nCut).map(_ => rnd.nextInt(sz + 4).toLong)
        .distinct.sorted
      val n = 1 + rnd.nextInt(5)
      (i.toLong, toks, cover, n)
    }
    val df = cases.toDF("id", "toks", "cover", "n").cache()
    val got = df.select(col("id"),
        graft.functions.TopNgramCount(col("toks"), 1).as("m1"),
        graft.functions.TopNgramCount(col("toks"), 2).as("m2"),
        graft.functions.TopNgramCount(col("toks"), 3).as("m3"),
        graft.functions.TopNgramCount(col("toks"), 5).as("m5"),
        graft.functions.CutTokens(col("toks"), col("cover")).as("cut"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    def maxMult(toks: Seq[String], n: Int): Int =
      if (toks.size < n) 0
      else toks.sliding(n).toSeq.groupBy(identity).values.map(_.size).max
    cases.foreach { case (id, toks, cover, _) =>
      val (m1, m2, m3, m5, cut) = got(id)
      assert(m1 == maxMult(toks, 1), s"case $id n=1")
      assert(m2 == maxMult(toks, 2), s"case $id n=2")
      assert(m3 == maxMult(toks, 3), s"case $id n=3")
      assert(m5 == maxMult(toks, 5), s"case $id n=5")
      val expect = toks.zipWithIndex
        .filterNot { case (_, i) => cover.contains(i.toLong) }
        .map(_._1).mkString(" ")
      assert(cut == expect, s"case $id cut")
    }
    df.unpersist(): Unit
  }

  test("SQL builders reject non-foldable / null-element word lists and n args loudly") {
    graft.plans.GraftExtensions.register(spark)
    // a column reference as the word list must name the contract, not NPE
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_stop_count(array('a'), array(c)) AS x " +
        "FROM VALUES ('a') AS t(c)").collect()
    }
    assert(e1.getMessage.contains("foldable array<string>"), e1.getMessage)
    // a NULL element inside the literal list must be rejected by name
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_stop_count(array('a'), " +
        "array('a', CAST(NULL AS STRING))) AS x").collect()
    }
    assert(e2.getMessage.contains("NULL elements"), e2.getMessage)
    // a column reference as word-ngrams n must be rejected by name
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_word_ngrams(array('a','b'), c) AS x " +
        "FROM VALUES (2) AS t(c)").collect()
    }
    assert(e3.getMessage.contains("literal integer"), e3.getMessage)
  }

  test("q42 decoded JPEG dims match the synthesis side and quarantine hits every 97th doc") {
    val feat = Multimodal.q42FeatureExtract(spark, sf).cache()
    assert(feat.count() > 0)
    // decoded dimensions must equal the synthesized side (16 + doc_id % 17)
    // — the decoder really parsed the SOF0 header, not a passthrough
    val wrongDims = feat.filter(col("decode_ok"))
      .filter(col("width") =!= (lit(16) + col("doc_id") % 17) ||
        col("height") =!= (lit(16) + col("doc_id") % 17))
    assert(wrongDims.count() == 0)
    // exactly the truncated payloads (doc_id % 97 == 0) quarantine
    val misQuarantined = feat.filter(
      (col("doc_id") % 97 === 0) =!= !col("decode_ok"))
    assert(misQuarantined.count() == 0)
    feat.unpersist()
  }
}
