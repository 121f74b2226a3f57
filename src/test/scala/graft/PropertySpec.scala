package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup
import graft.operators.Multimodal.{PgmCodec, WavCodec}

/** Property-based hardening of the hand-rolled kernels: the PGM codec and
  * resize (pure JVM — true generator sweeps), the rolling hash against an
  * independent BigInt reference (batched through one Spark job), and
  * connected components against a driver-side union-find on random graphs.
  * Uses scalacheck Gen directly with a fixed seed (the scalatest bridge
  * artifact isn't in the offline cache) so failures are reproducible.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def forAllSamples[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    // count executed cases: a generator that starts returning None (e.g. a
    // future suchThat) must fail the property, not green-light vacuously
    val executed = (0 until n).count { i =>
      val s = g.apply(Gen.Parameters.default, Seed(i.toLong))
      s.foreach(f)
      s.isDefined
    }
    assert(executed >= n * 8 / 10, s"only $executed/$n generator samples executed")
  }

  test("PGM encode/decode round-trips arbitrary dims and pixel bytes") {
    val genImg = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      px <- Gen.containerOfN[Array, Byte](w * h, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, px)
    forAllSamples(genImg) { case (w, h, px) =>
      val img = PgmCodec.decode(PgmCodec.encode(w, h, px))
      assert(img.exists(i => i.width == w && i.height == h && i.pixels.toSeq == px.toSeq))
    }
  }

  test("WAV encode/decode round-trips arbitrary rates and samples") {
    val genWav = for {
      rate <- Gen.choose(1, 192000)
      n <- Gen.choose(0, 2000)
      samples <- Gen.containerOfN[Array, Short](n,
        Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, samples)
    forAllSamples(genWav) { case (rate, samples) =>
      val a = WavCodec.decode(WavCodec.encode(rate, samples))
      assert(a.exists(x => x.sampleRate == rate && x.samples.toSeq == samples.toSeq))
    }
  }

  test("WAV decode never throws on arbitrary byte garbage (incl. RIFF-prefixed)") {
    val genBytes = Gen.oneOf(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)),
      // garbage AFTER a valid RIFF/WAVE preamble exercises the chunk walker
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => "RIFFxxxxWAVE".getBytes("US-ASCII") ++ tail))
    forAllSamples(genBytes) { bytes =>
      WavCodec.decode(bytes) // may be Some or None; must not throw
      assert(true)
    }
  }

  test("PGM decode never throws on arbitrary byte garbage") {
    forAllSamples(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      PgmCodec.decode(bytes) // may be Some or None; must not throw
      assert(true)
    }
  }

  test("block-average resize of a constant image is constant, any dims") {
    forAllSamples(Gen.zip(Gen.choose(8, 64), Gen.choose(8, 64), Gen.choose(0, 255))) { case (w, h, v) =>
      val img = PgmCodec.Image(w, h, Array.fill(w * h)(v.toByte))
      assert(PgmCodec.resize(img, 8).forall(_ == v))
      assert(PgmCodec.aHash(img) == 0L)
    }
  }

  test("rolling hash matches an independent BigInt reference on random unicode text") {
    // one Spark job for the whole sample: per-case jobs would be O(N) jobs
    // alphabet spans ASCII, BMP multibyte AND astral (surrogate-pair) code
    // points — an implementation iterating UTF-16 chars instead of code
    // points would only be caught by the astral cases
    val astral = Gen.listOf(Gen.choose(0x10000, 0x1FFFF))
      .map(_.flatMap(cp => Character.toChars(cp).toSeq).mkString)
    val strings = Gen.listOfN(300, Gen.oneOf(
      Gen.asciiPrintableStr,
      astral,
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('的', '是', 'ß', 'é', ' '))).map(_.mkString)))
      .apply(Gen.Parameters.default, Seed(7L)).getOrElse(Nil).distinct
    assert(strings.size > 100)
    assert(strings.exists(_.exists(Character.isHighSurrogate)), "no astral case generated")
    def reference(s: String): Long = {
      var h = BigInt(0)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h.toLong
    }
    import spark.implicits._
    val got = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.RollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    strings.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == reference(s), s"mismatch on ${s.take(40).toList}")
    }
  }

  test("connected components agree with a driver-side union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 4) {
      val n = 30
      val edges = (1 to 40).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference: union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  /** Independent greedy BPE reference (learn + apply), driver-side. */
  private object RefBpe {
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer(syms.head)
      for (x <- syms.tail) {
        if (out.last == l && x == r) { out.remove(out.length - 1); out += (l + r) }
        else out += x
      }
      out.toVector
    }
    /** (rank, left, right, merged, support) for the first n merges. */
    def learn(wc: Seq[(String, Long)], n: Int): Seq[(Int, String, String, String, Long)] = {
      var vocab = wc.map { case (w, c) => (w.map(_.toString).toVector, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      for (i <- 1 to n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- vocab; k <- 0 until syms.length - 1)
          counts((syms(k), syms(k + 1))) =
            counts.getOrElse((syms(k), syms(k + 1)), 0L) + c
        if (counts.nonEmpty) {
          val ((l, r), sup) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((i, l, r, l + r, sup))
          vocab = vocab.map { case (syms, c) => (applyMerge(syms, l, r), c) }
        }
      }
      out.toSeq
    }
    def tokenize(word: String, merges: Seq[(String, String)]): Vector[String] =
      merges.foldLeft(word.map(_.toString).toVector) {
        case (syms, (l, r)) => if (syms.length <= 1) syms else applyMerge(syms, l, r)
      }
  }

  private def wordCounts(): Seq[(String, Long)] =
    Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  test("q118 BPE merges equal an independent driver-side greedy reference") {
    val expect = RefBpe.learn(wordCounts(), 8)
    val got = graft.operators.TextAnalysis.q118BpeMerges(spark, sf).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged_sym"),
        r.getAs[Long]("support")))
      .sortBy(_._1)
    assert(got.toSeq == expect,
      s"merge sequence diverged:\n got    ${got.toSeq}\n expect $expect")
  }

  test("q121 BPE encode: per-doc token counts equal the reference tokenizer, ratios consistent") {
    val merges = RefBpe.learn(wordCounts(), 8).map(m => (m._2, m._3))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val expect = docs.map { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      (id, (words.length.toLong,
        words.map(w => RefBpe.tokenize(w, merges).length.toLong).sum,
        words.map(_.length.toLong).sum))
    }
    val got = graft.operators.TextAnalysis.q121BpeEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_word_chars")))).toMap
    assert(got == expect, "per-doc (n_words, n_tokens, n_word_chars) must equal the reference")
    // merging can only shrink: tokens never exceed chars, never fewer than words
    got.values.foreach { case (nw, nt, nc) => assert(nw <= nt && nt <= nc) }
  }

  test("native BPE encode: token arrays equal the chained HOF fold at the learned merges") {
    import spark.implicits._
    val merges = RefBpe.learn(wordCounts(), 8).map(m => (m._2, m._3))
    val vocab = wordCounts().map(_._1).distinct
    val folded = merges.foldLeft(
      vocab.toDF("word").withColumn("syms", split(col("word"), ""))) {
      case (df, (l, r)) => df.withColumn("syms",
        when(size(col("syms")) <= 1, col("syms")).otherwise(
          aggregate(
            slice(col("syms"), lit(2), size(col("syms"))),
            array(col("syms").getItem(0)),
            (acc, x) =>
              when(element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(concat(acc, array(x))))))
    }.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val native = vocab.toDF("word")
      .withColumn("syms", graft.functions.BpeEncode.encode(col("word"), merges))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(native == folded, "native expression diverged from the chained fold")
    assert(native.values.exists(_.exists(_.length > 1)), "no merge ever fired")
    // losslessness: BPE only ever CONCATENATES adjacent symbols, so the
    // token sequence must reassemble the word exactly (decode = concat)
    assert(native.forall { case (w, syms) => syms.mkString == w },
      "a token sequence no longer reassembles its word")
  }

  test("native BPE encode: exact at 2000 merges (flat plan depth), incl. multi-level merges") {
    import spark.implicits._
    // synthetic production-scale merge table: symbols merge into a growing
    // pool, so later merges fuse MERGED symbols (the multi-level case the
    // floor-scan must replay in exact rank order)
    val rnd = new scala.util.Random(42)
    val pool = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d", "e", "f")
    val merges = (1 to 2000).map { _ =>
      val l = pool(rnd.nextInt(pool.length))
      val r = pool(rnd.nextInt(pool.length))
      pool += (l + r)
      (l, r)
    }
    val words = (1 to 200).map(i =>
      (1 to (4 + rnd.nextInt(14))).map(_ => pool(rnd.nextInt(6))).mkString)
      .distinct
    val got = words.toDF("word")
      .withColumn("syms", graft.functions.BpeEncode.encode(col("word"), merges))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      val expect = RefBpe.tokenize(w, merges).toList
      assert(got(w) == expect, s"word '$w': got ${got(w)}, expect $expect")
      assert(got(w).mkString == w, "tokens must reassemble the word exactly")
    }
    // some multi-level merge actually fired (a token spanning ≥ 3 chars)
    assert(got.values.exists(_.exists(_.length >= 3)),
      "synthetic table never exercised a multi-level merge")
  }

  test("q119 z-order key: exact interleave and aligned 16-blocks are 4x4 tiles") {
    val rows = graft.operators.Geo.q119ZorderKey(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y, z) = (r.getAs[Long]("zone_x"), r.getAs[Long]("zone_y"),
        r.getAs[Long]("zkey"))
      val ref = (0 until 8).map(i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))).sum
      assert(z == ref, s"($x,$y): zkey $z != reference $ref")
    }
    // THE z-order locality guarantee: any aligned run of 16 consecutive
    // key values is a 4x4 spatial tile — both dimensions bounded at once,
    // which is exactly why range-partitioning on zkey makes parquet
    // min/max tight on zone_x AND zone_y simultaneously
    rows.groupBy(_.getAs[Long]("zkey") / 16).foreach { case (_, cells) =>
      val xs = cells.map(_.getAs[Long]("zone_x"))
      val ys = cells.map(_.getAs[Long]("zone_y"))
      assert(xs.max - xs.min <= 3 && ys.max - ys.min <= 3)
    }
  }

  test("q119 layout write plans a RangePartitioning on the z-key") {
    val df = graft.operators.Geo.q119ZorderKey(spark, sf)
      .repartitionByRange(4, col("zkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(zkey"), plan)
  }

  test("q120 EWMA equals a driver-side truncated-dyadic reference") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Long]("cents")))
    val byUser = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
    }
    val expect = scala.collection.mutable.Map.empty[Long, Double]
    for ((_, es) <- byUser; t <- es.indices) {
      var (num, den) = (0.0, 0.0)
      for (j <- 0 until 8 if t - j >= 0) {
        val w = math.pow(0.5, j + 1)
        num += es(t - j)._4 * w
        den += w
      }
      expect(es(t)._3) = num / den
    }
    graft.operators.Events.q120Ewma(spark, sf).collect().foreach { r =>
      val want = expect(r.getAs[Long]("event_id"))
      assert(math.abs(r.getAs[Double]("ewma_cents") - want) < 1e-3,
        s"event ${r.getAs[Long]("event_id")}: ${r.getAs[Double]("ewma_cents")} vs $want")
    }
  }

  test("q204 source dup profile equals an independent countDistinct-join recompute") {
    val got = graft.operators.TextAnalysis.q204SourceDupProfile(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_dup_within"), r.getAs[Long]("n_dup_cross"),
        r.getAs[Long]("within_bp"), r.getAs[Long]("cross_bp")))).toMap
    // independent shape: explicit countDistinct aggregates joined back —
    // the pre-r13 q203 pattern — instead of the min≠max windows
    val ch = graft.operators.TextAnalysis
      .chunksOf(Tables.documents(spark, sf), "text", Seq("source"))
      .select(col("source"), col("doc_id"), md5(col("chunk_text")).as("g"))
      .cache()
    val cross = ch.groupBy("g").agg(countDistinct("source").as("ns"))
    val within = ch.groupBy("g", "source").agg(countDistinct("doc_id").as("ndw"))
    val ref = ch.join(cross, "g").join(within, Seq("g", "source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ndw") >= 2, 1L).otherwise(0L)).as("w"),
        sum(when(col("ns") >= 2, 1L).otherwise(0L)).as("x"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w"), r.getAs[Long]("x")))).toMap
    ch.unpersist()
    assert(got.nonEmpty && got.keySet == ref.keySet)
    ref.foreach { case (s0, (n, w, x)) =>
      assert(got(s0) == ((n, w, x, w * 10000 / n, x * 10000 / n)), s0)
    }
    // both duplication axes are live in the synthetic corpus
    assert(got.values.exists(_._2 > 0), "no within-source dup found")
    assert(got.values.exists(_._3 > 0), "no cross-source dup found")
  }

  test("q205 lang fertility equals a driver-side regex recompute") {
    val got = graft.operators.TextAnalysis.q205LangFertility(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("fertility_x100"), r.getAs[Long]("tokens_per_10k_chars")))).toMap
    val re = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]".r
    val ref = Tables.documents(spark, sf).select("lang", "text").collect()
      .groupBy(_.getString(0)).map { case (l, rows) =>
        val w = rows.map(_.getString(1).split(" ").count(_.nonEmpty).toLong).sum
        val t = rows.map(r => re.findAllIn(r.getString(1)).size.toLong).sum
        val c = rows.map(_.getString(1).length.toLong).sum
        l -> ((rows.length.toLong, w, t, c,
          t * 100 / math.max(w, 1), t * 10000 / math.max(c, 1)))
      }
    assert(got == ref, s"got $got\nref $ref")
    assert(got.nonEmpty && got.values.forall(_._6 > 0))
  }

  test("q206 vocab growth equals a driver-side word-count recompute") {
    val got = graft.operators.TextAnalysis.q206VocabGrowth(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"),
        r.getAs[Long]("ttr_bp"), r.getAs[Long]("hapax_bp")))).toMap
    val ref = Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getString(0)).map { case (src, rows) =>
        val counts = scala.collection.mutable.Map.empty[String, Long]
        rows.foreach(_.getString(1).split(" ").filter(_.nonEmpty)
          .foreach(w => counts(w) = counts.getOrElse(w, 0L) + 1L))
        val nTok = counts.values.sum
        val nTyp = counts.size.toLong
        val nHap = counts.values.count(_ == 1L).toLong
        src -> ((nTok, nTyp, nHap, nTyp * 10000 / nTok, nHap * 10000 / nTyp))
      }
    assert(got == ref, s"got $got\nref $ref")
    // diversity signal is live: sources differ in TTR
    assert(got.values.map(_._4).toSet.size > 1)
  }

  test("q207 zipf slope equals a driver-side quantized-log regression") {
    val got = graft.operators.TextAnalysis.q207ZipfSlope(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("zipf_slope_x1000")))).toMap
    val wordRe = "^[A-Za-z]+$".r
    val ref = Tables.documents(spark, sf).select("lang", "text").collect()
      .groupBy(_.getString(0)).flatMap { case (lang, rows) =>
        val counts = scala.collection.mutable.Map.empty[String, Long]
        rows.foreach(_.getString(1).split(" ")
          .filter(w => wordRe.findFirstIn(w).isDefined)
          .foreach { w0 => val w = w0.toLowerCase
            counts(w) = counts.getOrElse(w, 0L) + 1L })
        val top = counts.toSeq.sortBy { case (w, f) => (-f, w) }.take(100)
        if (top.size < 10) None else {
          val q = top.zipWithIndex.map { case ((_, f), i) =>
            (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(f.toDouble) * 1e6))
          }
          val n = q.size.toLong
          val (slr, slf) = (q.map(_._1).sum, q.map(_._2).sum)
          val slrlf = q.map(p => p._1 * p._2).sum
          val slrlr = q.map(p => p._1 * p._1).sum
          val slope = math.round((n * slrlf - slr * slf).toDouble /
            (n * slrlr - slr * slr).toDouble * 1000)
          Some(lang -> ((n, slope)))
        }
      }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // natural-text sanity: every fitted slope is negative (freq falls with rank)
    assert(got.nonEmpty && got.values.forall(_._2 < 0L))
  }

  test("q208 char-class profile equals a driver-side code-point census") {
    val got = graft.operators.Quality.q208CharClassProfile(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("upper_bp"), r.getAs[Long]("lower_bp"),
        r.getAs[Long]("digit_bp"), r.getAs[Long]("space_bp"),
        r.getAs[Long]("other_bp")))).toMap
    val ref = Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getString(0)).map { case (src, rows) =>
        var (nc, nu, nl, nd, nsp) = (0L, 0L, 0L, 0L, 0L)
        rows.foreach { r =>
          val t = r.getString(1)
          var i = 0
          while (i < t.length) {
            val cp = t.codePointAt(i)
            nc += 1
            if (cp >= 'A' && cp <= 'Z') nu += 1
            else if (cp >= 'a' && cp <= 'z') nl += 1
            else if (cp >= '0' && cp <= '9') nd += 1
            else if (cp == ' ') nsp += 1
            i += Character.charCount(cp)
          }
        }
        val d = math.max(nc, 1L)
        src -> ((rows.length.toLong, nc, nu * 10000 / d, nl * 10000 / d,
          nd * 10000 / d, nsp * 10000 / d, (nc - nu - nl - nd - nsp) * 10000 / d))
      }
    assert(got == ref, s"got $got\nref $ref")
    // letters and spaces are live everywhere; the five floored shares
    // reassemble to 10000 bp within floor slack. The synthetic corpus is
    // pure lowercase+space (upper/digit/other structurally 0 bp), so the
    // interesting classes are exercised on a PLANTED frame below — the
    // q57/q190 hit-free-corpus discipline.
    assert(got.values.forall(v => v._4 > 0) && got.values.forall(v => v._6 > 0))
    got.values.foreach { v =>
      val s = v._3 + v._4 + v._5 + v._6 + v._7
      assert(s <= 10000L && s >= 10000L - 5L, s"bp sum $s")
    }
    import spark.implicits._
    val planted = Seq(
      ("shout", "AAAA BBB!"),          // 7 upper, 1 space, 1 other of 9
      ("table", "12 345 6789"),        // 9 digit, 2 space of 11
      ("clean", "plain words here"))   // lower+space only
      .toDF("source", "text")
    val p = graft.operators.Quality.charClassProfile(planted).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("upper_bp"),
        r.getAs[Long]("lower_bp"), r.getAs[Long]("digit_bp"),
        r.getAs[Long]("space_bp"), r.getAs[Long]("other_bp")))).toMap
    assert(p("shout") == ((7777L, 0L, 0L, 1111L, 1111L)), p("shout"))
    assert(p("table") == ((0L, 0L, 8181L, 1818L, 0L)), p("table"))
    assert(p("clean") == ((0L, 8750L, 0L, 1250L, 0L)), p("clean"))
  }

  test("q132 duplicate-coverage equals a driver-side brute force on every doc") {
    val got = graft.operators.TextAnalysis.q132DupCoverage(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("dupword_bp"), r.getAs[Long]("dup5_bp")))
      .toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { r =>
      val id = r.getLong(0)
      // split limit -1: Spark's split keeps trailing empty tokens
      val w = r.getString(1).split(" ", -1)
      val n = w.length.toLong
      val dupw = (n - w.distinct.length) * 10000 / math.max(n, 1)
      val g5 = w.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toVector
      val dup5 = if (g5.nonEmpty) (g5.size - g5.distinct.size).toLong * 10000 / g5.size else 0L
      assert(got(id) == ((n, dupw, dup5)), s"doc $id: got ${got(id)}, want ($n, $dupw, $dup5)")
    }
    // the two signals are genuinely different axes: some doc must repeat
    // words without repeating any 5-gram (else the metric is redundant)
    assert(got.values.exists { case (_, dw, d5) => dw > 0 && d5 == 0 })
  }

  test("q168 novelty equals a driver-side brute force on every >=5-word doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .filter(_._2.size >= 5)
    val docGrams = docs.map { case (id, w) =>
      id -> w.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    }
    val df = docGrams.flatMap(_._2).groupBy(identity).map { case (g, v) => g -> v.size }
    val want = docGrams.map { case (id, gs) =>
      val uniq = gs.count(df(_) == 1).toLong
      id -> ((gs.size.toLong, uniq, uniq * 10000 / gs.size))
    }.toMap
    val got = graft.operators.TextAnalysis.q168Novelty(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_distinct_grams"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("novelty_bp")))).toMap
    assert(got == want)
    // the axis must discriminate: not every doc equally novel
    assert(got.values.map(_._3).toSet.size > 1, "novelty_bp is constant")
  }

  test("q174 chunks: reconstruction, geometry and key-stability invariants") {
    val chunks = graft.operators.TextAnalysis.q174DocChunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_no"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_key"), r.getAs[String]("chunk_text")))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    assert(chunks.map(_._1).toSet == docs.keySet, "every doc chunks")
    val byDoc = chunks.groupBy(_._1)
    byDoc.foreach { case (id, cs) =>
      val toks = docs(id)
      val w = 32; val s = 24
      val wantChunks = if (toks.size <= w) 1L else ((toks.size - w + s - 1) / s + 1).toLong
      assert(cs.length.toLong == wantChunks && cs.forall(_._3 == wantChunks))
      cs.sortBy(_._2).foreach { case (_, i, _, nt, key, text) =>
        val want = toks.slice((i * s).toInt, (i * s).toInt + w)
        assert(text == want.mkString(" "), s"doc $id chunk $i text")
        assert(nt == want.size.toLong, s"doc $id chunk $i token count")
        assert(key == s"$id#$i")
      }
      // coverage: strides tile the doc — every token lands in some chunk
      val covered = cs.flatMap(c => (c._2 * s) until (c._2 * s + w)).map(_.toInt).toSet
      assert(toks.indices.forall(covered.contains), s"doc $id has uncovered tokens")
    }
    // overlap really happens for long docs at this SF
    assert(byDoc.values.exists(_.length > 1), "no multi-chunk doc at spec SF")
  }

  test("q178 split leakage: brute-force gram recompute; short eval docs reported, not dropped") {
    val got = graft.operators.TextAnalysis.q178SplitLeakage(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_leaked"),
          r.getAs[Long]("leak_bp"), r.getAs[Boolean]("quarantine")))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    def coin(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((h(0) & 0xff).toLong)
    }
    def splitOf(id: Long): String =
      if (coin(id) < 204) "train" else if (coin(id) < 230) "val" else "test"
    val gramSets = docs.map { case (id, w) =>
      id -> (if (w.size >= 5) w.sliding(5).map(_.mkString(" ")).toSet else Set.empty[String])
    }.toMap
    val trainGrams = gramSets.collect {
      case (id, gs) if splitOf(id) == "train" => gs }.foldLeft(Set.empty[String])(_ ++ _)
    val evalIds = docs.map(_._1).filter(splitOf(_) != "train").toSet
    assert(got.keySet == evalIds, "exactly the eval docs are audited")
    evalIds.foreach { id =>
      val gs = gramSets(id)
      val leaked = gs.count(trainGrams.contains).toLong
      val bp = if (gs.nonEmpty) leaked * 10000 / gs.size else 0L
      assert(got(id) == ((splitOf(id), gs.size.toLong, leaked, bp, bp >= 1000)), s"doc $id")
    }
    // the audit discriminates on this corpus: some leakage, not total
    val bps = got.values.map(_._4)
    assert(bps.exists(_ > 0), "no leakage found - vacuous at spec SF")
    // the short-doc lane (n_grams = 0 reported, not dropped) has no natural
    // member at spec SF (min doc length is 10 words) — it is covered by the
    // keyset equality above: EVERY eval doc appears regardless of length
  }

  test("q209 PMI collocations equal a driver-side quantized-log recompute") {
    val got = graft.operators.TextAnalysis.q209PmiCollocations(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("pmi_micro"), r.getAs[Int]("rank")))).toMap
    def lq(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ref = Tables.documents(spark, sf).select("lang", "text").collect()
      .groupBy(_.getString(0)).flatMap { case (lang, rows) =>
        val uni = scala.collection.mutable.Map.empty[String, Long]
        val bi = scala.collection.mutable.Map.empty[(String, String), Long]
        rows.foreach { r =>
          val w = r.getString(1).split(" ").filter(_.nonEmpty)
          w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1L)
          w.sliding(2).filter(_.length == 2).foreach { p =>
            bi((p(0), p(1))) = bi.getOrElse((p(0), p(1)), 0L) + 1L }
        }
        val (nUni, nBi) = (uni.values.sum, bi.values.sum)
        bi.toSeq.filter(_._2 >= 5L)
          .map { case ((a, b), c) =>
            (a, b, c, lq(c) + 2 * lq(nUni) - lq(nBi) - lq(uni(a)) - lq(uni(b))) }
          .sortBy { case (a, b, _, p) => (-p, a, b) }.take(20).zipWithIndex
          .map { case ((a, b, c, p), i) => (lang, a, b) -> ((c, p, i + 1)) }
      }.toMap
    assert(got == ref, s"got ${got.size} ref ${ref.size}")
    // signal is live: PMI separates pairs (non-constant) and ranks are full
    assert(got.values.map(_._2).toSet.size > 1)
    got.keys.map(_._1).foreach { lang =>
      val ranks = got.collect { case ((l, _, _), (_, _, rk)) if l == lang => rk }.toSeq.sorted
      assert(ranks == (1 to ranks.size).toSeq, s"$lang ranks $ranks")
    }
  }

  test("q210 threshold curve equals an exact-shingle recompute over q31's pairs") {
    val got = Dedup.q210ThresholdCurve(spark, sf).collect()
      .map(r => r.getAs[Long]("threshold_bp") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs")))).toMap
    val pairs = Dedup.q31NgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shset(id: Long): Set[String] = {
      val w = texts(id).split(" ")
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val bp = pairs.map { case (a, b) =>
      val (sa, sb) = (shset(a), shset(b))
      val ni = (sa & sb).size.toLong
      (a, b, ni * 10000L / (sa.size + sb.size - ni))
    }
    val ref = Seq(5000L, 6000L, 7000L, 8000L, 9000L).map { t =>
      val sel = bp.filter(_._3 >= t)
      t -> ((sel.length.toLong,
        sel.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong))
    }.filter(_._2._1 > 0L).toMap
    assert(got == ref, s"got $got\nref $ref")
    // the curve is live and monotone non-increasing in the threshold
    assert(got.nonEmpty)
    got.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(got(a)._1 >= got(b)._1 && got(a)._2 >= got(b)._2, s"$a -> $b")
      case _ => ()
    }
  }

  test("q211 source lang mix equals a driver-side entropy recompute") {
    val got = graft.operators.TextAnalysis.q211SourceLangMix(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_langs"), r.getAs[String]("top_lang"),
        r.getAs[Long]("top_share_bp"), r.getAs[Long]("entropy_x1000")))).toMap
    def lq(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ref = Tables.documents(spark, sf).select("source", "lang").collect()
      .groupBy(_.getString(0)).map { case (src, rows) =>
        val cnts = rows.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length.toLong }
        val n = cnts.values.sum
        val (topLang, topCnt) = cnts.toSeq.sortBy { case (l, c) => (-c, l) }.head
        val num = lq(n) * n - cnts.values.map(c => c * lq(c)).sum
        src -> ((n, cnts.size.toLong, topLang, topCnt * 10000L / n,
          math.round(num / n.toDouble / 1000.0)))
      }
    assert(got == ref, s"got $got\nref $ref")
    // mixes are live: multi-lang sources exist and entropy is positive there
    assert(got.values.exists(v => v._2 > 1L && v._5 > 0L))
    // a single-lang source (if any) must price at exactly 0 entropy
    got.values.filter(_._2 == 1L).foreach(v => assert(v._5 == 0L && v._4 == 10000L))
  }

  test("q213 term burstiness equals a driver-side cf/df recompute") {
    val got = graft.operators.TextAnalysis.q213TermBurstiness(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> ((r.getAs[Long]("cf"),
        r.getAs[Long]("df"), r.getAs[Long]("burstiness_x100")))).toMap
    val cf = scala.collection.mutable.Map.empty[String, Long]
    val docsOf = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      val id = r.getLong(0)
      r.getString(1).split(" ").filter(_.nonEmpty).foreach { w =>
        cf(w) = cf.getOrElse(w, 0L) + 1L
        docsOf.getOrElseUpdate(w, scala.collection.mutable.Set.empty) += id
      }
    }
    val ref = cf.toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
      .map { case (w, c) =>
        w -> ((c, docsOf(w).size.toLong, c * 100L / docsOf(w).size)) }.toMap
    assert(got == ref, s"got ${got.size} ref ${ref.size}")
    // burstiness is live: every doc-spanning term repeats (cf > df here),
    // and the ratio separates terms
    assert(got.values.exists(_._3 > 100L) && got.values.map(_._3).toSet.size > 1)
  }

  test("q214 length deciles equal a driver-side cumulative recompute") {
    val got = graft.operators.TextAnalysis.q214LengthDeciles(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("p25_tokens"), r.getAs[Long]("p50_tokens"),
        r.getAs[Long]("p75_tokens"), r.getAs[Long]("p90_tokens"),
        r.getAs[Long]("max_tokens")))).toMap
    val ref = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .groupBy(_._1).map { case (src, rows) =>
        val lens = rows.map(_._2).sorted
        val n = lens.length.toLong
        def pct(p: Long): Long = {
          // smallest length whose cumulative count reaches ceil(n·p/100)
          val need = (n * p + 99L) / 100L
          lens((need - 1L).toInt)
        }
        src -> ((n, pct(25), pct(50), pct(75), pct(90), lens.last))
      }
    assert(got == ref, s"got $got\nref $ref")
    // deciles are ordered and live
    got.values.foreach { v =>
      assert(v._2 <= v._3 && v._3 <= v._4 && v._4 <= v._5 && v._5 <= v._6) }
    assert(got.values.exists(v => v._2 < v._5))
  }

  test("q215 vocab coverage equals a driver-side rank recompute") {
    val got = graft.operators.TextAnalysis.q215VocabCoverage(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("top10_bp"),
        r.getAs[Long]("top100_bp"), r.getAs[Long]("top1000_bp")))).toMap
    val ref = Tables.documents(spark, sf).select("lang", "text").collect()
      .groupBy(_.getString(0)).map { case (lang, rows) =>
        val cnt = scala.collection.mutable.Map.empty[String, Long]
        rows.foreach(_.getString(1).split(" ").filter(_.nonEmpty)
          .foreach(w => cnt(w) = cnt.getOrElse(w, 0L) + 1L))
        val ranked = cnt.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._2)
        val n = ranked.sum
        def top(k: Int): Long = ranked.take(k).sum * 10000L / n
        lang -> ((n, ranked.length.toLong, top(10), top(100), top(1000)))
      }
    assert(got == ref, s"got $got\nref $ref")
    // coverage is monotone in k and the head is a strict subset somewhere
    got.values.foreach(v => assert(v._3 <= v._4 && v._4 <= v._5))
    assert(got.values.exists(v => v._3 < v._4 || v._4 < v._5) ||
      got.values.forall(_._2 <= 10L))
    assert(got.values.exists(_._3 > 0L))
  }

  test("q216 source verdicts equal a recompute from their four component queries") {
    val got = graft.operators.TextAnalysis.q216SourceVerdicts(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("flag_mirror"),
        r.getAs[Long]("flag_template"), r.getAs[Long]("flag_ocr"),
        r.getAs[Long]("flag_mix"), r.getAs[Long]("risk"),
        r.getAs[String]("verdict")))).toMap
    // recompute flags from the four already-verified component queries
    val cross = graft.operators.TextAnalysis.q204SourceDupProfile(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("within_bp"), r.getAs[Long]("cross_bp")))).toMap
    val hapax = graft.operators.TextAnalysis.q206VocabGrowth(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("hapax_bp")).toMap
    val ent = graft.operators.TextAnalysis.q211SourceLangMix(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("entropy_x1000")).toMap
    val n = cross.size.toLong
    def flags(m: Map[String, Long]): Map[String, Long] = {
      val tot = m.values.sum
      m.map { case (s, v) => s -> (if (v * n > tot) 1L else 0L) }
    }
    val fm = flags(cross.map { case (s, v) => s -> v._2 })
    val ft = flags(cross.map { case (s, v) => s -> v._1 })
    val fo = flags(hapax)
    val fx = flags(ent)
    val ref = cross.keys.map { s =>
      val risk = fm(s) + ft(s) + fo(s) + fx(s)
      s -> ((fm(s), ft(s), fo(s), fx(s), risk,
        if (risk >= 3L) "review" else if (risk == 2L) "watch" else "ok"))
    }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // the corpus-relative thresholds split the sources: flags fire
    // somewhere and stay off somewhere for at least one axis
    assert(got.values.exists(_._5 > 0L) && got.values.exists(_._5 < 4L))
  }

  test("q216 verdict table keeps a source whose docs are all empty/whitespace") {
    // such a source explodes no tokens and vanishes from the vocab axis;
    // the left-joined composition must still row it (NULL axis values,
    // the missing axis's flag 0) rather than silently drop it
    import TestSpark.spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "en", "s_ok"),
      (2L, "a wholly different document with its own words here", "en", "s_ok"),
      (3L, "   ", "en", "s_empty"),
      (4L, "", "en", "s_empty"))
      .toDF("doc_id", "text", "lang", "source")
    val got = graft.operators.TextAnalysis.sourceVerdictsOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet == Set("s_ok", "s_empty"), got.keySet)
    val e = got("s_empty")
    assert(e.isNullAt(e.fieldIndex("hapax_bp"))) // vocab axis genuinely absent
    assert(e.getAs[Long]("flag_ocr") == 0L)      // NULL never fires a flag
    val fl = Seq("flag_mirror", "flag_template", "flag_ocr", "flag_mix")
      .map(e.getAs[Long](_))
    assert(e.getAs[Long]("risk") == fl.sum)
  }

  test("q230 rejection-by-length equals a driver recompute; deciles cover the corpus near-evenly") {
    val verdicts = graft.operators.TextAnalysis.q65CorpusFilter(spark, sf)
      .collect().map(r => (r.getAs[Long]("n_words"),
        Option(r.getAs[String]("reject_reason")).getOrElse("accepted")))
    val n = verdicts.length.toLong
    // value-domain decile: cum count of strictly-shorter docs * 10 / n
    val byLen = verdicts.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val lens = byLen.keys.toSeq.sorted
    val cumBefore = lens.zip(lens.scanLeft(0L)((acc, v) => acc + byLen(v))).toMap
    def decileOf(v: Long): Long = cumBefore(v) * 10L / n
    val ref = verdicts.groupBy { case (w, o) => (decileOf(w), o) }
      .map { case (k, rows) => k -> rows.length.toLong }
    val perDec = ref.toSeq.groupBy(_._1._1)
      .map { case (d, rows) => d -> rows.map(_._2).sum }
    val got = graft.operators.TextAnalysis.q230RejectionByLength(spark, sf)
      .collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("decile"), r.getAs[String]("outcome"))
      assert(r.getAs[Long]("n_docs") == ref(key), s"$key n_docs")
      assert(r.getAs[Long]("share_bp") ==
        ref(key) * 10000L / perDec(key._1), s"$key share")
    }
    // ties share a decile, so occupancy is only NEAR-even — but every
    // decile must exist and hold a sane share of the corpus
    assert(perDec.keySet == (0L to 9L).toSet, perDec.toString)
    perDec.values.foreach(c => assert(c >= n / 20 && c <= n / 4, perDec.toString))
  }

  test("q229 tier-by-source equals a recompute from q162's verified tiers") {
    val tiers = graft.operators.TextAnalysis.q162CcnetTiers(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("tier"), r.getAs[Long]("avg_nll_micro")))).toMap
    val srcOf = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = tiers.toSeq
      .groupBy { case (id, (t, _)) => (srcOf(id), t) }
      .map { case ((src, t), rows) =>
        val n = rows.length.toLong
        val sum = rows.map(_._2._2).sum
        (src, t) -> ((n, sum / n))
      }
    val perSource = ref.toSeq.groupBy(_._1._1)
      .map { case (s0, rows) => s0 -> rows.map(_._2._1).sum }
    val got = graft.operators.TextAnalysis.q229TierBySource(spark, sf).collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("tier"))
      val (n, mean) = ref(key)
      assert(r.getAs[Long]("n_docs") == n, s"$key n_docs")
      assert(r.getAs[Long]("mean_nll_micro") == mean, s"$key mean")
      assert(r.getAs[Long]("share_bp") == n * 10000L / perSource(key._1), s"$key share")
    }
    // liveness: the tier mix separates sources somewhere
    assert(got.map(_.getAs[Long]("share_bp")).distinct.length > 1)
  }

  test("q217 diurnal entropy equals a driver-side hour-census recompute") {
    val got = graft.operators.Events.q217DiurnalEntropy(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_events"),
        r.getAs[Long]("n_hours"), r.getAs[Long]("peak_hour"),
        r.getAs[Long]("peak_share_bp"), r.getAs[Long]("entropy_x1000")))).toMap
    def lq(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ref = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L % 24L))
      .groupBy(_._1).map { case (et, rows) =>
        val cnts = rows.groupBy(_._2).map { case (h, rs) => h -> rs.length.toLong }
        val n = cnts.values.sum
        val (peak, peakCnt) = cnts.toSeq.sortBy { case (h, c) => (-c, h) }.head
        val num = lq(n) * n - cnts.values.map(c => c * lq(c)).sum
        et -> ((n, cnts.size.toLong, peak, peakCnt * 10000L / n,
          math.round(num / n.toDouble / 1000.0)))
      }
    assert(got == ref, s"got $got\nref $ref")
    // synthetic events are near-uniform over the day: every type covers
    // all 24 hours and sits near ln 24 = 3178 millinats — the liveness
    // check is that entropy is high AND the peak share is small
    assert(got.values.forall(v => v._2 == 24L && v._5 > 3000L && v._4 < 1000L))
  }

  test("q253 audience overlap equals a driver-side user-set recompute") {
    val got = graft.operators.Events.q253AudienceOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_users_a"), r.getAs[Long]("n_users_b"),
          r.getAs[Long]("n_shared"), r.getAs[Long]("jaccard_bp"),
          r.getAs[Long]("overlap_bp")))).toMap
    val sets = Tables.events(spark, sf).select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    val types = sets.keys.toSeq.sorted
    val ref = (for {
      a <- types; b <- types if a < b
      (sa, sb) = (sets(a), sets(b))
      sh = (sa & sb).size.toLong
    } yield (a, b) -> ((sa.size.toLong, sb.size.toLong, sh,
      sh * 10000L / (sa.size + sb.size - sh),
      sh * 10000L / math.min(sa.size, sb.size)))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // full matrix: every unordered type pair rows exactly once
    assert(got.size == types.size * (types.size - 1) / 2)
  }

  test("q254 user-type entropy equals the shared-kernel driver recompute; flags are the rule") {
    val got = graft.operators.Events.q254UserTypeEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_events"),
        r.getAs[Long]("n_types"), r.getAs[String]("top_type"),
        r.getAs[Long]("top_share_bp"), r.getAs[Long]("entropy_x1000"),
        r.getAs[Boolean]("suspicious")))).toMap
    def lq(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ref = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).flatMap { case (u, rows) =>
        val cnts = rows.groupBy(_._2).map { case (t, rs) => t -> rs.length.toLong }
        val n = cnts.values.sum
        if (n < 20) None else {
          val (top, topCnt) = cnts.toSeq.sortBy { case (t, c) => (-c, t) }.head
          val num = lq(n) * n - cnts.values.map(c => c * lq(c)).sum
          val shareBp = topCnt * 10000L / n
          Some(u -> ((n, cnts.size.toLong, top, shareBp,
            math.round(num / n.toDouble / 1000.0),
            n >= 50 && shareBp >= 9000)))
        }
      }
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("q258 dow profile equals a driver recompute; the 7-cell grid is complete") {
    val got = graft.operators.Stats.q258DowProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        Option(r.getAs[Any]("mean_daily")).map(_.asInstanceOf[Long]),
        r.getLong(5), r.getLong(6)))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), rs) => (t, d) -> rs.length.toLong }
    val types = daily.keys.map(_._1).toSet
    assert(got.keySet == types.flatMap(t => (0L to 6L).map(t -> _)),
      "every (type, dow) grid cell rows")
    types.foreach { t =>
      val cells = daily.toSeq.collect { case ((`t`, d), n) => ((d + 4) % 7, n) }
      val tt = cells.map(_._2).sum
      (0L to 6L).foreach { dw =>
        val mine = cells.filter(_._1 == dw).map(_._2)
        val (nd, ne) = (mine.size.toLong, mine.sum)
        val want = (nd, ne, if (nd > 0) Some(ne / nd) else None,
          ne * 10000L / tt, Math.floorDiv(ne * 7L * 10000L, tt) - 10000L)
        assert(got((t, dw)) == want, s"($t, $dw): ${got((t, dw))} != $want")
      }
    }
  }

  test("q259 substring savings reconcile against the oracled q154 per-doc table") {
    val docsSrc = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = graft.operators.TextAnalysis.q154SubstrCut(spark, sf).collect()
      .map(r => (docsSrc(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val want = perDoc.groupBy(_._1).map { case (src, rows) =>
      val nt = rows.map(_._2).sum; val cut = rows.map(_._3).sum
      src -> ((rows.size.toLong, nt, cut, rows.count(_._3 > 0).toLong,
        cut * 10000L / math.max(nt, 1L)))
    }
    val got = graft.operators.TextAnalysis.q259SubstrSavingsBySource(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    // liveness: the corpus carries cross-doc W=15 windows somewhere
    assert(got.values.exists(_._3 > 0L), "no substring savings anywhere — vacuous")
  }

  test("q260 k-anonymity curve equals a driver recompute and is monotone in k") {
    val got = graft.operators.Privacy.q260KanonKCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val cells = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
    val te = cells.sum
    val want = Seq(2L, 5L, 10L, 20L, 50L).map { k =>
      val sup = cells.filter(_ < k)
      k -> ((cells.length.toLong, sup.length.toLong,
        (cells.length - sup.length).toLong, sup.sum, sup.sum * 10000L / te))
    }.toMap
    assert(got == want)
    val ordered = got.toSeq.sortBy(_._1).map(_._2._5)
    assert(ordered.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
      "suppression cost must be monotone in k")
  }

  test("q264 centroid matrix equals a driver-side centroid recompute; full matrix") {
    val got = graft.operators.Similarity.q264LabelCentroidMatrix(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val vecs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble))
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cents = byLabel.view.mapValues { vs =>
      val dim = vs.head.length
      (0 until dim).map(d => vs.map(_(d)).sum / vs.size)
    }.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val labels = byLabel.keys.toSeq.sorted
    assert(got.keySet == (for { a <- labels; b <- labels if a < b } yield (a, b)).toSet)
    got.foreach { case ((a, b), (na, nb, c)) =>
      assert(na == byLabel(a).size && nb == byLabel(b).size)
      // driver sums in a different order than the distributed avg — allow
      // the ulp the published round(4) absorbs
      assert(math.abs(c - cos(cents(a), cents(b))) < 1e-3,
        s"($a,$b): $c vs ${cos(cents(a), cents(b))}")
    }
  }

  test("q265 separability reconciles against the oracled q35 and q264 tables") {
    val got = graft.operators.Similarity.q265LabelSeparability(spark, sf)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5)))).toMap
    val tight = graft.operators.Similarity.q35CentroidSim(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val matrix = graft.operators.Similarity.q264LabelCentroidMatrix(spark, sf)
      .collect().flatMap { r =>
        val (a, b, c) = (r.getInt(0), r.getInt(1), r.getDouble(4))
        Seq(a -> (b, c), b -> (a, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet == tight.keySet)
    got.foreach { case (l, (n, t, nl, nc, m)) =>
      assert((n, t) == tight(l), s"label $l tightness drifted from q35")
      val want = matrix(l).sortBy { case (o, c) => (-c, o) }.head
      assert((nl, nc) == want, s"label $l nearest drifted from q264")
      assert(math.abs(m - math.rint((t - nc) * 10000) / 10000) < 1e-9)
    }
  }

  test("q266 hubness audit reconciles against the oracled q33 kNN frame") {
    val knn = graft.operators.Similarity.q33KnnBrute(spark, sf).collect()
      .map(r => r.getAs[Long]("neighbor_id"))
    val occ = knn.groupBy(identity).map { case (_, a) => a.length.toLong }
    val total = knn.length.toLong
    val want = occ.groupBy(identity).map { case (o, vs) =>
      o -> ((vs.size.toLong, o * vs.size * 10000L / total))
    }
    val got = graft.operators.Similarity.q266HubnessAudit(spark, sf).collect()
      .map(r => r.getAs[Long]("occurrences") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Long]("slot_share_bp")))).toMap
    assert(got == want)
    // every top-k slot is accounted for: sum(occurrences * n_vectors) = |knn|
    assert(got.map { case (o, (n, _)) => o * n }.sum == total)
  }

  test("q267 margin table reconciles against the oracled q33 kNN frame") {
    val byQ = graft.operators.Similarity.q33KnnBrute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Double]("cos_sim")))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val got = graft.operators.Similarity.q267KnnMargin(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> ((r.getAs[Double]("top1_cos"),
        r.getAs[Double]("top2_cos"), r.getAs[Double]("top5_cos"),
        r.getAs[Double]("margin12"), r.getAs[Double]("spread15")))).toMap
    assert(got.keySet == byQ.keySet)
    got.foreach { case (q, (t1, t2, t5, m12, s15)) =>
      val ks = byQ(q)
      assert((t1, t2, t5) == ((ks(1), ks(2), ks(5))), s"query $q tops drifted")
      assert(m12 == math.rint((ks(1) - ks(2)) * 10000) / 10000)
      assert(s15 == math.rint((ks(1) - ks(5)) * 10000) / 10000)
      // rank order ⇒ non-negative margins, and spread dominates margin
      assert(m12 >= 0 && s15 >= m12)
    }
  }

  test("q269 participation ratio equals an exact driver recompute; bounds hold") {
    val vecs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Float](1).map(v => BigDecimal(v.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val want = vecs.groupBy(_._1).map { case (l, rows) =>
      val us = rows.map(_._2)
      val n = us.size.toLong
      val dims = us.head.length
      val varq = (0 until dims).map { d =>
        val s1 = us.map(u => BigInt(u(d))).sum
        val s2 = us.map(u => BigInt(u(d)) * u(d)).sum
        ((s2 * n - s1 * s1) / (n * n)).toLong
      }
      val tot = varq.map(BigInt(_)).sum
      val ssq = varq.map(v => BigInt(v) * v).sum
      val pr = (tot * tot * 100 / ssq.max(1)).toLong
      l -> ((n, dims.toLong, tot.toLong, pr, pr * 100 / dims))
    }
    val got = graft.operators.Similarity.q269ParticipationRatio(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    // PR is bounded by [1·100, dims·100] for any non-degenerate cloud
    got.values.foreach { case (_, dims, tot, pr, _) =>
      if (tot > 0) assert(pr >= 100 && pr <= dims * 100, s"PR out of range: $pr")
    }
  }

  test("q278 label noise equals a driver nearest-centroid recompute") {
    val vecs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble))
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cents = byLabel.view.mapValues { vs =>
      (0 until vs.head.length).map(d => vs.map(_(d)).sum / vs.size)
    }.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val assigned = vecs.map { case (l, v) =>
      val nearest = cents.toSeq
        .map { case (cl, c) => (math.rint(cos(v, c) * 1e6) / 1e6, cl) }
        .sortBy { case (s, cl) => (-s, cl) }.head._2
      (l, nearest)
    }
    val want = assigned.groupBy(_._1).map { case (l, as) =>
      val mis = as.filter(_._2 != l)
      val top = if (mis.isEmpty) None else Some(
        mis.groupBy(_._2).toSeq.map { case (t, g) => (g.size, t) }
          .sortBy { case (n, t) => (-n, t) }.head._2)
      l -> ((as.size.toLong, mis.size.toLong, mis.size * 10000L / as.size, top))
    }
    val got = graft.operators.Similarity.q278LabelNoise(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[Any]("top_confusion")).map(_.asInstanceOf[Int])))).toMap
    assert(got == want)
    got.values.foreach { case (_, mis, _, top) =>
      assert((mis == 0) == top.isEmpty, "clean labels must carry no confusion target")
    }
  }

  test("q290 norm profile equals an exact driver recompute; planted scaled label trips spread") {
    val vecs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(v =>
        BigDecimal(v.toDouble * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val want = vecs.groupBy(_._1).map { case (l, vs) =>
      val norms = vs.map(_._2.map(u => u * u).sum)
      l -> ((vs.size.toLong, norms.min, norms.max, norms.sum / vs.size,
        (norms.max - norms.min) * 10000 / math.max(norms.min, 1L)))
    }
    val got = graft.operators.Similarity.q290LabelNormProfile(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    // planted: one label re-embedded at 2x scale quadruples its norm band
    import TestSpark.spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-norms").toString
    val base = Seq.fill(64)(0.1f)
    Seq((1L, 0, base), (2L, 0, base), (3L, 1, base.map(_ * 2f)), (4L, 1, base.map(_ * 2f)))
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$out/embeddings.parquet")
    val p = graft.operators.Similarity.q290LabelNormProfile(spark, out).collect()
      .map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(p(1) == 4 * p(0), s"2x-scaled label must quadruple mean norm2: $p")
  }

  test("q218 label balance equals a driver-side share recompute") {
    val got = graft.operators.Similarity.q218LabelBalance(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> ((r.getAs[Long]("n_vecs"),
        r.getAs[Long]("share_bp"), r.getAs[Long]("uniform_dev_bp")))).toMap
    val labels = Tables.embeddings(spark, sf).select("label").collect()
      .map(_.getInt(0))
    val cnts = labels.groupBy(identity).map { case (l, a) => l -> a.length.toLong }
    val n = labels.length.toLong
    val k = cnts.size.toLong
    val ref = cnts.map { case (l, c) =>
      l -> ((c, c * 10000L / n,
        // floorDiv: the Spark/DuckDB expression is all-positive before the
        // subtraction, which is exactly floor(c·k·10000/n) − 10000
        Math.floorDiv(c * k * 10000L, n) - 10000L))
    }
    assert(got == ref, s"got $got\nref $ref")
    // both directions of imbalance appear (shares can't all sit above or
    // all below uniform), and shares sum to ~10000 within floor slack
    assert(got.values.exists(_._3 >= 0L) && got.values.exists(_._3 < 0L) ||
      got.values.forall(_._3.abs <= k))
    val s2 = got.values.map(_._2).sum
    assert(s2 <= 10000L && s2 >= 10000L - k)
  }

  test("q220 char-bigram entropy equals a driver-side census recompute") {
    val got = graft.operators.TextAnalysis.q220CharBigramEntropy(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_distinct"), r.getAs[String]("top_bigram"),
        r.getAs[Long]("top_share_bp"), r.getAs[Long]("entropy_x1000")))).toMap
    def lq(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ref = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap { r =>
        // codepoint-sliding, matching both engines' char-based substring
        val cps = r.getString(1).codePoints().toArray
        if (cps.length < 2) Seq.empty
        else cps.sliding(2).map(p => (r.getString(0), new String(p, 0, 2))).toSeq
      }
      .groupBy(_._1).map { case (src, rows) =>
        val cnts = rows.groupBy(_._2).map { case (bg, rs) => bg -> rs.length.toLong }
        val n = cnts.values.sum
        val (top, topCnt) = cnts.toSeq.sortBy { case (bg, c) => (-c, bg) }.head
        val num = lq(n) * n - cnts.values.map(c => c * lq(c)).sum
        src -> ((n, cnts.size.toLong, top, topCnt * 10000L / n,
          math.round(num / n.toDouble / 1000.0)))
      }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: a real transition structure on every source — many
    // distinct bigrams, no degenerate single-bigram source, entropy > 0
    assert(got.nonEmpty &&
      got.values.forall(v => v._2 > 10L && v._5 > 0L && v._4 < 10000L))
  }

  test("q221 cross-lang leak equals a driver-side hash recompute") {
    val got = graft.operators.TextAnalysis.q221CrossLangLeak(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_cross_docs"), r.getAs[Long]("cross_bp")))).toMap
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).take(3).mkString(" ")))
    val crossKeys = docs.groupBy(_._2)
      .filter { case (_, rs) => rs.map(_._1).distinct.length > 1 }.keySet
    val ref = docs.groupBy(_._1).map { case (lang, rows) =>
      val nc = rows.count(d => crossKeys(d._2)).toLong
      lang -> ((rows.length.toLong, nc, nc * 10000L / rows.length))
    }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: the synthetic corpus carries real cross-lang prefix
    // collisions (probed before adoption) — some lang must show leakage
    assert(got.values.exists(_._2 > 0L))
  }

  test("q222 dedup token savings equals a driver-side keeper recompute") {
    val got = graft.operators.TextAnalysis.q222DedupTokenSavings(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed_docs"),
        r.getAs[Long]("tokens_removed"), r.getAs[Long]("saved_bp")))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val w = r.getString(2).split(" ", -1)
        (r.getLong(0), r.getString(1), w.take(3).mkString(" "),
          w.count(_.nonEmpty).toLong)
      }
    val keeper = docs.groupBy(_._3).map { case (k, rs) => k -> rs.map(_._1).min }
    val ref = docs.groupBy(_._2).map { case (src, rows) =>
      val removed = rows.filter(d => keeper(d._3) != d._1)
      val nTok = rows.map(_._4).sum
      val remTok = removed.map(_._4).sum
      src -> ((rows.length.toLong, nTok, removed.length.toLong, remTok,
        remTok * 10000L / math.max(nTok, 1L)))
    }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: dedup recovers real tokens somewhere, and no source
    // loses everything
    assert(got.values.exists(_._4 > 0L) && got.values.forall(v => v._5 < 10000L))
  }

  test("q223 contamination by source equals a driver-side shingle recompute") {
    val got = graft.operators.TextAnalysis
      .q223ContaminationBySource(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_contaminated_docs"),
        r.getAs[Long]("n_contaminated_grams"),
        r.getAs[Long]("contam_bp")))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val w = r.getString(2).split(" ", -1)
        val grams =
          if (w.length < 5) Set.empty[String]
          else w.sliding(5).map(_.mkString(" ")).toSet
        (r.getLong(0), r.getString(1), grams)
      }
    val bench = docs.filter(_._1 % 97 == 0).flatMap(_._3).toSet
    val corpus = docs.filter(_._1 % 97 != 0)
    val ref = corpus.groupBy(_._2).map { case (src, rows) =>
      val perDoc = rows.map(d => (d._3 & bench).size.toLong).filter(_ > 0L)
      src -> ((rows.length.toLong, perDoc.length.toLong, perDoc.sum,
        perDoc.length * 10000L / rows.length))
    }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: contamination exists and is not universal
    assert(got.values.exists(_._2 > 0L) && got.values.exists(v => v._2 < v._1))
  }

  test("q224 near-dup token savings composes the verified q56 cluster map") {
    val got = Dedup.q224NearDupTokenSavings(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed_docs"),
        r.getAs[Long]("tokens_removed"), r.getAs[Long]("saved_bp")))).toMap
    val cl = Dedup.q56DedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val ref = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        (r.getLong(0), r.getString(1),
          r.getString(2).split(" ", -1).count(_.nonEmpty).toLong)
      }
      .groupBy(_._2).map { case (src, rows) =>
        val removed = rows.filter(d => cl.get(d._1).exists(_ != d._1))
        val nTok = rows.map(_._3).sum
        val remTok = removed.map(_._3).sum
        src -> ((rows.length.toLong, nTok, removed.length.toLong, remTok,
          remTok * 10000L / math.max(nTok, 1L)))
      }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: the near-dup pass recovers real tokens somewhere
    assert(got.values.exists(_._4 > 0L))
  }

  test("q225 dedup-key precision equals a driver-side digest recompute") {
    val row = Dedup.q225DedupKeyPrecision(spark, sf).collect().head
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(r => (r.getString(0).split(" ", -1).take(3).mkString(" "),
        r.getString(0)))
    val groups = docs.groupBy(_._1).values.filter(_.length > 1).toSeq
    val falseG = groups.filter(g => g.map(_._2).distinct.length > 1)
    assert(row.getAs[Long]("n_multi_groups") == groups.length.toLong)
    assert(row.getAs[Long]("n_false_merge_groups") == falseG.length.toLong)
    assert(row.getAs[Long]("docs_in_multi") == groups.map(_.length).sum.toLong)
    assert(row.getAs[Long]("docs_in_false") == falseG.map(_.length).sum.toLong)
    assert(row.getAs[Long]("false_merge_bp") ==
      falseG.length * 10000L / math.max(groups.length, 1L))
    // liveness: the audit fires on this corpus — the cheap prefix key
    // really does merge heterogeneous texts
    assert(groups.nonEmpty && falseG.nonEmpty)
  }

  test("q226 lang filter bias composes the verified q65 verdicts") {
    val got = graft.operators.TextAnalysis.q226LangFilterBias(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("outcome")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("share_bp")))).toMap
    val verdicts = graft.operators.TextAnalysis.q65CorpusFilter(spark, sf)
      .select("doc_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("accepted")).toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getString(1), verdicts(r.getLong(0))))
    val totals = langs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ref = langs.groupBy(identity).map { case ((lang, out), rows) =>
      (lang, out) -> ((rows.length.toLong,
        rows.length * 10000L / totals(lang)))
    }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: the stopword gate fires at visibly DIFFERENT within-lang
    // rates — the bias the audit exists to surface (the synthetic
    // generator's vocabularies don't reproduce real-language stopword
    // statistics, so the direction is data-dependent; the separation is
    // what must be non-vacuous)
    val stopShare = got.collect {
      case ((l, "low_stopword_share"), (_, bp)) => l -> bp
    }.toMap
    assert(stopShare.size > 1 &&
      stopShare.values.max >= 2L * math.max(stopShare.values.min, 1L),
      s"stopword-gate shares: $stopShare")
    // every lang has accepted docs (no lang is silently wiped out here)
    assert(totals.keySet.forall(l => got.contains((l, "accepted"))))
  }

  test("q227 gate attrition by source composes the verified q65 verdicts") {
    val got = graft.operators.TextAnalysis
      .q227GateAttritionBySource(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("outcome")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("share_bp")))).toMap
    val verdicts = graft.operators.TextAnalysis.q65CorpusFilter(spark, sf)
      .select("doc_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("accepted")).toMap
    val srcs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getString(1), verdicts(r.getLong(0))))
    val totals = srcs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ref = srcs.groupBy(identity).map { case ((src, out), rows) =>
      (src, out) -> ((rows.length.toLong, rows.length * 10000L / totals(src)))
    }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: gates actually fire per source (some source has >1
    // outcome) and every source keeps accepted docs
    assert(got.keys.groupBy(_._1).exists(_._2.size > 1))
    assert(totals.keySet.forall(src => got.contains((src, "accepted"))))
  }

  test("q219 quality-dup lift equals a driver-side band recompute") {
    val got = graft.operators.TextAnalysis.q219QualityDupLift(spark, sf).collect()
      .map(r => r.getAs[Long]("band") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dup_docs"), r.getAs[Long]("dup_bp"),
        r.getAs[Long]("lift_bp")))).toMap
    val en = graft.operators.TextAnalysis.stop("en").toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1) // Spark split keeps empties
        val key = w.take(3).mkString(" ")
        val bp = 5000L * math.min(w.length, 50) / 50 +
          5000L * w.count(en.contains) / w.length
        (r.getLong(0), key, math.min(bp, 9999L) / 2000L)
      }
    val dupKeys = docs.groupBy(_._2).filter(_._2.length > 1).keySet
    val ref0 = docs.groupBy(_._3).map { case (band, rows) =>
      band -> ((rows.length.toLong, rows.count(d => dupKeys(d._2)).toLong))
    }
    val totDocs = docs.length.toLong
    val totDup = ref0.values.map(_._2).sum
    val ref = ref0.map { case (band, (n, nd)) =>
      band -> ((n, nd, nd * 10000L / n,
        nd * 10000L / n - totDup * 10000L / totDocs))
    }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: the corpus spreads over >1 band and carries real dups,
    // and lift is not uniformly zero (some band separates from the mean)
    assert(got.size > 1 && totDup > 0L)
    assert(got.values.exists(_._4 != 0L))
  }

  test("q232 source KL equals a driver-side micro-nat recompute") {
    val got = graft.operators.TextAnalysis.q232SourceKl(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_tokens_all"),
        r.getAs[Long]("n_tokens_vocab"), r.getAs[Long]("n_terms"),
        Option(r.getAs[Any]("kl_micro")).map(_.asInstanceOf[Long])))).toMap
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
    val srcTok = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cf = toks.groupBy(_._2).view.mapValues(_.length.toLong)
      .filter(_._2 >= 5L).toMap
    def uln(v: Long): Long = BigDecimal(math.log(v.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val nTot = cf.values.sum
    val ref = toks.map(_._1).distinct.map { src =>
      val mine = srcTok.collect {
        case ((s0, w), c) if s0 == src && cf.contains(w) => (w, c) }.toSeq
      val nS = mine.map(_._2).sum
      val terms = mine.length.toLong
      val kl =
        if (nS == 0) None
        else {
          val t = mine.map { case (w, c) =>
            BigInt(c) * (uln(c) - uln(nS) - uln(cf(w)) + uln(nTot)) }.sum
          Some((t.max(BigInt(0)) / nS).toLong)
        }
      src -> ((srcTok.collect { case ((s0, _), c) if s0 == src => c }.sum,
        nS, terms, kl))
    }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // liveness: KL is nonnegative and some source sits measurably off
    // the blend (the synthetic sources have different vocab mixes)
    assert(got.values.forall(_._4.forall(_ >= 0L)))
    assert(got.values.exists(_._4.exists(_ > 0L)))
  }

  test("q233 quality AUC equals a brute-force midrank recompute on (score, dup)") {
    val row = graft.operators.TextAnalysis.q233QualityAuc(spark, sf).head()
    val en = graft.operators.TextAnalysis.stop("en").toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1) // Spark split keeps empties
        val key = w.take(3).mkString(" ")
        val bp = 5000L * math.min(w.length, 50) / 50 +
          5000L * w.count(en.contains) / w.length
        (r.getLong(0), key, math.min(bp, 9999L))
      }
    val dupKeys = docs.groupBy(_._2).filter(_._2.length > 1).keySet
    val scored = docs.map(d => (d._3, dupKeys(d._2)))
    val a = scored.filter(_._2).map(_._1)
    val n1 = a.length.toLong
    val n2 = scored.length.toLong - n1
    val n = n1 + n2
    val tieSizes = scored.map(_._1).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    var cum = 0L
    val mid2 = tieSizes.keys.toSeq.sorted.map { v =>
      val t = tieSizes(v); val m = 2 * cum + t + 1; cum += t; v -> m
    }.toMap
    val u1x2 = a.map(mid2).sum - n1 * (n1 + 1)
    val tsum = tieSizes.values.map(t => t * t * t - t).sum
    val varU = (n1.toDouble * n2 / 12.0) *
      ((n + 1).toDouble - tsum.toDouble / (n.toDouble * (n - 1)))
    assert(row.getAs[Long]("n_dup") == n1 && row.getAs[Long]("n_uniq") == n2)
    assert(n1 > 0L, "corpus must carry real dups for the test to bite")
    assert(row.getAs[Long]("auc_bp") ==
      math.round(10000.0 * u1x2 / (2.0 * n1 * n2)))
    if (varU > 0) {
      val z = (u1x2.toDouble - n1.toDouble * n2) / (2.0 * math.sqrt(varU))
      assert(math.abs(row.getAs[Double]("z_score") - z) < 1e-3)
    }
  }

  test("q236 source vocab overlap equals a driver-side set recompute over the full pair grid") {
    val got = graft.operators.TextAnalysis.q236SourceVocabOverlap(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_types_a"), r.getAs[Long]("n_types_b"),
          r.getAs[Long]("n_shared"), r.getAs[Long]("jaccard_bp"),
          r.getAs[Long]("contain_bp")))).toMap
    val vocabs = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcs = vocabs.keys.toSeq.sorted
    val ref = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
    } yield {
      val (sa, sb) = (srcs(i), srcs(j))
      val (va, vb) = (vocabs(sa), vocabs(sb))
      val sh = (va intersect vb).size.toLong
      (sa, sb) -> ((va.size.toLong, vb.size.toLong, sh,
        sh * 10000L / (va.size + vb.size - sh),
        sh * 10000L / math.min(va.size, vb.size)))
    }).toMap
    assert(got == ref, s"sizes got ${got.size} ref ${ref.size}")
    // the grid is complete (every unordered pair rows) and containment
    // dominates Jaccard (|A∩B|/min >= |A∩B|/|A∪B|); real overlap exists
    assert(got.size == srcs.length * (srcs.length - 1) / 2)
    assert(got.values.forall(v => v._5 >= v._4 && v._5 <= 10000L))
    assert(got.values.exists(_._3 > 0L))
  }

  test("q239 shard plan equals a driver-side serpentine recompute and beats naive round-robin") {
    val got = graft.operators.TextAnalysis.q239ShardPlan(spark, sf).collect()
      .map(r => r.getAs[Long]("shard") -> ((r.getAs[Long]("n_sources"),
        r.getAs[Long]("shard_tokens"), r.getAs[Long]("share_bp"),
        r.getAs[Long]("skew_bp")))).toMap
    val srcTokens = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ", -1).count(_.nonEmpty).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val ordered = srcTokens.sortBy { case (s0, t) => (-t, s0) }
    val k = 8
    def serp(rn: Int): Long =
      (if ((rn / k) % 2 == 0) rn % k else k - 1 - rn % k).toLong
    val total = ordered.map(_._2).sum
    val byShard = ordered.zipWithIndex.groupBy { case (_, rn) => serp(rn) }
    val ref = (0L until k.toLong).map { sh =>
      val rows = byShard.getOrElse(sh, Seq.empty)
      val tok = rows.map(_._1._2).sum
      sh -> ((rows.length.toLong, tok, tok * 10000L / total,
        tok * 10000L / total - 10000L / k))
    }.toMap
    assert(got == ref, s"got $got\nref $ref")
    assert(got.size == k) // the 0..K-1 grid is complete
    // the serpentine deal must not be WORSE than naive round-robin on
    // the same descending order (makespan = heaviest shard)
    val rr = ordered.zipWithIndex.groupBy(_._2 % k)
      .map { case (_, rows) => rows.map(_._1._2).sum }.max
    assert(got.values.map(_._2).max <= rr,
      s"serpentine makespan ${got.values.map(_._2).max} > round-robin $rr")
  }

  test("q212 packing economics equals a driver-side bucket recompute") {
    val got = graft.operators.TextAnalysis.q212PackingEconomics(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Long]("pad_waste_bp")))).toMap
    def bucketOf(n: Long): Long =
      Seq(32L, 64L, 128L, 256L, 512L, 1024L, 2048L).find(n <= _).getOrElse(4096L)
    val ref = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .groupBy { case (src, n) => (src, bucketOf(n)) }
      .map { case ((src, b), rows) =>
        val nTok = rows.map(_._2).sum
        val padded = rows.map(r => math.max(b, r._2)).sum
        (src, b) -> ((rows.length.toLong, nTok, padded,
          (padded - nTok) * 10000L / padded))
      }
    assert(got == ref, s"got ${got.size} ref ${ref.size}")
    // buckets are powers of two in range; waste is a sane bp; lengths vary
    assert(got.keys.map(_._2).forall(b => (b & (b - 1)) == 0L && b >= 32L && b <= 4096L))
    assert(got.values.forall(v => v._4 >= 0L && v._4 < 10000L))
    assert(got.keys.map(_._2).toSet.size > 1)
  }

  test("q298 word entropy equals a driver-side census recompute") {
    val got = graft.operators.TextAnalysis.q298WordEntropy(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_distinct"), r.getAs[String]("top_word"),
        r.getAs[Long]("top_share_bp"), r.getAs[Long]("entropy_x1000")))).toMap
    def lq(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ref = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
      .groupBy(_._1).map { case (src, rows) =>
        val cnts = rows.groupBy(_._2).map { case (w, rs) => w -> rs.length.toLong }
        val n = cnts.values.sum
        val (top, topCnt) = cnts.toSeq.sortBy { case (w, c) => (-c, w) }.head
        val num = lq(n) * n - cnts.values.map(c => c * lq(c)).sum
        src -> ((n, cnts.size.toLong, top, topCnt * 10000L / n,
          math.round(num / n.toDouble / 1000.0)))
      }
    assert(got == ref, s"got $got\nref $ref")
    // liveness: real lexical structure — entropy > 0, nobody's dominant
    // word carries the whole source
    assert(got.nonEmpty &&
      got.values.forall(v => v._2 > 10L && v._5 > 0L && v._4 < 10000L))
  }

}
