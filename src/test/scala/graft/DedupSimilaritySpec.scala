package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Property checks for the rows-only (non-oracle) dedup/similarity ops. */
class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("q102 fast edit-distance scores exactly q49's candidate pairs, distances exact") {
    val fast = Dedup.q102EditDistanceFast(spark, sf).cache()
    val q49Pairs = Dedup.q49DedupMinhashFast(spark, sf).select("doc_a", "doc_b")
    assert(fast.select("doc_a", "doc_b").exceptAll(q49Pairs).count() == 0)
    assert(q49Pairs.exceptAll(fast.select("doc_a", "doc_b")).count() == 0)
    // distances recomputed directly from the folded texts must agree
    val folded = Tables.documents(spark, sf).select(col("doc_id"),
      regexp_replace(col("text"), "[^\\x00-\\x7F]", "?").as("f"))
    val recomputed = fast
      .join(folded.select(col("doc_id").as("doc_a"), col("f").as("fa")), Seq("doc_a"))
      .join(folded.select(col("doc_id").as("doc_b"), col("f").as("fb")), Seq("doc_b"))
      .filter(levenshtein(col("fa"), col("fb")).cast("long") =!= col("edit_distance"))
    assert(recomputed.count() == 0)
    fast.unpersist()
  }

  test("q30 simhash: one row per doc, bands decompose the hash") {
    val df = Dedup.q30DedupSimhash(spark, sf).cache()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(df.count() == nDocs)
    // band0..3 must reassemble into simhash
    val bad = df.filter(
      col("band0") + shiftleft(col("band1"), 16) + shiftleft(col("band2"), 32) +
        shiftleft(col("band3"), 48) =!= col("simhash")).count()
    assert(bad == 0)
  }

  test("q30 simhash is deterministic across runs") {
    val a = Dedup.q30DedupSimhash(spark, sf)
    val b = Dedup.q30DedupSimhash(spark, sf)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("fastSimhash (production xxhash64 twin): per-doc rows, band decomposition, determinism") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = Dedup.fastSimhash(docs).cache()
    assert(df.count() == docs.count())
    val bad = df.filter(
      col("band0") + shiftleft(col("band1"), 16) + shiftleft(col("band2"), 32) +
        shiftleft(col("band3"), 48) =!= col("simhash")).count()
    assert(bad == 0)
    val again = Dedup.fastSimhash(docs)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    // exact text copies must collide regardless of the bit source
    val one = docs.limit(1).select(col("doc_id"), col("text"))
    val twin = one.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val both = Dedup.fastSimhash(one.union(twin)).select("simhash")
      .collect().map(_.getLong(0))
    assert(both.distinct.length == 1)
    df.unpersist()
  }

  test("q69 simhash pairs are EXACTLY the brute-force hamming<=3 pairs (pigeonhole)") {
    // 3 differing bits touch at most 3 of the 4 bands, so banding loses
    // nothing at maxHamming=3 — assert exact equality with all-pairs
    val sims = Dedup.q30DedupSimhash(spark, sf)
      .select(col("doc_id"), col("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ida, ha) <- sims; (idb, hb) <- sims if ida < idb
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ida, idb, java.lang.Long.bitCount(ha ^ hb))).toSet
    val got = Dedup.q69DedupSimhashPairs(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
    assert(got == expected, s"banded=${got.size} brute=${expected.size}")
  }

  test("q69 exactness survives a forced tiny hot-bucket cap (cap bypassed on the exact path)") {
    // the hot-bucket guard must NOT apply to q69: a dropped band bucket
    // would silently lose true hamming<=3 pairs and void the pigeonhole
    // guarantee. Force the cap to 2 and assert output is unchanged.
    val unforced = Dedup.q69DedupSimhashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("graft.dedup.maxBucketSize", "2")
    try {
      val forced = Dedup.q69DedupSimhashPairs(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(forced == unforced, "q69 output changed under a forced cap — exactness voided")
    } finally spark.conf.unset("graft.dedup.maxBucketSize")
  }

  test("q199 containment: bounds, verdict rule, and dominance over jaccard on shared pairs") {
    val cont = Dedup.q199Containment(spark, sf).cache()
    val rows = cont.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("containment_a_bp"), r.getAs[Long]("containment_b_bp"))
      assert(a >= 0 && a <= 10000 && b >= 0 && b <= 10000)
      val expected =
        if (a >= 9000 && b >= 9000) "mutual"
        else if (a >= 9000) "a_in_b"
        else if (b >= 9000) "b_in_a"
        else "overlap"
      assert(r.getAs[String]("relation") == expected)
    }
    // |A∩B|/|A| ≥ |A∩B|/|A∪B|: containment dominates the pair's jaccard
    val joined = cont.join(Dedup.q31NgramJaccard(spark, sf), Seq("doc_a", "doc_b"))
      .select(col("containment_a_bp"), col("containment_b_bp"), col("jaccard"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val jacBp = math.round(r.getAs[Double]("jaccard") * 10000)
      assert(math.max(r.getLong(0), r.getLong(1)) >= jacBp - 1,
        s"containment ${r.getLong(0)}/${r.getLong(1)} below jaccard $jacBp")
    }
    cont.unpersist()
  }

  test("q201 embedding drift: parity halves sit under the bar; a planted shift trips every dim") {
    val rows = Similarity.q201EmbeddingDrift(spark, sf).collect()
    assert(rows.length == 64)
    // two random halves of ONE release: no dimension may read as drifted
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("drifted"),
        s"dim ${r.getAs[Long]("dim")} drifted at effect ${r.getAs[Long]("effect_x1000")}")
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cand") > 0)
    }
    // a planted global shift (+0.5 per component ≈ many stds) must trip
    // the gate on every dimension
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val shifted = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x + 0.5 AS FLOAT))").as("embedding"))
    val drifted = Similarity.embeddingDriftOf(e, shifted).collect()
    assert(drifted.forall(_.getAs[Boolean]("drifted")),
      drifted.filterNot(_.getAs[Boolean]("drifted")).mkString(","))
  }

  test("hammingPairs refuses maxHamming > 3: the pigeonhole bound is the contract") {
    val e = intercept[IllegalArgumentException] {
      Dedup.q69DedupSimhashPairs(spark, sf, maxHamming = 4)
    }
    assert(e.getMessage.contains("exact only for maxHamming in [0, 3]"))
  }

  test("hammingPairs mega-bucket ceiling: a constant-hash corpus fails loudly with the q28 advice") {
    import spark.implicits._
    // 50 docs with the SAME simhash: every band bucket holds all 50 —
    // the degenerate shape (e.g. empty documents) whose n² expansion
    // would OOM an executor at corpus scale
    val constant = (1 to 50).map(i => (i.toLong, 0x5a5a5a5a5a5a5a5aL))
      .toDF("doc_id", "simhash")
    spark.conf.set("graft.dedup.maxExactBucketSize", "10")
    try {
      val e = intercept[Exception] { // SparkException wrapping the task's
        Dedup.hammingPairs(constant, 3).count() // raise_error, any Spark version
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("maxExactBucketSize") &&
        t.getMessage.contains("pre-collapse exact duplicates (q28)")),
        chain(e).map(_.getMessage))
      // default behavior unchanged: unset cap still expands exactly
      spark.conf.unset("graft.dedup.maxExactBucketSize")
      assert(Dedup.hammingPairs(constant, 3).count() == 50L * 49 / 2)
    } finally spark.conf.unset("graft.dedup.maxExactBucketSize")
  }

  test("q29 minhash candidates all have positive true jaccard") {
    val jac = Dedup.q31NgramJaccard(spark, sf).cache()
    assert(jac.count() > 0)
    assert(jac.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
  }

  test("q49 fast minhash finds candidates of similar quality to q29") {
    val fast = Dedup.q49DedupMinhashFast(spark, sf)
    val slow = Dedup.q29DedupMinhash(spark, sf)
    val nFast = fast.count()
    val nSlow = slow.count()
    // different hash families find different (but comparably many) pairs
    assert(nFast > 0)
    assert(nFast < nSlow * 10 + 50, s"fast=$nFast slow=$nSlow")
  }

  test("q29 oracle-minhash plan is JOIN-FREE: scan -> project -> agg -> pair expansion") {
    // Round 8 removed the distinct-shingle dictionary (and its gated
    // broadcast): with ONE md5 per occurrence the whole candidate pipeline
    // is projections + aggregates. Pin that — a join reappearing here
    // means the dictionary crept back in.
    val df = Dedup.q29DedupMinhash(spark, sf01)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(df.collect().nonEmpty)
  }

  test("bucketed signature table: same survivors, published side joins without its exchange") {
    val published = spark.read.parquet(s"$sf01/documents.parquet")
    val newBatch = published.limit(40)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val sigDir = java.nio.file.Files.createTempDirectory("graft-sigs-b").toString
    Dedup.writeSignatureTable(published, sigDir)
    spark.sql("DROP TABLE IF EXISTS sigs_b")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft-warehouse/sigs_b"))
    Dedup.writeSignatureTableBucketed(published, "sigs_b", buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = Dedup.dedupeIncremental(newBatch, spark.read.parquet(sigDir))
      val bucketed = Dedup.dedupeIncremental(newBatch, spark.table("sigs_b"))
      // identical survivor sets (same signatures, different storage layout)
      assert(bucketed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
      // the bucketed plan drops the published-side exchange: strictly
      // fewer Exchange nodes than the path-based plan of the same join
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      assert(exchanges(bucketed) < exchanges(plain),
        s"bucketed=${exchanges(bucketed)} plain=${exchanges(plain)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental dedup drops near-dups of the published corpus only") {
    import spark.implicits._
    val sigDir = java.nio.file.Files.createTempDirectory("graft-sigs").toString
    val published = spark.read.parquet(s"$sf01/documents.parquet")
    Dedup.writeSignatureTable(published, sigDir)
    val sigs = spark.read.parquet(sigDir)

    // new batch: 5 re-ingested published docs under new ids (exact text →
    // all bands collide) + 3 genuinely novel docs
    val reingested = published.limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val novel = Seq(
      (2000001L, "entirely novel zebra quantum discourse alpha beta gamma delta epsilon"),
      (2000002L, "unrelated fresh content omicron sigma tau upsilon phi chi psi omega"),
      (2000003L, "another brand new document lambda kappa iota theta eta zeta nu xi"))
      .toDF("doc_id", "text")
    val batch = reingested.unionByName(novel)

    val survivors = Dedup.dedupeIncremental(batch, sigs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(survivors == Set(2000001L, 2000002L, 2000003L))
  }

  test("q68 rebalancing caps only over-represented languages, deterministically") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val before = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.q68LangRebalance(spark, sf01).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = before.values.sum
    val cap = 0.3 * total
    for ((lang, n) <- before) {
      val k = kept.getOrElse(lang, 0L) // a fully-sampled-out lang must fail cleanly
      if (n <= cap) assert(k == n, s"$lang under cap but lost docs")
      else {
        // binomial around the cap: within ±30% is far beyond 3 sigma here.
        // No strict k < n assertion: a share just above the cap rounds to
        // keep_lt = 256 (the coin's granularity) and legitimately keeps all
        assert(k <= n, s"$lang gained docs")
        assert(math.abs(k - cap) <= 0.3 * cap || k == n,
          s"$lang kept $k vs cap $cap")
      }
    }
    // deterministic: identical kept-set across runs
    val a = TextAnalysis.q68LangRebalance(spark, sf01).select("doc_id")
    val b = TextAnalysis.q68LangRebalance(spark, sf01).select("doc_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("minhash pipeline survives an empty documents table") {
    import spark.implicits._
    // the broadcast-size estimate does sum(n_chars) — SQL NULL on zero
    // rows — which must estimate 0, not NPE
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    spark.emptyDataset[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(Dedup.q29DedupMinhash(spark, dir).count() == 0)
    assert(Dedup.q49DedupMinhashFast(spark, dir).count() == 0)
  }

  test("q249 mirror matrix and q250 canonical bias equal hand arithmetic on a planted corpus") {
    import spark.implicits._
    // docs 1/2: identical text, feedA x feedB (cross-source mirror pair);
    // docs 3/4: identical text, both feedA (within-source pair); doc 5:
    // disjoint vocabulary, no pair. Identical docs share every minhash
    // band -> always LSH candidates, and their exact jaccard is 10000.
    val tA = (0 to 19).map(i => s"alpha$i").mkString(" ")
    val tB = (0 to 19).map(i => s"beta$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-mirror").toString
    Seq(
      (1L, tA, "en", "feedA", tA.length.toLong),
      (2L, tA, "en", "feedB", tA.length.toLong),
      (3L, tB, "en", "feedA", tB.length.toLong),
      (4L, tB, "en", "feedA", tB.length.toLong),
      (5L, (0 to 19).map(i => s"gamma$i").mkString(" "), "en", "feedC", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val mirror = Dedup.q249CrossSourceMirror(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(mirror == Map(
      ("feedA", "feedB") -> ((1L, false, 5000L)),
      ("feedA", "feedA") -> ((1L, true, 5000L))))
    val bias = Dedup.q250CanonicalSourceBias(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // clusters {1,2} and {3,4}; canonicals 1 and 3, both feedA:
    // feedA keeps 2 of its 3 members (6666 bp), holds 7500 bp of members
    // but 10000 bp of canonicals — the min-id favoritism made visible;
    // feedB's copy always loses (doc 2 > doc 1)
    assert(bias == Map(
      "feedA" -> ((3L, 2L, 6666L, 7500L, 10000L)),
      "feedB" -> ((1L, 0L, 0L, 2500L, 0L))))
  }

  test("q261 band sweep: schemes nest, the (8,2) row IS q29, jaccard floors rise with r") {
    val rows = Dedup.q261LshBandSweep(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2),
          Option(r.getAs[Any]("min_jaccard_bp")).map(_.asInstanceOf[Long]))))
      .toMap
    assert(rows.keySet == Set((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L)))
    // the production banding's row is exactly q29's candidate set
    val q29n = Dedup.q29DedupMinhash(spark, sf01).count()
    assert(rows((8L, 2L))._1 == q29n, s"(8,2) pairs != q29 ($q29n)")
    // r-doubling schemes NEST (a pair agreeing on an r=4 band agrees on
    // both its r=2 halves): counts fall, admitted-jaccard floors rise
    val order = Seq((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L)).map(rows)
    assert(order.map(_._1).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    val mins = order.flatMap(_._2)
    assert(mins.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
      s"jaccard floor must rise with r: $mins")
  }

  test("q255 bucket occupancy reconciles with q29: expansion mass equals total shared bands") {
    val occ = Dedup.q255LshBucketOccupancy(spark, sf01).collect()
    assert(occ.length == 8, "one row per band")
    // no over-cap bucket at this SF, so every bucket expands and
    // Σ_bands Σ_buckets C(b,2)  ==  Σ_{q29 pairs} n_shared_bands
    assert(occ.forall(_.getAs[Long]("docs_in_overcap") == 0L))
    val expanded = occ.map(_.getAs[Long]("n_pairs_expanded")).sum
    val sharedBands = Dedup.q29DedupMinhash(spark, sf01).collect()
      .map(_.getAs[Long]("n_shared_bands")).sum
    assert(expanded == sharedBands,
      s"expansion mass $expanded != q29 shared-band mass $sharedBands")
    occ.foreach { r =>
      assert(r.getAs[Long]("max_bucket") >= 1L)
      assert(r.getAs[Long]("n_multi_buckets") <= r.getAs[Long]("n_buckets"))
      assert(r.getAs[Double]("p95_bucket") <= r.getAs[Long]("max_bucket").toDouble)
    }
  }

  test("hot-bucket cap drops mega-buckets from pair expansion") {
    val default = Dedup.q49DedupMinhashFast(spark, sf01)
    val nDefault = default.count()
    assert(nDefault > 0)
    // cap of 2: only 2-doc buckets may expand → a (possibly empty) subset
    spark.conf.set("graft.dedup.maxBucketSize", "2")
    try {
      val capped = Dedup.q49DedupMinhashFast(spark, sf01)
      assert(capped.count() <= nDefault)
      val extra = capped.select(col("doc_a"), col("doc_b"))
        .exceptAll(default.select(col("doc_a"), col("doc_b"))).count()
      assert(extra == 0, "capped expansion produced pairs the uncapped run lacks")
    } finally spark.conf.unset("graft.dedup.maxBucketSize")
  }

  test("publishBatch closes the incremental loop: later batches dedupe against earlier ones") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-pub").toString
    val (corpusDir, sigDir) = (s"$base/corpus", s"$base/sigs")
    // initial published state
    val initial = spark.read.parquet(s"$sf01/documents.parquet")
      .select(col("doc_id"), col("text"))
    initial.write.parquet(corpusDir)
    Dedup.writeSignatureTable(initial, sigDir)

    // batch B: one novel doc
    val novelB = Seq((7000001L,
      "first refresh batch doc with its own distinct vocabulary one two three"))
      .toDF("doc_id", "text")
    Dedup.publishBatch(novelB, corpusDir, sigDir)
    assert(spark.read.parquet(corpusDir).filter(col("doc_id") === 7000001L).count() == 1)

    // batch C: a near-dup of B's doc (same text, new id) + one novel doc —
    // the B dup must be dropped even though B was published AFTER the
    // initial signature table was built
    val batchC = Seq(
      (7000002L, "first refresh batch doc with its own distinct vocabulary one two three"),
      (7000003L, "second refresh batch doc entirely different words four five six seven"))
      .toDF("doc_id", "text")
    Dedup.publishBatch(batchC, corpusDir, sigDir)
    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.filter(col("doc_id") === 7000002L).count() == 0, "dup of batch B leaked")
    assert(corpus.filter(col("doc_id") === 7000003L).count() == 1)
  }

  test("publishBatch collapses near-dups WITHIN a batch and bootstraps a missing sigDir") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-pub-boot").toString
    val (corpusDir, sigDir) = (s"$base/corpus", s"$base/sigs")
    // sigDir does not exist: the very first publish must work (bootstrap),
    // and the two near-identical docs inside the batch must collapse to
    // the min-id survivor instead of both being published
    val batch = Seq(
      (1L, "within batch duplicate text alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "within batch duplicate text alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "a genuinely different document iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    Dedup.publishBatch(batch, corpusDir, sigDir)
    val published = spark.read.parquet(corpusDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(published == Set(1L, 3L), s"expected within-batch collapse to {1,3}, got $published")
    // the loser's signatures must not be in the table either: a later
    // re-send of the same text under a new id still dedupes against id 1
    val resend = Seq((9L, "within batch duplicate text alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    Dedup.publishBatch(resend, corpusDir, sigDir)
    val after = spark.read.parquet(corpusDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 3L), s"re-sent dup leaked: $after")
  }

  test("connected components collapse transitive chains to one survivor") {
    import spark.implicits._
    // A~B~C with no direct A~C edge, plus a separate 2-cluster and an
    // 8-node path (forces multiple propagation iterations: min label must
    // travel the full diameter)
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L), (25L, 26L), (26L, 27L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      24L -> 20L, 25L -> 20L, 26L -> 20L, 27L -> 20L))
  }

  test("q56 cluster roots are consistent with q29's pair graph") {
    val clusters = Dedup.q56DedupClusters(spark, "/root/testdata/sf0.01").cache()
    val pairs = Dedup.q29DedupMinhash(spark, "/root/testdata/sf0.01")
      .select(col("doc_a"), col("doc_b"))
    // every doc in a pair is clustered, exactly one survivor per cluster,
    // and the root is the cluster's min doc_id
    val nodes = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    assert(clusters.count() == nodes)
    val perCluster = clusters.groupBy(col("cluster_id"))
      .agg(sum(when(col("is_survivor"), 1).otherwise(0)).as("n_surv"),
           min(col("doc_id")).as("min_id"))
    assert(perCluster.filter(col("n_surv") =!= 1).count() == 0)
    assert(perCluster.filter(col("min_id") =!= col("cluster_id")).count() == 0)
    // both endpoints of every edge landed in the same cluster
    val l = clusters.select(col("doc_id"), col("cluster_id"))
    val crossEdges = pairs
      .join(l.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("cluster_id", "ca"), "doc_a")
      .join(l.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("cluster_id", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(crossEdges == 0)
  }

  test("q34 LSH neighbors are a subset of valid vectors with sane sims") {
    val lsh = Similarity.q34KnnLsh(spark, sf).cache()
    assert(lsh.count() > 0)
    assert(lsh.filter(col("cos_sim") < -1.0 || col("cos_sim") > 1.0).count() == 0)
    // every returned neighbor must share the query's bucket → self-join free
    assert(lsh.filter(col("neighbor_id") === col("query_id")).count() == 0)
  }

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def meanRecallVsExact(approx: org.apache.spark.sql.DataFrame,
                                dir: String = sf): Double = {
    val exact = neighborSets(Similarity.q33KnnBrute(spark, dir))
    val ap = neighborSets(approx)
    val recalls = exact.map { case (q, ex) =>
      ap.get(q).map(a => (a & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  private val sf01 = "/root/testdata/sf0.01"

  test("q257 IVF recall curve: monotone, exact 10000 at full coverage, price rises with probes") {
    val rows = Similarity.q257IvfRecallCurve(spark, sf01).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val recalls = rows.map(_.getAs[Long]("recall_bp"))
    val scanned = rows.map(_.getAs[Long]("scanned_bp"))
    // more probes can only help, and the price can only grow
    assert(recalls.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(scanned.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    // nprobe = k probes EVERY cell: candidates = the whole corpus, so the
    // curve's last point must equal brute force EXACTLY, and the scanned
    // share is the full corpus
    assert(recalls.last == 10000L, s"full-coverage recall ${recalls.last} != 10000")
    assert(scanned.last == 10000L, s"full-coverage scan share ${scanned.last} != 10000")
    // the q48 production point (nprobe=8) keeps its pinned floor
    assert(recalls(3) >= 8000L, s"nprobe=8 recall ${recalls(3)} < 8000")
    // all sweep points share one truth set
    assert(rows.map(_.getAs[Long]("n_truth")).distinct.length == 1)
  }

  test("q312 graph ANN: hub graph connected + deterministic; complete-graph full-beam equals brute force") {
    val (hubs, nbrs) = Similarity.hubGraph(spark, sf01, 16, 4)
    assert(hubs.length == 16 && nbrs.length == 16)
    nbrs.zipWithIndex.foreach { case (ns, i) =>
      assert(ns.contains((i + 1) % 16), s"hub $i lacks its ring link")
      assert(!ns.contains(i), s"hub $i is its own neighbor")
      assert(ns.distinct.length == ns.length && ns.forall(j => j >= 0 && j < 16))
      assert(ns.length <= 5, s"hub $i degree ${ns.length} > m+ring") // m + ring
    }
    // the model is memoized AND deterministic: a rebuild is identical
    val (hubs2, nbrs2) = Similarity.hubGraph(spark, sf01, 16, 4)
    assert(hubs2.zip(hubs).forall { case (a, b) => a.sameElements(b) })
    assert(nbrs2.zip(nbrs).forall { case (a, b) => a.sameElements(b) })
    // complete graph + full beam: hop 1 reaches every hub, so the probe
    // set is ALL buckets and the result must equal brute force EXACTLY
    val full = Similarity.q312KnnGraph(spark, sf01, h = 16, m = 15, ef = 16, hops = 2)
    assert(neighborSets(full) == neighborSets(Similarity.q33KnnBrute(spark, sf01)))
  }

  test("q313 graph-ANN recall curve: monotone in beam width, defaults hold the recall floor") {
    val recall = meanRecallVsExact(Similarity.q312KnnGraph(spark, sf01), sf01)
    info(s"q312 default (h=16, m=4, ef=8, hops=3) recall@5 = $recall")
    assert(recall >= 0.7, s"graph-ANN recall@5 = $recall < 0.7")
    val rows = Similarity.q313GraphRecallCurve(spark, sf01).collect()
      .sortBy(_.getAs[Long]("ef"))
    assert(rows.map(_.getAs[Long]("ef")).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val recalls = rows.map(_.getAs[Long]("recall_bp"))
    val scanned = rows.map(_.getAs[Long]("scanned_bp"))
    info(s"q313 recall_bp = ${recalls.toSeq}, scanned_bp = ${scanned.toSeq}")
    // a wider beam can only widen the probe set the walk keeps
    assert(recalls.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
      recalls.toSeq.toString)
    assert(scanned.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
      scanned.toSeq.toString)
    // ef = H keeps every scored hub: with the ring guaranteeing
    // reachability, 3 hops from hub 0 cover ≥ the ef=8 beam's buckets —
    // pin the production point's floor instead of a full-coverage
    // identity (the walk only scores hubs it REACHES, by design)
    assert(recalls(3) >= 7000L, s"ef=8 recall ${recalls(3)} < 7000")
    assert(rows.map(_.getAs[Long]("n_truth")).distinct.length == 1)
  }

  test("q314 ranking quality: 0 <= quality_bp <= 10000, dcg_lsh never beats ideal, weights strictly decrease") {
    // the rearrangement bound: the ideal list maximizes the gain multiset
    // at descending weights, so LSH can tie but never beat it
    val ws = Similarity.DcgWeights
    assert(ws.head == 1000000L && ws.sliding(2).forall { case Seq(a, b) => a > b })
    val rows = Similarity.q314AnnRankingQuality(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, i, q) = (r.getAs[Long]("dcg_lsh"), r.getAs[Long]("dcg_ideal"),
        r.getAs[Long]("quality_bp"))
      assert(l >= 0L && l <= i, s"dcg_lsh $l beats ideal $i")
      assert(q >= 0L && q <= 10000L, s"quality_bp $q out of range")
      assert(q == l * 10000L / math.max(i, 1L), "ratio must reconcile with its parts")
    }
    info(s"mean quality_bp = ${rows.map(_.getAs[Long]("quality_bp")).sum / rows.length}")
  }

  test("q48 IVF with learned k-means centroids reaches recall@5 >= 0.8 at sf0.01") {
    val recall = meanRecallVsExact(Similarity.q48KnnIvf(spark, sf01), sf01)
    assert(recall >= 0.8, s"IVF recall@5 = $recall < 0.8")
  }

  test("q48 IVF recall improves monotonically with nprobe (sweep)") {
    val rs = Seq(1, 2, 4, 8).map(np =>
      np -> meanRecallVsExact(Similarity.q48KnnIvf(spark, sf01, nprobe = np), sf01))
    // full-probe (nprobe = k would be exact modulo quantizer ties) must
    // dominate narrow probes; allow equal since recall saturates
    assert(rs.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a - 1e-9 },
      s"recall not monotone in nprobe: $rs")
    // the synthetic embeddings are unclustered (near-random), so recall is
    // bounded by scan fraction; 0.8 at nprobe=8/k=32 is the honest ceiling
    // here (measured 0.84) — real clustered corpora saturate much higher
    assert(rs.last._2 >= 0.8, s"nprobe=8 recall ${rs.last._2} < 0.8")
  }

  test("q34 LSH recall vs q33 exact baseline meets its deterministic floor") {
    // hyperplanes are seeded and the data is fixed, so recall is a
    // constant of the build — pin it instead of accepting any nonzero.
    // (Near-orthogonal synthetic vectors are LSH's worst case; q48 IVF is
    // the high-recall path at 0.84.)
    val r1 = meanRecallVsExact(Similarity.q34KnnLsh(spark, sf))
    val r2 = meanRecallVsExact(Similarity.q34KnnLsh(spark, sf01), sf01)
    assert(r1 >= 0.25, s"sf0.001 recall $r1") // measured 0.28
    assert(r2 >= 0.25, s"sf0.01 recall $r2")  // measured 0.32
    info(s"q34 recall@5: sf0.001=$r1 sf0.01=$r2")
  }

  test("q134 PQ codes are well-formed: m per vector, each in [0, k)") {
    val books = Similarity.pqCodebooks(spark, sf)
    val codes = Similarity.pqCodesDf(spark, sf, books)
    assert(codes.filter(size(col("codes")) =!= 8).count() == 0)
    assert(codes.filter(exists(col("codes"),
      c => c < 0 || c >= 32)).count() == 0)
    // the codebook is model-sized: 8 books × 32 codewords × 8 dims
    assert(books.length == 8 && books.forall(b =>
      b.length == 32 && b.forall(_.length == 8)))
  }

  test("q134 PQ+ADC with exact re-rank reaches recall@5 >= 0.9 at sf0.01") {
    // measured 1.0 at the default 128-deep shortlist (0.88 at 64): the
    // re-rank makes recall a function of shortlist depth, not quantizer
    // error — exactly the lever a 100 TB deployment tunes
    val recall = meanRecallVsExact(Similarity.q134KnnPq(spark, sf01), sf01)
    assert(recall >= 0.9, s"PQ recall@5 = $recall < 0.9")
    info(s"q134 recall@5 sf0.01 = $recall")
  }

  test("q134 recall grows with the ADC shortlist (re-rank absorbs a longer list)") {
    val rs = Seq(8, 64).map(n =>
      n -> meanRecallVsExact(Similarity.q134KnnPq(spark, sf01, shortlist = n), sf01))
    assert(rs(1)._2 >= rs(0)._2 - 1e-9, s"recall not monotone in shortlist: $rs")
  }

  test("q134 plan: compressed scan is shuffle-free, re-rank is a broadcast point lookup") {
    val p = Similarity.q134KnnPq(spark, sf).queryExecution.executedPlan.toString
    // ADC pass: queries broadcast against the codes projection (no corpus
    // exchange); shortlist trimmed map-side before its only exchange
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    // re-rank: the float-vector fetch joins the broadcast shortlist by key
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q54 cell-blocked embedding dedup recovers q32's pairs with a bounded candidate set") {
    val pairs = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val labelBlocked = pairs(Dedup.q32DedupEmbedding(spark, sf01))
    val cellBlocked = pairs(Dedup.q54DedupEmbeddingCells(spark, sf01))
    assert(labelBlocked.nonEmpty)
    val recovered = (labelBlocked & cellBlocked).size.toDouble / labelBlocked.size
    assert(recovered >= 0.8, s"cell blocking recovered only $recovered of label-blocked pairs")

    // scale guarantee: candidate pair work is bounded by cell sizes, far
    // below the all-pairs n(n-1)/2 — computed with the SAME k/probes the
    // q54 call above actually ran (its defaults: k=32, probes=4)
    val n = spark.read.parquet(s"$sf01/embeddings.parquet").count()
    val centers = Similarity.kmeansCentroids(spark, sf01, k = 32, iters = 3)
    val cellSizes = spark.read.parquet(s"$sf01/embeddings.parquet")
      .withColumn("probes",
        slice(reverse(array_sort(Similarity.scoredCells(col("embedding"), centers))), 1, 4))
      .withColumn("cell", explode(expr("transform(probes, s -> -s.negcell)")))
      .groupBy("cell").count().collect().map(_.getLong(1))
    val candidateWork = cellSizes.map(c => c * (c - 1) / 2).sum
    assert(candidateWork < n * (n - 1) / 2 / 2,
      s"cell blocking does not bound candidate work: $candidateWork vs all-pairs ${n * (n - 1) / 2}")
  }

  test("q114 per-dimension stats: full 64-dim coverage, consistent bounds, brute-force dim 0") {
    val rows = Similarity.q114DimStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq == (0L until 64L))
    val nVecs = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == nVecs)
      val (lo, hi) = (r.getAs[Long]("min_micro"), r.getAs[Long]("max_micro"))
      val mean = r.getAs[Double]("mean_micro")
      assert(lo <= mean && mean <= hi)
      assert(r.getAs[Double]("std_micro") >= 0.0)
    }
    // dim 0 against a driver-side brute force over the raw vectors
    val us = Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(r => math.round(r.getSeq[Float](0).head.toDouble * 1000000))
    val d0 = rows.find(_.getAs[Long]("dim") == 0L).get
    assert(d0.getAs[Long]("min_micro") == us.min && d0.getAs[Long]("max_micro") == us.max)
    val mean = us.sum.toDouble / us.length
    assert(math.abs(d0.getAs[Double]("mean_micro") - mean) < 0.51,
      s"mean ${d0.getAs[Double]("mean_micro")} vs brute $mean")
  }

  test("q122 robust scaler: ordered quartiles, iqr identity, brute-force dim 0") {
    val rows = Similarity.q122RobustScaler(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq == (0L until 64L))
    rows.foreach { r =>
      val (p25, med, p75) = (r.getAs[Double]("p25_micro"),
        r.getAs[Double]("median_micro"), r.getAs[Double]("p75_micro"))
      assert(p25 <= med && med <= p75)
      assert(math.abs(r.getAs[Double]("iqr_micro") - (p75 - p25)) < 1e-9)
    }
    // dim 0 against a driver-side exact interpolation
    val us = Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(r => math.round(r.getSeq[Float](0).head.toDouble * 1000000)).sorted
    def q(f: Double): Double = {
      val pos = f * (us.length - 1)
      val (i, frac) = (pos.toInt, pos - pos.toInt)
      if (i + 1 < us.length) us(i) + frac * (us(i + 1) - us(i)) else us(i).toDouble
    }
    val d0 = rows.find(_.getAs[Long]("dim") == 0L).get
    assert(math.abs(d0.getAs[Double]("median_micro") - q(0.5)) < 1e-4)
    assert(math.abs(d0.getAs[Double]("p25_micro") - q(0.25)) < 1e-4)
  }

  test("q124 minhash overlap sketch tracks q115's exact jaccard within the k=128 error bound") {
    val exact = graft.operators.TextAnalysis.q115CorpusOverlap(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("jaccard_bp")).toMap
    val est = graft.operators.TextAnalysis.q124OverlapSketch(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("est_jaccard_bp")).toMap
    // the sketch emits ALL source pairs; the exact form only intersecting ones
    assert(exact.keySet.subsetOf(est.keySet))
    val errs = est.map { case (pair, e) =>
      math.abs(e - exact.getOrElse(pair, 0L))
    }
    // per-pair: 8 sigma at J<=0.1, k=128 -> ~2100 bp; observed J here is
    // ~0-600 bp so 1500 is already generous
    assert(errs.max <= 1500, s"worst sketch error ${errs.max} bp")
    assert(errs.sum / errs.size <= 400, s"mean sketch error ${errs.sum / errs.size} bp")
  }

  test("q115 corpus overlap: ordered pairs, containment >= jaccard, common bounded by both sides") {
    val rows = graft.operators.TextAnalysis.q115CorpusOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val (c, na, nb) = (r.getAs[Long]("n_common"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(c >= 1 && c <= math.min(na, nb))
      val (j, ct) = (r.getAs[Long]("jaccard_bp"), r.getAs[Long]("containment_bp"))
      assert(j >= 0 && j <= 10000 && ct >= j,
        "containment must dominate jaccard (same numerator, smaller denominator)")
    }
  }

  test("q151 substring-dedup spans equal a brute-force reference on planted duplicates") {
    val W = 5
    // Unique filler everywhere; only the planted passages repeat. Cases:
    // S1 shared by docs 1/2/5(x2)/8; S2 at doc start (3), doc end (4), and
    // adjacent to S1 in doc 8 (must merge to ONE span); S3 repeated twice
    // WITHIN doc 6 only (not cross-doc -> no span); doc 7 clean.
    val s1 = "p1 p2 p3 p4 p5 p6 p7"            // 7 tokens -> span of 7
    val s2 = "q1 q2 q3 q4 q5"                  // exactly W tokens
    val s3 = "r1 r2 r3 r4 r5 r6"
    val docs = Seq(
      1L -> s"f01 f02 f03 $s1 f04 f05",
      2L -> s"f06 f07 $s1 f08 f09 f10",
      3L -> s"$s2 f11 f12 f13 f14",
      4L -> s"f15 f16 f17 f18 $s2",
      5L -> s"f19 $s1 f20 f21 f22 $s1 f23",    // two separated spans
      6L -> s"f24 $s3 f25 f26 $s3 f27",        // intra-doc only
      7L -> "f28 f29 f30 f31 f32 f33 f34",
      8L -> s"f35 $s1 $s2 f36")                // adjacent -> one 12-token span
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.substrDedupSpans(df, W).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("dup_tokens"),
        r.getAs[Long]("n_windows"))).toSet
    // brute force: dup window = text seen in >= 2 distinct docs; expected
    // spans = maximal contiguous runs of covered tokens (independent of
    // the SQL gaps-and-islands formulation)
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val winOcc = for ((id, w) <- toks; i <- 0 to w.length - W)
      yield (w.slice(i, i + W).mkString(" "), id, i)
    val dupGrams = winOcc.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = toks.flatMap { case (id, w) =>
      val hitPos = (0 to w.length - W)
        .filter(i => dupGrams(w.slice(i, i + W).mkString(" ")))
      val covered = hitPos.flatMap(p => p until p + W).toSet
      // maximal runs of covered token indices
      val runs = covered.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, t) if t == e0 + 1 => (s0, t) :: rest
        case (acc, t) => (t, t) :: acc
      }
      runs.map { case (s0, e0) =>
        (id, s0.toLong, (e0 + 1).toLong, (e0 + 1 - s0).toLong,
          hitPos.count(p => p >= s0 && p + W <= e0 + 1).toLong)
      }
    }.toSet
    assert(got == expected, s"got ${got.toSeq.sorted} vs expected ${expected.toSeq.sorted}")
    // the planted shape itself: doc 6 clean, doc 7 clean, doc 8 one 12-token span
    assert(!expected.exists(_._1 == 6L) && !expected.exists(_._1 == 7L))
    assert(expected.count(_._1 == 5L) == 2)
    assert(expected.exists(t => t._1 == 8L && t._4 == 12L))
  }

  test("q154 substring CUT equals brute force: owner keeps, others lose the span") {
    val W = 5
    val s1 = "p1 p2 p3 p4 p5 p6 p7"
    val s2 = "q1 q2 q3 q4 q5"
    val s3 = "r1 r2 r3 r4 r5 r6"
    val docs = Seq(
      1L -> s"f01 f02 f03 $s1 f04 f05",     // owner of S1's grams: keeps all
      2L -> s"f06 f07 $s1 f08 f09 f10",     // loses S1
      3L -> s"$s2 f11 f12 f13 f14",         // owner of S2: keeps
      4L -> s"f15 f16 f17 f18 $s2",         // loses S2
      5L -> s"f19 $s1 f20 f21 f22 $s1 f23", // loses BOTH S1 occurrences
      6L -> s"f24 $s3 f25 f26 $s3 f27",     // intra-doc only: untouched
      7L -> "f28 f29 f30 f31 f32 f33 f34",
      8L -> s"f35 $s1 $s2 f36")             // loses S1 AND S2 (12 tokens)
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.substrCut(df, W).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut_tokens"),
          r.getAs[String]("new_text")))).toMap
    // brute force: gram -> holder docs; owner = min; cut covered tokens
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val holders = toks.flatMap { case (id, w) =>
      (0 to w.length - W).map(i => (w.slice(i, i + W).mkString(" "), id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    toks.foreach { case (id, w) =>
      val cut = (0 to w.length - W).flatMap { i =>
        val hs = holders(w.slice(i, i + W).mkString(" "))
        if (hs.length >= 2 && hs.min != id) (i until i + W) else Seq.empty
      }.toSet
      val expText = w.indices.filterNot(cut).map(w).mkString(" ")
      val (n, nc, txt) = got(id)
      assert(n == w.length && nc == cut.size && txt == expText,
        s"doc $id: got ($n,$nc,'$txt') want (${w.length},${cut.size},'$expText')")
    }
    // planted invariants: owners and clean docs untouched, losers cut
    assert(got(1L)._2 == 0 && got(3L)._2 == 0 && got(6L)._2 == 0 && got(7L)._2 == 0)
    assert(got(2L)._2 == 7 && got(4L)._2 == 5 && got(5L)._2 == 14 && got(8L)._2 == 12)
  }

  test("q169 keeps exactly one top-quality doc per cluster; ranking beats min-id somewhere") {
    val rows = Dedup.q169CanonicalDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $c keeps ${kept.length} docs")
      // the kept doc is the (quality desc, doc_id asc) maximum
      val want = members.minBy(m => (-m._3, m._1))
      assert(kept.head == want, s"cluster $c kept ${kept.head}, want $want")
    }
    // scope matches q56 exactly (same clusters, same membership)
    val q56 = Dedup.q56DedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == q56)
    // the quality ranking must actually matter: some cluster's canonical
    // doc is NOT the min-id survivor q56 would have crowned
    assert(byCluster.exists { case (c, members) =>
      members.find(_._4).get._1 != members.map(_._1).min
    }, "every canonical doc equals the min-id survivor - ranking is vacuous")
  }

  test("q175 SemDeDup verdicts equal an independent HOF-cosine recompute of the rule") {
    val tau = 0.2 // spec-low threshold so drops actually occur on the uncorrelated corpus
    val got = Dedup.q175SemDedup(spark, sf01, tau = tau).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Double]("cent_sim"), r.getAs[Boolean]("is_kept"))))
      .toMap
    val n = Tables.embeddings(spark, sf01).count()
    assert(got.size.toLong == n, "one verdict per vector")
    // independent recompute: same model, HOF cosine instead of the native
    // kernel, exists-aggregation instead of distinct+left-join
    val centers = Similarity.kmeansCentroids(spark, sf01, k = 16, iters = 3)
    val assigned = Tables.embeddings(spark, sf01)
      .withColumn("best", array_max(Similarity.scoredCells(col("embedding"), centers)))
      .select(col("vec_id"), col("embedding"),
        (-col("best").getField("negcell")).as("cell"),
        col("best").getField("cs").as("cent_sim"))
    val l = assigned.select(col("cell"), col("vec_id").as("ia"),
      col("embedding").as("ea"), col("cent_sim").as("ca"))
    val r = assigned.select(col("cell"), col("vec_id").as("ib"),
      col("embedding").as("eb"), col("cent_sim").as("cb"))
    val dominated = l.join(r, Seq("cell"))
      .filter((col("ca") < col("cb")) ||
        (col("ca") === col("cb") && col("ia") < col("ib")))
      .filter(graft.functions.VectorOps.cosineHof(col("ea"), col("eb")) >= tau)
      .groupBy(col("ib")).agg(count(lit(1)).as("ndom"))
      .collect().map(_.getLong(0)).toSet
    got.foreach { case (id, (_, _, kept)) =>
      assert(kept == !dominated.contains(id), s"vec $id verdict") }
    assert(dominated.nonEmpty, "no drops at spec tau - threshold vacuous")
    assert(dominated.size.toLong < n, "everything dropped")
    // per cell, the minimum-(cent_sim, id) member is structurally undroppable
    got.groupBy(_._2._1).foreach { case (cell, ms) =>
      val minKey = ms.minBy { case (id, (_, cs, _)) => (cs, id) }
      assert(minKey._2._3, s"cell $cell dropped its anchor-min member")
    }
  }

  test("q176 MMR: rank-1 is top relevance, scores non-increasing, verdict matches replay") {
    val rows = Similarity.q176MmrRerank(spark, sf01).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("mmr_score"),
        r.getAs[Double]("cos_sim")))
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, sf01).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length).toSeq, s"q$qid ranks")
      assert(byRank.map(_._3).distinct.length == byRank.length, s"q$qid repeats a doc")
      // monotone: the pool shrinks and the diversity penalty only grows
      byRank.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._4 >= lo._4, s"q$qid mmr_score increased with rank") }
      // greedy replay over the SELECTED set: each pick must beat every
      // LATER pick's marginal score at its own step (exchange argument)
      val q = emb(qid)
      for (t <- byRank.indices; u <- t + 1 until byRank.length) {
        val sel = byRank.take(t).map(x => emb(x._3))
        def marginal(id: Long): Double = {
          val rel = math.rint(cos(q, emb(id)) * 1e6) / 1e6
          val pen = if (sel.isEmpty) 0.0 else sel.map(e => cos(emb(id), e)).max
          0.7 * rel - 0.3 * pen
        }
        assert(marginal(byRank(t)._3) >= marginal(byRank(u)._3) - 1e-9,
          s"q$qid rank ${t + 1} not greedy-optimal vs rank ${u + 1}")
      }
      // rank-1 = pure top relevance among candidates: its cos_sim must be
      // the max cos_sim in the emitted set
      assert(byRank.head._5 >= byRank.map(_._5).max - 1e-12, s"q$qid rank-1 relevance")
    }
  }

  test("q179 cluster-aware split: clusters never straddle splits; marginals near 80/10/10") {
    val rows = Dedup.q179ClusterSplit(spark, sf01).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("group_key"), r.getAs[Boolean]("in_cluster"), r.getAs[String]("split"))))
      .toMap
    assert(rows.size == Tables.documents(spark, sf01).count())
    val clusters = Dedup.q56DedupClusters(spark, sf01).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    rows.foreach { case (id, (gk, inCl, _)) =>
      assert(gk == clusters.getOrElse(id, id), s"doc $id group key")
      assert(inCl == clusters.contains(id), s"doc $id membership flag")
    }
    // THE invariant q178 audits for: no candidate pair straddles splits
    val pairs = Dedup.q29DedupMinhash(spark, sf01)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(rows(a)._3 == rows(b)._3, s"pair ($a,$b) straddles splits")
    }
    // marginal split fractions stay near q74's 80/10/10 (coin is uniform
    // over GROUP keys; loose bounds — 5000-doc corpus, ~binomial noise)
    val frac = rows.values.groupBy(_._3).view.mapValues(_.size.toDouble / rows.size).toMap
    assert(frac("train") > 0.74 && frac("train") < 0.85, s"train ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.05 && frac.getOrElse("test", 0.0) > 0.05)
  }

  test("cluster map is built once per (session, dir) and shared by q56/q169/q179") {
    // same DataFrame INSTANCE back from the memo — the q56 CC pass ran
    // once for all three consumers; invalidation forces a fresh build
    val a = Dedup.clusterMap(spark, sf01)
    val b = Dedup.clusterMap(spark, sf01)
    assert(a eq b, "clusterMap not memoized")
    Dedup.invalidateClusterCache()
    val c = Dedup.clusterMap(spark, sf01)
    assert(!(a eq c), "invalidation did not drop the memo")
    // and the rebuilt map is value-identical (deterministic pipeline)
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      c.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("published cluster table serves canonical selection and splits exactly") {
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS clusters_b")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-warehouse/clusters_b"))
    Dedup.writeClusterTableBucketed(docs, "clusters_b", buckets = 8)
    val table = spark.table("clusters_b")
    // reference: the same production (xxhash64) pipeline, recomputed
    val recomputed = Dedup.connectedComponents(
        Dedup.fastCandidatePairs(docs).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("label").as("cluster_id"))
    assert(table.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      recomputed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // both consumers produce identical results off the published table
    val quality = graft.operators.TextAnalysis.q37QualityScore(spark, sf01)
      .select(col("doc_id"), col("quality"))
    val canonTab = Dedup.canonicalFrom(table, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).sorted.toSeq
    val canonRec = Dedup.canonicalFrom(recomputed, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).sorted.toSeq
    assert(canonTab == canonRec)
    val splitTab = Dedup.clusterSplitFrom(docs.select(col("doc_id")), table)
      .collect().map(r => (r.getLong(0), r.getString(3))).sorted.toSeq
    val splitRec = Dedup.clusterSplitFrom(docs.select(col("doc_id")), recomputed)
      .collect().map(r => (r.getLong(0), r.getString(3))).sorted.toSeq
    assert(splitTab == splitRec && splitTab.nonEmpty)
  }

  test("mergeClusterBatch equals a full rebuild over old+new pairs") {
    import spark.implicits._
    // old graph: {1,2,3} rooted at 1, {10,11} at 10, {20,21} at 20 (will
    // stay untouched), plus singleton docs 30/31 in no old pair
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("doc_a", "doc_b")
    val published = Dedup.connectedComponents(oldPairs)
      .select(col("doc_id"), col("label").as("cluster_id")).localCheckpoint()
    // new batch: bridges the 1- and 10-clusters (5), extends 1-cluster
    // with a new doc (4), and forms a brand-new cluster {30,31}
    val newPairs = Seq((3L, 5L), (5L, 11L), (4L, 1L), (30L, 31L)).toDF("doc_a", "doc_b")
    val merged = Dedup.mergeClusterBatch(published, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = Dedup.connectedComponents(oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == rebuilt, s"merged=$merged rebuilt=$rebuilt")
    // the untouched {20,21} component passed through verbatim
    assert(merged(20L) == 20L && merged(21L) == 20L)
    // the bridge collapsed both old components + new docs to root 1
    assert(Seq(2L, 3L, 4L, 5L, 10L, 11L).forall(merged(_) == 1L))
    assert(merged(30L) == 30L && merged(31L) == 30L)
  }

  test("q271 shardability on a planted corpus equals hand arithmetic; identity holds at sf") {
    import TestSpark.spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-shard").toString
    // family X (key "x1 x2 x3"): 4 copies over sources A,A,B,C →
    // global removes 3, per-source-sharded removes 1 (the extra A), misses 2;
    // family Y (key "y1 y2 y3"): 2 copies both in A → sharded ≡ global;
    // doc 7 is a singleton and must not row
    Seq(
      (1L, "x1 x2 x3 a", "en", "A", 10L),
      (2L, "x1 x2 x3 b", "en", "A", 10L),
      (3L, "x1 x2 x3 c", "en", "B", 10L),
      (4L, "x1 x2 x3 d", "en", "C", 10L),
      (5L, "y1 y2 y3 a", "en", "A", 10L),
      (6L, "y1 y2 y3 b", "en", "A", 10L),
      (7L, "z1 z2 z3 a", "en", "A", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$out/documents.parquet")
    val got = Dedup.q271DedupShardability(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == Map(
      4L -> ((1L, 4L, 3L, 1L, 2L, 0L, 6666L)),
      2L -> ((1L, 2L, 1L, 1L, 0L, 1L, 0L))))
    // at sf: per-family identity global = sharded + missed, and the doc
    // accounting reconciles with the oracled q28 family table
    val rows = Dedup.q271DedupShardability(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4) + r.getLong(5),
        s"identity broke at family_size ${r.getLong(0)}")
      assert(r.getLong(6) <= r.getLong(1))
    }
    val q28Docs = Dedup.q28DedupExact(spark, sf)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == q28Docs,
      "doc mass drifted from the oracled q28 families")
  }

  test("q273 near-dup shardability reconciles with the oracled q193 family table") {
    val rows = Dedup.q273NearDupShardability(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4) + r.getLong(5),
        s"identity broke at family_size ${r.getLong(0)}")
      assert(r.getLong(6) <= r.getLong(1))
    }
    // same clusters as q193: family counts, doc mass and excess agree
    val q193 = Dedup.q193DupFamilyDist(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == q193, "family accounting drifted from the oracled q193")
    // a cluster's sources recomputed driver-side pin the per-size sums
    val src = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySize = Dedup.clusterMap(spark, sf).collect()
      .map(r => (r.getLong(1), src(r.getLong(0))))
      .groupBy(_._1).values.toSeq
      .map(ms => (ms.size.toLong, ms.map(_._2).distinct.size.toLong))
      .groupBy(_._1).view.mapValues(fs =>
        (fs.size.toLong, fs.map { case (n, k) => n - k }.sum,
          fs.map(_._2 - 1).sum, fs.count(_._2 == 1).toLong)).toMap
    rows.foreach { r =>
      val (nf, sharded, missed, mono) = bySize(r.getLong(0))
      assert((r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6)) ==
        ((nf, sharded, missed, mono)), s"size ${r.getLong(0)} source split drifted")
    }
  }

  test("q286 key sweep: k=3 row equals the oracled q225; refinement laws hold") {
    val rows = Dedup.q286PrefixKeySweep(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val q225 = Dedup.q225DedupKeyPrecision(spark, sf).collect()(0)
    assert(rows(3L) == ((true, q225.getLong(0), q225.getLong(1), q225.getLong(2),
      q225.getLong(3), q225.getLong(4))), "production row drifted from q225")
    assert(rows.count(_._2._1) == 1)
    // a longer prefix REFINES the grouping: multi-group doc mass and
    // false-merge mass can only shrink as k grows
    val byK = rows.toSeq.sortBy(_._1).map(_._2)
    byK.zip(byK.tail).foreach { case (a, b) =>
      assert(b._4 <= a._4, "docs_in_multi must be non-increasing in k")
      assert(b._5 <= a._5, "docs_in_false must be non-increasing in k")
    }
  }

  test("q289 dup-by-length reconciles with q28's families and the corpus mass") {
    val rows = Dedup.q289DupByLength(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._2._1).sum == total, "decile doc mass must cover the corpus")
    // dup-doc mass equals the doc mass of q28's multi-copy families
    val q28Docs = Dedup.q28DedupExact(spark, sf)
      .agg(coalesce(sum(col("n_copies")), lit(0L))).collect()(0).getLong(0)
    assert(rows.map(_._2._2).sum == q28Docs, "dup mass drifted from q28")
    rows.foreach { case (d, (n, dup, bp)) =>
      assert(d >= 0 && d <= 9 && dup <= n && bp == dup * 10000 / n)
    }
  }

  test("q240 calibration buckets reconcile with the oracled q29+q31 pair tables") {
    val buckets = Dedup.q240MinhashCalibration(spark, sf).collect()
      .map(r => r.getAs[Long]("est_matches") -> ((r.getAs[Long]("n_pairs"),
        r.getAs[Long]("mean_jaccard_bp"), r.getAs[Long]("min_jaccard_bp"),
        r.getAs[Long]("max_jaccard_bp"), r.getAs[Long]("est_bp")))).toMap
    // q31 emits exactly the pairs q240 calibrates (LSH candidates with
    // >= 1 shared shingle); its rounded-4 jaccard doubles ARE integer bp
    val jacBp = graft.operators.Dedup.q31NgramJaccard(spark, sf).collect()
      .map(r => math.round(r.getAs[Double]("jaccard") * 10000))
    assert(buckets.values.map(_._1).sum == jacBp.length.toLong,
      s"bucket mass ${buckets.values.map(_._1).sum} != q31 pairs ${jacBp.length}")
    // q240 floors (integer DIV), q31 rounds to nearest 1e-4 — the two
    // renderings of the same exact ratio differ by at most 1 bp
    assert(math.abs(buckets.values.map(_._3).min - jacBp.min) <= 1)
    assert(math.abs(buckets.values.map(_._4).max - jacBp.max) <= 1)
    // structural: agreement in 2..16 (a shared band forces 2 equal
    // positions), est_bp = est/16, mean inside [min, max]
    assert(buckets.keys.forall(k => k >= 2L && k <= 16L))
    buckets.foreach { case (k, (_, mean, mn, mx, est)) =>
      assert(est == k * 10000 / 16)
      assert(mean >= mn && mean <= mx, s"bucket $k mean $mean outside [$mn,$mx]")
    }
    // calibration liveness: near-dup mass agrees at all 16 positions and
    // that bucket's TRUE jaccard is high (the estimator is honest where
    // it claims 10000), and the estimator separates: the full-agreement
    // bucket's mean dominates the weakest bucket's
    assert(buckets.contains(16L), buckets.keySet.toString)
    assert(buckets(16L)._2 >= 9000L, buckets(16L).toString)
    assert(buckets.size > 1 && buckets(16L)._2 >= buckets(buckets.keys.min)._2)
  }
}
