package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** C-block: deduplication over the `documents` / `embeddings` tables.
  *
  * Scale design: candidate generation is always bucketed (LSH bands /
  * hamming bands / label blocking) — the shuffle is O(n·bands) and pair
  * expansion is bounded per bucket, never a global O(n²) cross join.
  *
  * Oracle parity trick: the MinHash permutation family is Carter–Wegman
  * over ONE md5-derived 60-bit fingerprint per distinct shingle
  * ((a_i·fp + b_i) mod 2⁶¹−1 — see `cwParams`), which both Spark (exact
  * DECIMAL multiply) and DuckDB (HUGEINT) compute identically — no
  * engine-native hash needed, and the per-doc aggregation runs over
  * BIGINTs, not hex strings.
  */
object Dedup {

  private val NumHashes = 16
  private val NumBands  = 8 // 2 rows per band

  /** Carter–Wegman permutation constants for the oracle minhash path:
    * h_i(x) = (a_i·x + b_i) mod P over a 28-bit md5-derived shingle
    * fingerprint, P = 2³¹−1 (Mersenne). ONE md5 per shingle occurrence
    * replaces the previous 16 (`md5('i:' || sh)` per permutation), and the
    * per-document min-aggregation runs over 16 BIGINTs instead of 16
    * 32-char hex strings — the "md5-oracle tax" cut of round 8 (SURVEY
    * §8). Sizing: a_i, fp < 2³¹ keeps a_i·fp + b_i < 2⁶² inside plain
    * int64 on BOTH engines (an earlier 61-bit variant needed
    * DECIMAL/HUGEINT multiplies and benched SLOWER than the md5s it
    * removed); 28-bit fp collisions are harmless to a min-of-hashes and
    * identical on both engines anyway. The constants are embedded into
    * the oracle SQL from THIS array, so parity is by construction. Seeded
    * deterministically (java.util.Random's LCG is spec-stable).
    */
  private val MersenneP = 2147483647L // 2^31 - 1
  private val cwParams: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(8191)
    IndexedSeq.fill(NumHashes)((
      math.floorMod(rnd.nextLong(), MersenneP - 1) + 1,
      math.floorMod(rnd.nextLong(), MersenneP)))
  }

  /** word-3-gram shingle OCCURRENCES per document (multiset — min over a
    * multiset equals min over its set, so the minhash paths need no
    * distinct; the Jaccard confirm family gets its set semantics from
    * [[shingleSetsOf]]'s collect_set, never a corpus-wide distinct).
    */
  private def shinglesOf(docs: DataFrame): DataFrame = {
    val occ = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      // native window sweep (functions/WordNgrams.scala): short docs
      // yield an empty array the explode drops — no sequence(1, n-2)
      // descending-guard needed, no interpreted per-element lambda
      .select(col("doc_id"),
        explode(graft.functions.WordNgrams(col("w"), 3)).as("sh"))
    occ
  }

  /** Per-document SORTED distinct-shingle arrays — the confirm family's
    * input frame: ONE map-side-combined collect_set fold (set semantics
    * inside the agg buffer, no separate corpus-wide distinct exchange)
    * followed by sort_array, whose StringType ordering is the SAME binary
    * UTF8String comparison [[graft.functions.SortedIntersectCount]]'s
    * merge uses. A < 3-word doc yields no shingles and therefore NO row —
    * exactly the population the former explode produced, so inner joins
    * against this frame drop the same pairs the exploded form dropped. */
  private def shingleSetsOf(docs: DataFrame): DataFrame =
    shinglesOf(docs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))

  private[graft] def intersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Exact per-pair shingle-intersection scores — the confirm the whole
    * family (q31/q199/q210/q240/q249/q261) shares. The former shape
    * exploded every candidate doc's shingle set into rows, self-joined
    * per pair on shingle equality and re-aggregated to (doc_a, doc_b)
    * counts — a Σ(|A|+|B|) row blowup through two joins plus a
    * re-aggregation exchange, the suite's slowest family at sf0.1. This
    * shape joins the pair table to the per-doc sorted-array frame twice
    * (doc-level rows, no blowup) and computes |A∩B| with the native merge
    * kernel; set sizes ride along as array sizes, deleting the separate
    * `sizes` aggregation and its two joins. Only pairs with ≥ 1 shared
    * shingle survive — the inner-intersection semantics every caller had
    * (a zero-overlap hash-collision pair drops here exactly as it dropped
    * from the former inner join). Returns (doc_a, doc_b, n_inter ≥ 1,
    * c_a, c_b) with counts as BIGINT, matching the former count(1) legs.
    */
  private def pairIntersections(cand: DataFrame, candDocs: DataFrame)
      : DataFrame = {
    val s = cand.sparkSession
    val arr = shingleSetsOf(candDocs).localCheckpoint()
    // The pair frame is byte-tiny (16 B/row), so AQE coalesces it to ONE
    // task and the whole per-pair work — the UnsafeRow copy of both
    // arrays per joined pair plus the merge — runs serial (censused
    // 4.5 s single-task on q261's 156 k-pair union frame). The cost is
    // per-PAIR, not per-input-byte, so AQE's byte-based sizing cannot see
    // it: broadcast the doc-array side (bounded by the doc-count gate
    // below — the arrays are text-scale bytes, ~3× the candidate docs'
    // text) and spread the pairs explicitly over deterministic hash keys
    // (REPARTITION_BY_NUM — AQE keeps the user-specified width). Above
    // the gate both joins fall back to doc_id shuffle joins: the pair
    // frame then carries real bytes after the first join and AQE's
    // byte-based sizing prices it correctly.
    val arrSmall = arr.count() <= s.conf
      .getOption("graft.dedup.shingleArrayBroadcastMaxDocs")
      .map(_.toLong).getOrElse(100000L)
    // xxhash64 of BOTH keys, not the keys themselves: a plain
    // (doc_a, doc_b) repartition is pruned when the pair frame arrives
    // from a distinct() already hash-partitioned on exactly those keys
    // (q261's union frame — censused: the whole confirm re-coalesced to
    // ONE task), and the derived key stays deterministic (§2.5).
    val spread = if (arrSmall)
      cand.repartition(s.sparkContext.defaultParallelism,
        xxhash64(col("doc_a"), col("doc_b")))
    else cand
    val arrSide = (df: DataFrame) => if (arrSmall) broadcast(df) else df
    spread
      .join(arrSide(arr).as("ia"), col("doc_a") === col("ia.doc_id"))
      .join(arrSide(arr).as("ib"), col("doc_b") === col("ib.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        intersectCount(col("ia.shs"), col("ib.shs")).as("n_inter"),
        size(col("ia.shs")).cast("long").as("c_a"),
        size(col("ib.shs")).cast("long").as("c_b"))
      .filter(col("n_inter") > 0L)
  }

  /** (doc_id, band_id, sig) LSH band signatures from the Carter–Wegman
    * oracle minhash.
    *
    * JOIN-FREE: one md5-derived 60-bit fingerprint per shingle OCCURRENCE
    * (a pure projection), 16 CW permutations of that integer, and a
    * map-side-combined per-document min aggregation. Earlier rounds kept a
    * distinct-shingle dictionary (16 md5s were too expensive per
    * occurrence) and joined it back under a gated broadcast; with ONE md5
    * per occurrence the dict, its distinct shuffle, its broadcast ceiling
    * and its join all disappear — the path now has NO join anywhere before
    * pair expansion (plan-pinned in DedupSimilaritySpec), which is the
    * stronger 100 TB shape: no dictionary state to size, just
    * scan → project → partial agg.
    */
  private def bandSignatures(s: SparkSession, dir: String): DataFrame =
    bandsOf(mhSignatures(s, dir))

  /** The per-document FULL signature (doc_id, m0..m{H−1}) — factored from
    * the band projection so q240's calibration can read signature-level
    * agreement off the same single minhash pass that feeds the banding.
    */
  private def mhSignatures(s: SparkSession, dir: String): DataFrame = {
    val sh = shinglesOf(Tables.documents(s, dir))
      .withColumn("fp", expr("CAST(conv(substring(md5(sh), 1, 7), 16, 10) AS BIGINT)"))
    val minCols = cwParams.zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"($a * fp + $b) % $MersenneP")).as(s"m$i") }
    sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
  }

  /** Signature frame → (doc_id, band_id, sig) band rows. */
  private def bandsOf(mh: DataFrame): DataFrame = {
    val bandCols = (0 until NumBands).map(b =>
      struct(lit(b).as("band_id"),
             concat_ws(":", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("sig")))
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.sig").as("sig"))
  }

  /** (band_id, sig) signatures → distinct candidate pairs (doc_a < doc_b)
    * + shared-band count. Shared by the md5 (q29) and xxhash64 (q49) paths.
    *
    * One groupBy into (band, sig) buckets, then in-partition pair expansion
    * with higher-order functions — a self-join on the signatures would
    * re-execute the entire minhash pipeline for each side (Spark does not
    * share the common subtree). The pipeline runs exactly once.
    *
    * Hot-bucket guard: a bucket larger than `graft.dedup.maxBucketSize`
    * (default 4096) is dropped, not expanded — a band bucket that collects
    * thousands of documents no longer discriminates (its pairs are
    * overwhelmingly false positives) and its n² expansion is exactly the
    * adversarial-skew blowup. The collect_list itself stays linear in
    * bucket size (an 80 MB list for a 10M-doc bucket — survivable); it's
    * the quadratic pair explosion the cap prevents. The default sits far
    * above anything a real LSH bucket reaches, so oracle output is
    * unchanged; the cap path is spec-forced in DedupSimilaritySpec.
    * (Paths whose output is claimed EXACT — q69's pigeonhole guarantee —
    * use their own inline band expansion rather than this guarded one,
    * so the cap applies to every caller here unconditionally.)
    */
  private[graft] def expandPairs(s: SparkSession, sigs: DataFrame): DataFrame =
    expandPairsBy(s, sigs, Nil)

  /** Candidate pairs BETWEEN a batch's signatures and a published
    * signature table — the cross half of incremental clustering (s38's
    * sink; within-batch pairs come from [[expandPairs]] on the same
    * batch sigs). The published side is touched-bucket-pruned FIRST
    * (semi-join on the batch's (band_id, sig) set — the
    * [[dedupeIncremental]] argument: the corpus-scale side is read only
    * where the batch lands; a bucketed signature table makes that read
    * exchange-free), and buckets whose COMBINED size (touched published
    * rows + batch rows) exceeds `graft.dedup.maxBucketSize` are dropped
    * WHOLE — the same bucket the full REBUILD would cap (review finding
    * r17: capping the published side alone let the incremental path emit
    * pairs near the boundary that a rebuild's combined cap drops).
    * [[expandPairsBy]]'s discrimination rule applies unchanged: a
    * corpus-scale bucket no longer discriminates and its batch × bucket
    * cross product is exactly the adversarial-skew blowup. Output is
    * (doc_a < doc_b) normalized and distinct. */
  private[graft] def crossCandidatePairs(batchSigs: DataFrame,
      publishedSigs: DataFrame): DataFrame = {
    val s = batchSigs.sparkSession
    val maxBucket =
      s.conf.getOption("graft.dedup.maxBucketSize").map(_.toInt).getOrElse(4096)
    val touched = publishedSigs
      .join(batchSigs.select(col("band_id"), col("sig")).distinct(),
        Seq("band_id", "sig"), "left_semi")
    val batchCounts = batchSigs.groupBy(col("band_id"), col("sig"))
      .agg(count(lit(1)).as("bn"))
    val admissible = touched.groupBy(col("band_id"), col("sig"))
      .agg(count(lit(1)).as("pn"))
      .join(batchCounts, Seq("band_id", "sig"))
      .filter(col("pn") + col("bn") <= maxBucket)
      .select(col("band_id"), col("sig"))
    touched.join(admissible, Seq("band_id", "sig"), "left_semi").as("p")
      .join(batchSigs.as("b"), Seq("band_id", "sig"))
      .filter(col("p.doc_id") =!= col("b.doc_id"))
      .select(least(col("p.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("p.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
  }

  /** The guarded band expansion with optional EXTRA key columns (q261
    * tags a `scheme` so all four bandings ride ONE exchange) — same
    * bucket semantics per (extra…, band_id, sig). */
  private def expandPairsBy(s: SparkSession, sigs: DataFrame,
      extra: Seq[String]): DataFrame = {
    val maxBucket =
      s.conf.getOption("graft.dedup.maxBucketSize").map(_.toInt).getOrElse(4096)
    val keys = extra ++ Seq("band_id", "sig")
    sigs
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(extra.map(col) :+ explode(expr(
        """flatten(transform(ids, (x, i) ->
           transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"""))
        .as("p"): _*)
      .select(extra.map(col) :+ col("p.doc_a") :+ col("p.doc_b"): _*)
      .groupBy((extra ++ Seq("doc_a", "doc_b")).map(col): _*)
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  private def candidatePairs(s: SparkSession, dir: String): DataFrame =
    expandPairs(s, bandSignatures(s, dir))

  /** q28: exact dedup by canonical key (first 3 words) — hash-groupBy, keep
    * min doc_id. The canonical-key form of exact dedup used to fold
    * boilerplate-prefixed copies.
    */
  def q28DedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.contentHashCol.as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_copies") > 1)

  /** q271: dedup SHARDABILITY audit — the 100 TB architecture question
    * behind every dedup deployment: can exact dedup run PARTITION-LOCAL
    * per source (no global shuffle — each feed dedupes inside its own
    * ingest pipeline), or do duplicate families span sources so a sharded
    * pass silently under-removes? Per family size over q28's exact
    * families: global removals (n_copies − 1), what a per-source-sharded
    * pass removes (n_copies − n_sources), what it MISSES (n_sources − 1,
    * one survivor per extra source), mono-source family count, and
    * missed_bp. missed_bp ≈ 0 ⇒ shard dedup by source and skip the
    * corpus-wide exchange entirely; large ⇒ the global shuffle is earning
    * its cost. The identity global = sharded + missed holds per family by
    * construction (spec-pinned).
    *
    * Scale shape: exactly q28's — one hash projection, one
    * map-side-combined content-hash fold, then a |family-sizes|-bounded
    * second fold. One definition of the key ([[TextAnalysis.contentHashCol]],
    * shared with q28/q268/s32).
    */
  def q271DedupShardability(s: SparkSession, dir: String): DataFrame =
    shardabilityOf(Tables.documents(s, dir)
      .select(TextAnalysis.contentHashCol.as("content_hash"), col("source"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_copies") > 1))

  /** The shardability accounting on ANY (n_copies, n_sources) family
    * frame — ONE definition serving q271 (exact families) and q273
    * (near-dup clusters). */
  private[graft] def shardabilityOf(fam: DataFrame): DataFrame =
    fam.groupBy(col("n_copies"))
      .agg(count(lit(1)).as("n_families"),
        sum(col("n_copies") - col("n_sources")).as("sharded_removals"),
        sum(col("n_sources") - 1).as("missed_removals"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("mono_source_families"))
      .select(col("n_copies").as("family_size"), col("n_families"),
        (col("n_copies") * col("n_families")).as("n_docs"),
        ((col("n_copies") - 1) * col("n_families")).as("global_removals"),
        col("sharded_removals"), col("missed_removals"),
        col("mono_source_families"),
        expr("missed_removals * 10000 DIV ((n_copies - 1) * n_families)")
          .as("missed_bp"))

  /** q273: NEAR-DUP cluster shardability — q271's architecture question
    * at the layer where dedup actually acts: the confirmed near-dup
    * CLUSTERS (the shared memoized [[clusterMap]] — q56/q169/q179/q193's
    * connected components, zero drift possible). Exact-key families shard
    * well almost by construction (mirrors keep bytes); near-dup families
    * are where cross-feed mirroring lives, so THIS table is the one that
    * decides whether LSH banding + confirm can run per-source (each feed
    * its own signature table, no global band exchange) or must stay
    * global. Same accounting, same identity, same missed_bp verdict.
    *
    * Scale shape: the cluster map is corpus-bounded and memoized (or a
    * published table at deployment scale); one doc_id join to the pruned
    * (doc_id, source) projection, one cluster fold, one |sizes| fold.
    */
  def q273NearDupShardability(s: SparkSession, dir: String): DataFrame =
    shardabilityOf(clusterMap(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("source")).as("n_sources")))

  /** q29: MinHash + LSH banding near-dup candidate pairs. */
  def q29DedupMinhash(s: SparkSession, dir: String): DataFrame =
    candidatePairs(s, dir)

  /** q49: the production-path variant of q29 — xxhash64 minhashes instead
    * of md5 hex strings (8-byte longs vs 32-char strings through the whole
    * shuffle/agg pipeline). Same banding structure; no SQL oracle because
    * the hash is engine-native (rows-only + quality spec: its candidate
    * pairs have positive true Jaccard, like q29's).
    */
  /** (doc_id, band_id, sig) xxhash64 band signatures for ANY documents
    * frame (`doc_id`, `text`) — the engine-native production path shared by
    * q49 and the incremental-dedup API. The variable-length shingle string
    * is hashed ONCE per occurrence; the 16 permutations then re-hash that
    * fixed-width long with distinct seeds (cheap, and wraps internally — a
    * Carter-Wegman h1 + i*h2 would trip ANSI-mode overflow checks on the
    * multiply).
    */
  private[graft] def fastBandSignaturesOf(docs: DataFrame): DataFrame = {
    val sh = shinglesOf(docs)
      .withColumn("h0", xxhash64(col("sh")))
    // the native long[k]-buffer signature aggregate (bit-equal to the
    // k-separate min(xxhash64(lit(i), h0)) composition it replaced —
    // MinHashSpec pins that for long inputs too)
    val mh = sh.groupBy(col("doc_id"))
      .agg(graft.functions.MinHash.minhash(col("h0"), NumHashes).as("mh"))
    val bandCols = (0 until NumBands).map(b =>
      struct(lit(b).as("band_id"),
        hash(element_at(col("mh"), 2 * b + 1),
          element_at(col("mh"), 2 * b + 2)).as("sig")))
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.sig").as("sig"))
  }

  /** xxhash64 candidate pairs for ANY documents frame — q49's pipeline,
    * reusable by [[graft.CorpusPipeline]].
    */
  private[graft] def fastCandidatePairs(docs: DataFrame): DataFrame =
    expandPairs(docs.sparkSession, fastBandSignaturesOf(docs))

  def q49DedupMinhashFast(s: SparkSession, dir: String): DataFrame =
    fastCandidatePairs(Tables.documents(s, dir))

  /** Persist the xxhash64 band-signature table for a published corpus —
    * the state an incremental refresh dedupes against. At 100 TB this
    * table is ~n·bands rows of three fixed-width ints/longs. As written it
    * is plain parquet, so each incremental batch's semi-join shuffles the
    * published side; to make that exchange-free, register it as a table
    * `bucketBy((band_id, sig)).saveAsTable` (the path-based parquet writer
    * cannot bucket) — the bucketed-join plan shape is proven in
    * SkewBucketSpec.
    */
  def writeSignatureTable(docs: DataFrame, path: String): Unit =
    fastBandSignaturesOf(docs)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** The EXCHANGE-FREE form of [[writeSignatureTable]] for the 100 TB
    * refresh loop: the signature table becomes a catalog table BUCKETED
    * (and sorted) by the (band_id, sig) join key, so every future batch's
    * [[dedupeIncremental]] semi-join reads the published side in place —
    * only the (small) incoming batch shuffles to match the bucketing.
    * Path-based parquet cannot carry bucketing metadata, hence
    * `saveAsTable`; the published side is the corpus-scale one, so
    * removing ITS exchange is the whole point (the r7 note on
    * [[writeSignatureTable]] made real). Pass `spark.table(name)` as
    * `publishedSigs` — dedupeIncremental itself is unchanged.
    * DedupSimilaritySpec proves result equality with the path-based form
    * AND the strictly-smaller exchange count in the semi-join plan.
    */
  def writeSignatureTableBucketed(docs: DataFrame, table: String, buckets: Int = 32): Unit =
    fastBandSignaturesOf(docs).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, "band_id", "sig")
      .sortBy("band_id", "sig")
      .saveAsTable(table)

  /** Publish the near-dup CLUSTER map as a catalog table bucketed by
    * doc_id — the build-once/read-many form of the q56 pipeline, the
    * [[writeSignatureTableBucketed]] pattern one level up: the expensive
    * band → bucket → connected-components pass runs once per corpus
    * release, and every consumer (canonical selection via
    * [[canonicalFrom]], split assignment via [[clusterSplitFrom]],
    * leakage audits) joins the published (doc_id, cluster_id) table on
    * its bucketing key with NO exchange on the published side. Uses the
    * xxhash64 production signatures (q49's path), not q29's md5 oracle
    * twin. Refresh with [[mergeClusterBatch]] instead of rebuilding.
    */
  def writeClusterTableBucketed(docs: DataFrame, table: String, buckets: Int = 32): Unit =
    connectedComponents(fastCandidatePairs(docs).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("label").as("cluster_id"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .saveAsTable(table)

  /** Incremental cluster maintenance: fold a new batch's candidate pairs
    * (within-batch AND batch↔published, e.g. from
    * [[fastBandSignaturesOf]] joined against the published signature
    * table) into an existing (doc_id, cluster_id) membership frame
    * WITHOUT re-clustering the corpus. Work is bounded by the TOUCHED
    * components: published clusters are already transitively closed, so
    * each one is represented by its star edges (member → root, the root
    * being the component's min doc_id — itself a member), and only
    * clusters containing a doc mentioned in `newPairs` enter the CC
    * re-run; every untouched membership row passes through verbatim.
    * Because the published root IS the old component's min label, the
    * merged fixpoint equals a full rebuild over (old pairs ∪ new pairs)
    * exactly — DedupSimilaritySpec pins that equality.
    */
  def mergeClusterBatch(published: DataFrame, newPairs: DataFrame): DataFrame = {
    val delta = mergeClusterBatchDelta(published, newPairs).localCheckpoint()
    published.join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(delta)
  }

  /** The DELTA of [[mergeClusterBatch]] — only the membership rows the
    * batch's pairs change or create (touched-cluster docs re-labeled +
    * newly clustered docs), WITHOUT the pass-through of the rest of the
    * table: what a delta-sized `CommitLog.merge` upserts per micro-batch
    * (s38's sink), keeping per-batch write cost O(touched components)
    * while the maintained table stays corpus-scale. Rows whose label is
    * unchanged by the merge may still appear (they are in a touched
    * component) — an upsert no-op, never a wrong label. */
  private[graft] def mergeClusterBatchDelta(published: DataFrame,
      newPairs: DataFrame): DataFrame = {
    val pairs = newPairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val touchedDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    // clusters with at least one doc named in the batch (semi-joins keep
    // the published side's bucketed scan exchange-free on doc_id)
    val touchedClusters = published
      .join(touchedDocs, Seq("doc_id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val touched = published
      .join(touchedClusters, Seq("cluster_id"), "left_semi")
    val starEdges = touched.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
    connectedComponents(starEdges.unionByName(pairs))
      .select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Incremental dedup: drop from `newDocs` every document that is a
    * near-dup of the ALREADY-PUBLISHED corpus, by anti-joining the new
    * batch's band signatures against the persisted signature table — the
    * periodic-refresh reality of a continuously-ingested corpus. Only the
    * (small) new batch is shingled/hashed; the published corpus is touched
    * solely through its signature table. Within-batch duplicates are left
    * to the regular q49→q56 path.
    */
  def dedupeIncremental(newDocs: DataFrame, publishedSigs: DataFrame): DataFrame = {
    val dupIds = fastBandSignaturesOf(newDocs)
      .join(publishedSigs, Seq("band_id", "sig"), "left_semi")
      .select(col("doc_id")).distinct()
    newDocs.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** The refresh loop closed: dedupe a new batch against the published
    * state, collapse near-dups WITHIN the batch (candidate pairs →
    * connected components → keep-min-id — without this, two near-identical
    * docs arriving in one batch would both be appended to the corpus and
    * the signature table permanently, a leak the batch path would have
    * caught), then append the survivors to the corpus AND their band
    * signatures to the signature table — so the next batch dedupes against
    * everything published so far, including this batch.
    *
    * Bootstrap: a missing/empty `sigDir` means nothing is published yet —
    * the first batch skips the anti-join instead of failing on the read.
    *
    * The survivor frame is localCheckpointed: it cuts the lineage that
    * reads `sigDir` before we append to that same path (appending to a
    * path a lazy plan still reads is a correctness hazard), and makes the
    * two writes share one computation.
    */
  def publishBatch(newDocs: DataFrame, corpusDir: String, sigDir: String): Unit = {
    val s = newDocs.sparkSession
    val sigPath = new org.apache.hadoop.fs.Path(sigDir)
    val fs = sigPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val vsPublished =
      if (fs.exists(sigPath)) dedupeIncremental(newDocs, s.read.parquet(sigDir))
      else newDocs
    // within-batch collapse on what's left: checkpoint first so the pair
    // pipeline and the anti-join consume one computation of the frame
    val fresh = vsPublished.localCheckpoint()
    val losers = connectedComponents(
        fastCandidatePairs(fresh).select(col("doc_a"), col("doc_b")))
      .filter(col("doc_id") =!= col("label"))
      .select(col("doc_id"))
    val survivors = fresh.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
    survivors.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(corpusDir)
    fastBandSignaturesOf(survivors)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(sigDir)
  }

  /** q30/q69 shared oracle-simhash formula fragments. The 64-bit simhash
    * is assembled from four 16-bit md5 chunks per token via per-bit ±1
    * sums; every fragment below is embedded VERBATIM in both the Spark
    * plan and the DuckDB oracle CTE (the q29 Carter–Wegman pattern:
    * parity by construction). Only the hex→integer idiom differs per
    * engine (Spark `conv(hex,16,10)`, DuckDB `('0x'||hex)::BIGINT` —
    * the established q29 fingerprint split). The assembly interprets
    * chunk 3 as SIGNED 16-bit two's complement so bit 63 lands without
    * BIGINT overflow on either engine (the §6 sign-bit discipline).
    */
  private def simhashBitSumSql(b: Int): String =
    s"sum(2 * ((c${b / 16} >> ${b % 16}) & 1) - 1) AS s$b"
  private def simhashChunkValSql(c: Int): String =
    (0 until 16).map(k =>
      s"(CASE WHEN s${16 * c + k} > 0 THEN ${1L << k} ELSE 0 END)")
      .mkString(" + ") + s" AS v$c"
  private val simhashAssembleSql: String =
    "CAST(v0 AS BIGINT) + CAST(v1 AS BIGINT) * 65536 + " +
      "CAST(v2 AS BIGINT) * 4294967296 + " +
      "(CAST(v3 AS BIGINT) - (CASE WHEN v3 >= 32768 THEN 65536 ELSE 0 END)) " +
      "* 281474976710656"
  private val simhashBandSqls: Seq[(String, String)] = Seq(
    "band0" -> "simhash & 65535",
    "band1" -> "(simhash >> 16) & 65535",
    "band2" -> "(simhash >> 32) & 65535",
    "band3" -> "(simhash >> 48) & 65535")

  /** q30: 64-bit SimHash per document + 16-bit hamming band keys — the
    * md5-derived ORACLE twin (fully DuckDB-mirrored; [[fastSimhash]] is
    * the xxhash64 production path, the q29/q49 pairing for simhash).
    * One explode (tokens only, not tokens×bits), 64 per-bit counters as
    * plain agg columns, one map-side-combining shuffle on doc_id.
    */
  def q30DedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id") +: (0 until 4).map(c =>
        expr(s"CAST(conv(substring(md5(w), ${1 + 4 * c}, 4), 16, 10) AS BIGINT)")
          .as(s"c$c")): _*)
    val sums = (0 until 64).map(b => expr(simhashBitSumSql(b)))
    tok.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id") +: (0 until 4).map(c => expr(simhashChunkValSql(c))): _*)
      .select(col("doc_id"), expr(simhashAssembleSql).as("simhash"))
      .select(col("doc_id") +: col("simhash") +:
        simhashBandSqls.map { case (n, f) => expr(f).as(n) }: _*)
  }

  /** PRODUCTION simhash over ANY documents frame (`doc_id`, `text`):
    * xxhash64 bit source — engine-native, one hash per token instead of
    * the oracle twin's md5 + four hex parses, the variant a 100 TB
    * pipeline runs (q49's relationship to q29, here for simhash). Same
    * output contract as [[q30DedupSimhash]]: one row per doc,
    * `band_b == (simhash >> 16b) & 65535`. No SQL mirror (xxhash64);
    * DedupSimilaritySpec pins band decomposition, determinism, and
    * md5-twin plan-shape equivalence instead.
    */
  def fastSimhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1L).otherwise(-1L)).as(s"s$b"))
    val assembled = (0 until 64).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
      .select(col("doc_id") +: col("simhash") +:
        simhashBandSqls.map { case (n, f) => expr(f).as(n) }: _*)
  }

  /** q69: SimHash near-dup PAIRS — the step q30 stopped short of: the four
    * 16-bit hamming bands become (band_id, sig) buckets with their OWN
    * inline pair expansion (not [[expandPairs]] — see below), and
    * candidates are confirmed by true hamming distance
    * (`bit_count(ha XOR hb)`).
    *
    * For `maxHamming` ≤ 3 the result is EXACT, not approximate: 3
    * differing bits can touch at most 3 of the 4 bands, so every such pair
    * shares a band (pigeonhole) — DedupSimilaritySpec asserts equality
    * with brute-force all-pairs hamming at sf0.001. Because the guarantee
    * is exactness, this path deliberately has NO hot-bucket cap (the
    * guard would silently drop true hamming ≤ 3 pairs from an over-cap
    * band bucket) — which is also why it no longer routes through
    * [[expandPairs]]: the inline expansion carries both simhashes so the
    * hamming confirm runs before the pair-dedup exchange. A band bucket
    * here is a set of documents sharing 16 simhash bits, so an
    * adversarially huge bucket means that many near-identical docs and
    * the n² expansion is the honest price of the exact answer — callers
    * that prefer the bounded-work approximation can pre-collapse exact
    * dupes (q28) first. DuckDB-oracled since the md5 simhash twin: the
    * oracle CTE replicates the band join + xor/bit_count confirm.
    */
  def q69DedupSimhashPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    hammingPairs(q30DedupSimhash(s, dir).select(col("doc_id"), col("simhash")), maxHamming)

  /** The EXACT hamming-band pair pipeline over ANY (doc_id, <64-bit
    * hash>) frame — q69's machinery, reusable for every 64-bit
    * perceptual/similarity hash (text simhash there, image pHash in
    * [[Multimodal]]'s q197). Pigeonhole: maxHamming ≤ 3 differing bits
    * touch at most 3 of the 4 16-bit bands, so every such pair shares a
    * band — the result is exact, hence NO hot-bucket cap by default (see
    * q69 doc). The degenerate edge is a (near-)constant-hash corpus
    * (e.g. millions of empty documents): one band bucket then collects
    * into a single `collect_list` row and the n² expansion is an
    * executor OOM. Setting `graft.dedup.maxExactBucketSize` turns that
    * into a LOUD failure — any band bucket over the cap throws with the
    * pre-collapse advice instead of silently dropping pairs (dropping
    * would break the exactness contract) or dying mid-task; the check
    * runs on a count-only pre-aggregation BEFORE any bucket array
    * materializes, so it stays loud at exactly the scale that motivates
    * it. Default: unset = unchanged unbounded-exact behavior.
    */
  private[graft] def hammingPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    // the pigeonhole guarantee is the whole contract: 4 bands are exact
    // ONLY up to hamming 3 — a larger cap would silently miss pairs that
    // share no band (review finding: loud, never approximate-by-accident)
    require(maxHamming >= 0 && maxHamming <= 3,
      s"hammingPairs is exact only for maxHamming in [0, 3] (4 x 16-bit bands), " +
        s"got $maxHamming — re-band before raising the cap")
    val sh = hashes.toDF("doc_id", "simhash")
      .select(col("doc_id") +: col("simhash") +:
        simhashBandSqls.map { case (n, f) => expr(f).as(n) }: _*)
      .localCheckpoint() // tiny: one row/doc
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band_id"), col(s"band$b").as("sig")))
    // carry the simhash THROUGH the band explode: each expanded pair
    // already holds both hashes, so the hamming confirm runs inside the
    // expansion's codegen and only confirmed pairs reach the dedup
    // exchange — the former shape joined the full candidate expansion
    // back against sh twice and shuffled EVERY bucket pair before the
    // filter (same-session isolated A/B at sf0.1: 1.55 → 1.21 s; the
    // structural win is what matters at 100 TB — the pair exchange
    // shrinks from O(Σ bucket²) to O(confirmed near-dup pairs))
    val banded = sh
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("simhash"),
        col("band.band_id").as("band_id"), col("band.sig").as("sig"))
    // loud mega-bucket ceiling (opt-in): the guard must fire BEFORE any
    // bucket array materializes — collect_list on a corpus-scale
    // constant-hash bucket is itself the OOM (review finding) — so with
    // the cap set the plan grows a count-only pre-aggregation (longs,
    // map-side combined, un-OOM-able) whose filter raises on an over-cap
    // bucket, and the collect_list consumes only the semi-joined
    // under-cap buckets. A filter, not a dropped column, so the
    // optimizer can never prune the check away. Cap unset (default):
    // the original single-aggregation shape, byte-identical behavior.
    val cap = hashes.sparkSession.conf.getOption("graft.dedup.maxExactBucketSize")
      .map(_.toInt)
    val bucketed = cap match {
      case None =>
        banded
          .groupBy(col("band_id"), col("sig"))
          .agg(array_sort(collect_list(struct(col("doc_id"), col("simhash")))).as("ids"))
          .filter(size(col("ids")) > 1)
      case Some(c) =>
        require(c >= 2, s"graft.dedup.maxExactBucketSize must be >= 2, got $c")
        val admissible = banded
          .groupBy(col("band_id"), col("sig"))
          .agg(count(lit(1)).as("n")) // one doc appears once per bucket
          .filter(
            when(col("n") <= c, lit(true)).otherwise(raise_error(concat(
              lit("hammingPairs: a hamming band bucket holds "),
              col("n").cast("string"),
              lit(s" docs, over graft.dedup.maxExactBucketSize=$c — a " +
                "(near-)constant-hash corpus makes the exact n² expansion an " +
                "executor OOM; pre-collapse exact duplicates (q28) before " +
                "near-dup pairing, or unset the cap to accept the cost")))))
          .filter(col("n") > 1)
          .select(col("band_id"), col("sig"))
        banded
          .join(admissible, Seq("band_id", "sig"), "left_semi")
          .groupBy(col("band_id"), col("sig"))
          .agg(array_sort(collect_list(struct(col("doc_id"), col("simhash")))).as("ids"))
    }
    bucketed
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
           transform(slice(ids, i + 2, size(ids)), y ->
             struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
                    x.simhash AS ha, y.simhash AS hb))))""")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        bit_count(col("p.ha").bitwiseXOR(col("p.hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** q31: exact n-gram Jaccard, evaluated only on LSH candidate pairs.
    *
    * Scale shape: ONE full-corpus shingle scan (inside the LSH candidate
    * pipeline, persisted at its tiny output), then every exact-Jaccard
    * input is pruned to candidate docs BEFORE re-shingling — the
    * split/explode/distinct for the sa/sb/sizes legs runs over only the
    * candidate subset (a left-semi broadcast prune on `documents`), and
    * that pruned shingle table is persisted so its three uses cost one
    * computation. The round-1 plan re-ran the full shingle subtree 4×
    * (Spark shares no common subtrees across join inputs) — 22 s at sf0.1
    * and 4 corpus scans at 100 TB.
    */
  def q31NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (inside pairIntersections): materializes the tiny
    // candidate/shingle-array frames so their consumers cost one
    // computation, AND the blocks are context-cleaned when the RDDs are
    // GC'd — no cache leak into library callers (persist() needed an
    // unpersist nobody could call on a returned lazy frame)
    val (cand, maybeBroadcast, candDocs) = candidateTexts(s, dir)
    pairIntersections(cand, candDocs)
      .select(col("doc_a"), col("doc_b"),
        round(col("n_inter").cast("double") /
              (col("c_a") + col("c_b") - col("n_inter")), 4).as("jaccard"))
  }

  /** q199: shingle CONTAINMENT per candidate pair — the ASYMMETRIC
    * near-dup signal Jaccard (q31) blurs: containment_a_bp =
    * 10000·|A∩B|/|A| says how much of doc A lives inside doc B, so a
    * short document quoted whole inside a long one scores ~10000 on its
    * side while the pair's Jaccard stays small (short/long ratio). The
    * `relation` verdict tags each pair: `a_in_b` / `b_in_a` (one side's
    * containment ≥ 9000 bp), `mutual` (both — the classic near-dup), or
    * `overlap`. A dedup policy KEEPS the superset doc and drops the
    * quoted copy — information q31 alone cannot give it. Same scale
    * scaffold as q31: LSH-candidate-pruned shingle sets, one shuffle
    * family, integer bp (DIV — engine-portable).
    */
  def q199Containment(s: SparkSession, dir: String): DataFrame = {
    val (cand, maybeBroadcast, candDocs) = candidateTexts(s, dir)
    pairIntersections(cand, candDocs)
      .select(col("doc_a"), col("doc_b"),
        expr("n_inter * 10000 DIV c_a").as("containment_a_bp"),
        expr("n_inter * 10000 DIV c_b").as("containment_b_bp"))
      .withColumn("relation",
        when(col("containment_a_bp") >= 9000 && col("containment_b_bp") >= 9000, "mutual")
          .when(col("containment_a_bp") >= 9000, "a_in_b")
          .when(col("containment_b_bp") >= 9000, "b_in_a")
          .otherwise("overlap"))
  }

  /** q249: cross-source MIRROR matrix — near-dup pairs confirmed at
    * Jaccard ≥ 0.8 (q210's top rung, integer bp) folded to the
    * (source_a, source_b) axis a curator acts on: which feeds MIRROR
    * each other. A heavy off-diagonal cell is two crawls of the same
    * host (drop one feed, not per-doc dedup); a heavy diagonal cell is
    * intra-feed templating (q204's territory). Sources are normalized
    * least/greatest so each unordered pair rows once; share_bp says how
    * much of the corpus's confirmed near-dup mass sits in this cell.
    *
    * Exactness: the confirm is q31's exact shingle intersection folded
    * to integer bp with DIV (threshold compares are integer, so no
    * rounding can flip a pair across engines); counts and shares are
    * pure integers.
    *
    * Scale shape: q31's candidate-pruned scaffold (ONE corpus shingle
    * pass inside the LSH pipeline, exact legs over only candidate docs);
    * the source lookup joins confirmed pairs (tiny) against the
    * (doc_id, source) projection — column-pruned scan, AQE broadcasts
    * the pair side; the fold lands on the ≤ |sources|² frame.
    */
  def q249CrossSourceMirror(s: SparkSession, dir: String): DataFrame = {
    val (cand, maybeBroadcast, candDocs) = candidateTexts(s, dir)
    val confirmed = pairIntersections(cand, candDocs)
      .filter(expr("n_inter * 10000 DIV (c_a + c_b - n_inter)") >= 8000)
      .select(col("doc_a"), col("doc_b"))
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val cells = confirmed
      .join(src.as("da"), col("doc_a") === col("da.doc_id"))
      .join(src.as("db"), col("doc_b") === col("db.doc_id"))
      .select(least(col("da.source"), col("db.source")).as("source_a"),
        greatest(col("da.source"), col("db.source")).as("source_b"))
      .localCheckpoint() // two consumers: the cell fold + the total
    cells.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(cells.agg(count(lit(1)).as("n_total"))))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") === col("source_b")).as("within_source"),
        expr("(n_pairs * 10000) DIV n_total").as("share_bp"))
  }

  /** q250: canonical-selection SOURCE BIAS — does q169's keep-min-doc_id
    * canonicalization systematically favor a feed? doc_id correlates
    * with ingest order, so min-id keeps the EARLIEST crawl of every
    * near-dup family — this table makes that visible per source: cluster
    * members, canonicals kept, keep rate, and the member-share vs
    * canonical-share comparison (a source whose canonical_share_bp
    * exceeds its member_share_bp is favored; at parity the selection is
    * source-neutral). The table a curator reads before deciding whether
    * canonical choice needs a quality key (q216's verdicts) instead of
    * recency.
    *
    * Exactness: pure integer counts off the SHARED memoized
    * [[clusterMap]] (q56/q169/q179's CC build — zero drift possible);
    * all-positive DIVs (every listed doc belongs to a ≥2-doc component
    * by construction, so n_members ≥ 1 and the totals are positive
    * whenever rows exist).
    *
    * Scale shape: the cluster map joins the (doc_id, source) projection
    * (column-pruned scan); everything after folds on the |sources| frame
    * plus one broadcast 1-row total.
    */
  def q250CanonicalSourceBias(s: SparkSession, dir: String): DataFrame = {
    val m = clusterMap(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("source"),
        when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L).as("is_canon"))
      .localCheckpoint() // two consumers: the per-source fold + the totals
    m.groupBy(col("source"))
      .agg(count(lit(1)).as("n_members"), sum(col("is_canon")).as("n_canonical"))
      .crossJoin(broadcast(m.agg(count(lit(1)).as("mt"), sum(col("is_canon")).as("ct"))))
      .select(col("source"), col("n_members"), col("n_canonical"),
        expr("(n_canonical * 10000) DIV n_members").as("keep_bp"),
        expr("(n_members * 10000) DIV mt").as("member_share_bp"),
        expr("(n_canonical * 10000) DIV greatest(ct, 1)").as("canonical_share_bp"))
  }

  /** q261's swept banding schemes (bands × rows-per-band over the H=16
    * signature) — code-owned; the oracle inlines the same list. The
    * detection curve P(candidate | jaccard s) = 1 − (1 − s^r)^b moves
    * its S-knee with r: (16,1) fires on anything (high recall, n²-ish
    * candidates), (2,8) only on near-identity. */
  private[graft] val BandSchemes = Seq((16, 1), (8, 2), (4, 4), (2, 8))

  /** q261: LSH BANDING-SCHEME sweep — the (b × r) design-knob table read
    * next to q210 (exact thresholds), q240 (estimator honesty) and q255
    * (bucket occupancy): for each scheme over the SAME H=16 signature,
    * the candidate-pair count, docs touched, and the mean/min exact
    * Jaccard of the candidates it admits. Moving from (16,1) to (2,8)
    * walks the recall/precision curve; the row whose min_jaccard_bp sits
    * just under the dedup threshold (q210's knee) is the scheme that
    * admits the fewest false candidates while still catching the
    * near-dups — the choice every MinHash deployment must make and the
    * one this table prices on THIS corpus.
    *
    * Exactness: candidates from signature-position equality (the exact
    * q29 oracle machinery re-banded); the exact-Jaccard side is q31's
    * candidate-pruned shingle intersection folded to integer bp; the
    * fold lands on ≤ 4 rows.
    *
    * Scale shape: ONE corpus minhash pass (the checkpointed mhSignatures
    * frame feeds all four bandings — the q240 factoring argument); per
    * scheme one guarded pair expansion; the exact confirm reuses ONE
    * shingle table built over the UNION of all schemes' candidate docs
    * (the widest scheme dominates), so text is shingled once.
    */
  def q261LshBandSweep(s: SparkSession, dir: String): DataFrame = {
    val mh = mhSignatures(s, dir).localCheckpoint()
    // all four bandings tagged with a scheme id and expanded through ONE
    // guarded exchange (expandPairsBy) — the per-scheme form paid four
    // full groupBy-expand chains plus four checkpoint barriers
    val tagged = BandSchemes.zipWithIndex.map { case ((b, r), si) =>
      val cols = (0 until b).map { i =>
        struct(lit(i).as("band_id"),
          concat_ws(":", (0 until r).map(j => col(s"m${i * r + j}")): _*)
            .as("sig"))
      }
      mh.select(col("doc_id"), lit(si).as("scheme"),
          explode(array(cols: _*)).as("band"))
        .select(col("doc_id"), col("scheme"),
          col("band.band_id").as("band_id"), col("band.sig").as("sig"))
    }.reduce(_ unionByName _)
    val pairs = expandPairsBy(s, tagged, Seq("scheme"))
      .select(col("scheme"), col("doc_a"), col("doc_b")).localCheckpoint()
    // Jaccard is PAIR-intrinsic — scheme-independent — so the expensive
    // shingle-intersection confirm runs ONCE over the UNION of every
    // scheme's candidate pairs (schemes overlap heavily: an aggressive
    // banding's pairs largely contain a conservative one's), and each
    // scheme's row then reads its pairs' j_bp from the shared table. The
    // per-scheme form re-ran the 3-join confirm 4× (measured 7.1–9.0 s at
    // sf0.1; this shape prices the confirm at |union| once).
    // NOT spread: an explicit repartition(defaultParallelism, doc_a) here
    // cut the confirm's 2.0 s single-task stage to 1.4 s of wall — but by
    // flipping the downstream join layout into a shape that burned 40 s of
    // CPU across 32 tasks (StageCensus, r19 opt round) and measured NET
    // SLOWER on the full bench (4.76 s vs 4.23 s). AQE's 1-task coalesce
    // of this byte-tiny frame is the cheaper plan at bench scale; at
    // 100 TB the pair table's real bytes give the confirm its parallelism
    // without any hint.
    val allPairs = pairs.select(col("doc_a"), col("doc_b")).distinct()
    val allDocs = allPairs.select(col("doc_a").as("doc_id"))
      .unionByName(allPairs.select(col("doc_b").as("doc_id"))).distinct()
    val candDocs = Tables.documents(s, dir)
      .join(broadcast(allDocs), Seq("doc_id"), "left_semi")
    // NOT checkpointed: the scored frame has exactly ONE consumer (the
    // left join below), so a checkpoint here is a pure job barrier —
    // removing it fuses the confirm into the fold's plan (one job fewer;
    // the upstream pairs/arr checkpoints still bound every re-execution).
    val jacAll = pairIntersections(allPairs, candDocs)
      .select(col("doc_a"), col("doc_b"),
        expr("n_inter * 10000 DIV (c_a + c_b - n_inter)").as("j_bp"))
    // a candidate pair with ZERO shared shingles (pure hash collision)
    // drops from the inner intersection — count it via the left join.
    // ONE grouped fold over the tagged pair table replaces the former four
    // per-scheme filter+aggregate subplans (4 separate global aggregates +
    // a 4-way union — each its own exchange and codegen unit). Per-scheme
    // values are identical: grouping by the scheme tag partitions the pair
    // table exactly as the four filters did, and a scheme whose banding
    // admitted ZERO pairs (empty group — grouped aggregates drop it) is
    // re-attached from the literal scheme frame with the same values the
    // former empty global aggregate produced (0 / NULL / NULL / 0).
    import s.implicits._
    val schemeDf = BandSchemes.zipWithIndex
      .map { case ((b, r), si) => (si, b.toLong, r.toLong) }
      .toDF("scheme", "bands", "rows_per_band")
    val folded = pairs.join(jacAll, Seq("doc_a", "doc_b"), "left")
      .groupBy(col("scheme"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("""CAST(round(CAST(sum(j_bp) AS DOUBLE) /
                CAST(count(j_bp) AS DOUBLE)) AS BIGINT)""")
          .as("mean_jaccard_bp"),
        min(col("j_bp")).as("min_jaccard_bp"),
        coalesce(sum(when(col("j_bp").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_zero_overlap"))
    schemeDf.join(broadcast(folded), Seq("scheme"), "left")
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("mean_jaccard_bp"), col("min_jaccard_bp"),
        coalesce(col("n_zero_overlap"), lit(0L)).as("n_zero_overlap"))
  }

  /** q255: LSH BUCKET-OCCUPANCY audit — the operational table read before
    * sizing `graft.dedup.maxBucketSize` (and the census that explains a
    * slow banding pass): per band, bucket count, multi-doc buckets, the
    * largest and p95 bucket, the PAIR-EXPANSION cost Σ b·(b−1)/2 the band
    * would generate (the quantity the hot-bucket guard bounds), and how
    * many docs sit in over-cap buckets (what the guard would DROP at the
    * default 4096 — nonzero here means q29-family recall is being traded
    * for the n² bound, the loud version of the cap's contract).
    *
    * Exactness: integer counts and one interpolated percentile over
    * integer bucket sizes (the q73 parity rule); audits the UNCAPPED
    * bucket table (bands0 on the oracle side) — the guard's input, not
    * its output.
    *
    * Scale shape: the banding pass's own (band, sig) partial-agg fold —
    * counts only, no collect_list, un-OOM-able — then a |bands|-row
    * fold; the corpus is scanned once (the same minhash pass every LSH
    * query rides).
    */
  def q255LshBucketOccupancy(s: SparkSession, dir: String): DataFrame =
    bandSignatures(s, dir)
      .groupBy(col("band_id"), col("sig"))
      .agg(count(lit(1)).as("bs"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("bs") > 1, 1L).otherwise(0L)).as("n_multi_buckets"),
        max(col("bs")).as("max_bucket"),
        round(expr("percentile(bs, 0.95D)"), 4).as("p95_bucket"),
        sum(when(col("bs") > 1, expr("bs * (bs - 1) DIV 2")).otherwise(lit(0L)))
          .as("n_pairs_expanded"),
        sum(when(col("bs") > 4096, col("bs")).otherwise(lit(0L)))
          .as("docs_in_overcap"))

  /** q240: MinHash CALIBRATION curve — the estimator-vs-truth table read
    * before trusting any signature-level similarity threshold: per
    * signature agreement level (est_matches of the H=16 minhash positions
    * equal, est_bp = the estimator's Jaccard claim), the candidate-pair
    * count and the mean/min/max EXACT shingle Jaccard. q210 prices exact
    * thresholds; this says how honestly the 16-position estimator TRACKS
    * exact Jaccard at this corpus's shingle geometry — if mean_jaccard_bp
    * hugs est_bp the signature can gate cheap pre-filters; a wide min–max
    * spread at mid est levels says 16 hashes are too few to threshold on
    * and the exact confirm (q31's pass) stays mandatory.
    *
    * Exactness: signature equality and the shared-shingle counts are
    * exact integers (the SAME Carter–Wegman construction on both engines
    * — q29's oracle machinery); jac_bp an all-positive DIV; the mean ONE
    * round(double/double). Coverage note: calibration runs over LSH
    * candidate pairs with ≥ 1 shared shingle (a colliding-fp pair with
    * zero shared shingles drops from the inner intersection identically
    * on both engines).
    *
    * Scale shape: ONE corpus minhash pass (the signature frame is
    * checkpointed and feeds BOTH the banding and the per-pair agreement —
    * bandSignatures/mhSignatures were factored for exactly this), q31's
    * candidate-pruned shingle scaffold for the exact side, and the
    * signature frame semi-pruned to candidate docs before its pair joins;
    * the fold lands on the ≤ H+1-row agreement domain.
    */
  def q240MinhashCalibration(s: SparkSession, dir: String): DataFrame = {
    val mh = mhSignatures(s, dir).localCheckpoint()
    val (cand, maybeBroadcast, candDocs) =
      candidateTextsOf(s, dir, expandPairs(s, bandsOf(mh)))
    val mhc = mh.join(maybeBroadcast(candidateIdsOf(cand)), Seq("doc_id"), "left_semi")
      .localCheckpoint() // two consumers: both pair sides
    val est = (0 until NumHashes)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    pairIntersections(cand, candDocs)
      .withColumn("jac_bp", expr("n_inter * 10000 DIV (c_a + c_b - n_inter)"))
      .join(mhc.as("a"), col("doc_a") === col("a.doc_id"))
      .join(mhc.as("b"), col("doc_b") === col("b.doc_id"))
      .withColumn("est_matches", expr(s"CAST($est AS BIGINT)"))
      .groupBy(col("est_matches"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("""CAST(round(CAST(sum(jac_bp) AS DOUBLE) /
                CAST(count(*) AS DOUBLE)) AS BIGINT)""").as("mean_jaccard_bp"),
        min(col("jac_bp")).as("min_jaccard_bp"),
        max(col("jac_bp")).as("max_jaccard_bp"))
      .withColumn("est_bp", expr(s"est_matches * 10000 DIV $NumHashes"))
  }

  /** q210: dedup THRESHOLD-SENSITIVITY curve — for each candidate
    * Jaccard threshold (50%..90% in 10-point steps), how many near-dup
    * pairs fire and how many documents they touch. This is the knob
    * table a curation run reads BEFORE committing a threshold: the
    * "knee" where n_docs stops moving separates boilerplate twins
    * (high-J plateau) from topical overlap (low-J slope), and the
    * pair/doc ratio at each step says whether lowering the threshold
    * recruits new documents or just densifies existing clusters.
    * Jaccard is integer bp (n_inter·10000 DIV union — engine-portable),
    * so threshold membership can never flip on a float ulp.
    *
    * Scale shape: the q31/q199 candidate scaffold unchanged (LSH
    * candidates, semi-join-pruned shingles, one shuffle family); the
    * scored pair table is checkpointed at its tiny size, the 5-way
    * threshold sweep explodes PAIRS (candidate-scale × 5, never corpus),
    * and the answer folds to ≤ 5 rows in one exchange.
    */
  def q210ThresholdCurve(s: SparkSession, dir: String): DataFrame = {
    val (cand, maybeBroadcast, candDocs) = candidateTexts(s, dir)
    pairIntersections(cand, candDocs)
      .select(col("doc_a"), col("doc_b"),
        expr("n_inter * 10000 DIV (c_a + c_b - n_inter)").as("j_bp"))
      .select(col("doc_a"), col("doc_b"), col("j_bp"),
        explode(lit(Array(5000L, 6000L, 7000L, 8000L, 9000L))).as("threshold_bp"))
      .filter(col("j_bp") >= col("threshold_bp"))
      .select(col("threshold_bp"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy(col("threshold_bp"))
      .agg(expr("count(1) DIV 2").as("n_pairs"), countDistinct(col("d")).as("n_docs"))
  }

  /** LSH candidate pairs + the candidate-PRUNED document texts they
    * reference — the scale shape shared by q31 and q70: candidate ids
    * semi-join-prune the corpus before any expensive per-pair work, so
    * the text column is never shuffled corpus-wide, and every
    * candidate-sized broadcast is gated on
    * `graft.dedup.candBroadcastMaxRows` (the pair checkpoint makes the
    * gate's count free; above the gate a dup-saturated corpus falls back
    * to shuffle joins of candidate-sized frames, not a driver OOM).
    * Returns (pairs, maybeBroadcast, prunedDocs).
    */
  private def candidateTexts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame => DataFrame, DataFrame) =
    candidateTextsOf(s, dir, candidatePairs(s, dir))

  /** The candidate-pruning scaffold for ANY pair source: checkpoint the
    * pairs, gate candidate-sized broadcasts, semi-join-prune the corpus. */
  private def candidateTextsOf(s: SparkSession, dir: String, pairs: DataFrame)
      : (DataFrame, DataFrame => DataFrame, DataFrame) = {
    val cand = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val candSmall = cand.count() <=
      s.conf.getOption("graft.dedup.candBroadcastMaxRows").map(_.toLong).getOrElse(1000000L)
    val maybeBroadcast = (df: DataFrame) => if (candSmall) broadcast(df) else df
    val candDocs = Tables.documents(s, dir)
      .join(maybeBroadcast(candidateIdsOf(cand)), Seq("doc_id"), "left_semi")
    (cand, maybeBroadcast, candDocs)
  }

  /** The distinct doc ids touched by a (doc_a, doc_b) pair frame — ONE
    * definition for every candidate semi-prune (the corpus prune above,
    * q240's signature prune). */
  private def candidateIdsOf(cand: DataFrame): DataFrame =
    cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()

  /** q70: edit-distance confirmation of the LSH candidate pairs — the
    * character-level verifier a fuzzy-dedup pipeline runs after banding
    * (shingle Jaccard catches word-level similarity, Levenshtein catches
    * character-level edits like OCR noise). `levenshtein` is O(|a|·|b|)
    * per pair, which is exactly why it only ever runs on the
    * LSH-candidate set ([[candidateTexts]]), never all pairs; the
    * normalized distance is integer basis points of the longer text (the
    * engine-portable ratio form — see q65's rounding note).
    *
    * The distance runs over the ASCII FOLD of each text (every non-ASCII
    * code point collapses to '?', identically in Java and RE2 regex):
    * Spark's levenshtein counts CHARACTERS while DuckDB's counts BYTES,
    * so the cross-engine form must be single-byte text — the fold makes
    * char ≡ byte while preserving the edit structure of ASCII content.
    * (Multibyte-heavy pairs compare their folds; a corpus needing true
    * CJK edit distances would drop the fold and lose the SQL oracle.)
    */
  def q70EditDistance(s: SparkSession, dir: String): DataFrame = {
    val (cand, maybeBroadcast, candDocs) = candidateTexts(s, dir)
    editDistanceConfirm(cand, maybeBroadcast, candDocs)
  }

  /** q102: q70's PRODUCTION form — identical Levenshtein confirmation fed
    * by the xxhash64 candidate pipeline ([[fastCandidatePairs]]) instead
    * of the md5 oracle path. Rows-only (engine-native hashes have no
    * DuckDB mirror); the spec pins its pair set to q49's and its
    * distances to a direct recompute, and the bench turns SURVEY §8's
    * "the production caller would pay ~0.8 s, not q70's ~4 s" claim into
    * a driver-measured number.
    */
  def q102EditDistanceFast(s: SparkSession, dir: String): DataFrame = {
    val (cand, maybeBroadcast, candDocs) =
      candidateTextsOf(s, dir, fastCandidatePairs(Tables.documents(s, dir)))
    editDistanceConfirm(cand, maybeBroadcast, candDocs)
  }

  /** Shared confirmation stage: ASCII-fold the candidate texts, join both
    * pair sides, score Levenshtein + normalized basis points. */
  private def editDistanceConfirm(
      cand: DataFrame, maybeBroadcast: DataFrame => DataFrame,
      candDocs0: DataFrame): DataFrame = {
    val s = cand.sparkSession
    val candDocs = candDocs0.select(col("doc_id"),
        regexp_replace(col("text"), "[^\\x00-\\x7F]", "?").as("ftext"))
      .localCheckpoint() // candidate-sized: one row per doc in any pair
    // The pair frame is byte-tiny, so with both text sides broadcast AQE
    // coalesces the whole DP stage to ONE task (censused: q70's 0.58 s
    // confirm serial on one core) — the per-PAIR O(min·d) edit-distance
    // cost is invisible to byte-based sizing. Same remedy as the shingle
    // confirm (pairIntersections): spread the pairs over a deterministic
    // derived key when the doc frame is broadcast-small; above the gate
    // the doc_id shuffle joins set the width from real bytes.
    val docsSmall = candDocs.count() <= s.conf
      .getOption("graft.dedup.shingleArrayBroadcastMaxDocs")
      .map(_.toLong).getOrElse(100000L)
    val spread = if (docsSmall)
      cand.repartition(s.sparkContext.defaultParallelism,
        xxhash64(col("doc_a"), col("doc_b")))
    else cand
    spread
      .join(maybeBroadcast(candDocs.select(col("doc_id").as("doc_a"), col("ftext").as("fa"))),
        Seq("doc_a"))
      .join(maybeBroadcast(candDocs.select(col("doc_id").as("doc_b"), col("ftext").as("fb"))),
        Seq("doc_b"))
      // native banded-exact kernel (EditDistance.scala): bit-identical to
      // functions.levenshtein, O(min·d) instead of O(m·n) on the
      // near-duplicate pairs this stage exists to confirm
      .withColumn("edit_distance",
        graft.functions.EditDistance.editDistance(col("fa"), col("fb")))
      .select(col("doc_a"), col("doc_b"), col("edit_distance"),
        expr("edit_distance * 10000 DIV greatest(greatest(length(fa), length(fb)), 1)")
          .as("norm_bp"))
  }

  /** Connected components over an undirected pair graph via iterative
    * min-label propagation, entirely join-based (no driver-side union-find:
    * the only driver state is the loop counter + convergence flag).
    *
    * Each iteration: every node takes the min label among itself and its
    * neighbors — one join + one groupBy over the LABEL frame, which is
    * candidate-graph-sized (pairs), orders of magnitude smaller than the
    * corpus. Converges in O(component diameter) iterations; near-dup
    * clusters are dense (diameter 2–3 in practice), and `maxIters` bounds
    * the worst case. Every iteration `localCheckpoint`s the label frame:
    * cuts the exploding iterative lineage AND materializes it so the
    * convergence count reuses the work; blocks are context-cleaned when the
    * RDD is GC'd, so nothing leaks into library callers.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // checkpoint BEFORE the self-union: union(pairs, pairs) would execute
    // the (expensive) pair-producing subtree twice in one action
    val p = pairs.localCheckpoint()
    val edges = p
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val next = labels.as("l")
        .join(nbrMin, col("l.doc_id") === nbrMin("src"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.label"), coalesce(col("nbr_label"), col("l.label"))).as("label"))
        .localCheckpoint()
      converged = next.as("n").join(labels.as("o"), "doc_id")
        .filter(col("n.label") =!= col("o.label")).isEmpty
      labels = next
      i += 1
    }
    // exiting via the iteration cap with unfinished propagation would
    // silently emit multiple survivors for one real cluster — fail loudly
    // instead; near-dup graphs with diameter > maxIters need a larger cap
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters iterations " +
          "(component diameter exceeds the cap); raise maxIters")
    labels
  }

  /** One cluster map per (session, dir) — the build-once seam for the
    * three cluster consumers (q56 survivors, q169 canonical selection,
    * q179 cluster-aware splits), each of which previously re-ran the
    * whole band → bucket → connected-components pipeline from raw text.
    * The memoized frame is the final localCheckpointed label frame, so
    * reuse costs a block read, not a recompute — the in-session analogue
    * of the PUBLISHED cluster table ([[writeClusterTableBucketed]]) a
    * 100 TB deployment would build once per corpus release and serve to
    * every downstream job. Keyed like the k-means/quality-model caches
    * (session identity + path, NOT content): see
    * [[invalidateClusterCache]] for the staleness contract.
    */
  private val clusterCache =
    new graft.DriverMemo[(Int, String), DataFrame]()

  /** Drop memoized cluster maps — required after the data under a
    * previously clustered directory changes (memo keys on path, not
    * content; same contract as [[Similarity.invalidateQuantizerCache]]). */
  def invalidateClusterCache(): Unit = clusterCache.clear()

  /** (doc_id, cluster_id) membership over the q29 candidate graph —
    * cluster_id is the component's min doc_id (the min-label CC fixpoint).
    * Docs in no candidate pair are not listed (singleton = own cluster).
    */
  private[graft] def clusterMap(s: SparkSession, dir: String): DataFrame =
    clusterCache.getOrElseUpdate((System.identityHashCode(s), dir)) {
      connectedComponents(
          candidatePairs(s, dir).select(col("doc_a"), col("doc_b")))
        .select(col("doc_id"), col("label").as("cluster_id"))
    }

  /** q56: near-dup cluster collapse — the step q29/q49 stop short of:
    * candidate pairs → connected components → keep-min-id survivor per
    * cluster. Output is one row per clustered doc with its cluster root and
    * whether it survives dedup (`doc_id == cluster_id`). Docs in no pair
    * are implicitly survivors and not listed. Oracled in DuckDB via a
    * recursive transitive-closure CTE over the same q29 pair graph.
    * Shares the memoized [[clusterMap]] with q169/q179.
    */
  def q56DedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterMap(s, dir)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_survivor"))

  /** q224: NEAR-dup token savings per source — the q222 dividend table
    * for the near-dup pass: every non-canonical cluster member (doc_id ≠
    * cluster_id in the SHARED q56 cluster map — same memoized CC build,
    * zero drift) contributes its whole token count to tokens_removed.
    * Read next to q222, the pair prices the two dedup rungs separately:
    * a source whose exact savings dwarf its near savings is a mirror
    * (cheap hash pass suffices); the reverse is boilerplate/templating
    * (the LSH pass earns its shuffle).
    *
    * Scale shape: one corpus scan projected to (doc_id, source, n_tok);
    * the cluster map joins on doc_id (its size is data-dependent — dup
    * fraction of the corpus — so no broadcast hint; AQE picks one when
    * it fits), then a |sources|-row fold. Text never shuffles.
    */
  def q224NearDupTokenSavings(s: SparkSession, dir: String): DataFrame = {
    val cl = clusterMap(s, dir)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.TokenCount(col("text")).as("n_tok"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("is_removed",
        when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
          lit(1L)).otherwise(lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("is_removed")).as("n_removed_docs"),
        sum(col("is_removed") * col("n_tok")).as("tokens_removed"))
      .withColumn("saved_bp",
        expr("(tokens_removed * 10000) DIV greatest(n_tokens, 1)"))
  }

  /** q225: dedup-KEY precision audit — how often q28's cheap 3-word
    * prefix key merges docs whose FULL text differs: every dedup rung
    * trades key cost against false merges, and this one-row table prices
    * that trade before anyone trusts the cheap key (a high
    * false_merge_bp says the prefix groups are really NEAR-dup families
    * — route them to q56's cluster collapse, don't min-keep them as
    * exact copies; on this synthetic corpus the audit fires hard, ~all
    * multi-doc prefix groups are text-heterogeneous, which is exactly
    * the story it exists to surface). Both digests ride one projection;
    * group homogeneity is min(full_hash) = max(full_hash) — the q203
    * idiom pointed at a second digest.
    *
    * Scale shape: one corpus scan projected to two 16-byte digests, one
    * map-side-combined exchange on the prefix key, then a 1-row fold.
    * Text never shuffles.
    */
  def q225DedupKeyPrecision(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(md5(concat_ws(" ", slice(split(col("text"), " "), 1, 3))).as("k"),
        md5(col("text")).as("ft"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("ft")).as("a"), max(col("ft")).as("b"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_multi_groups"),
        sum(when(col("a") =!= col("b"), 1L).otherwise(0L))
          .as("n_false_merge_groups"),
        sum(col("n")).as("docs_in_multi"),
        sum(when(col("a") =!= col("b"), col("n")).otherwise(lit(0L)))
          .as("docs_in_false"))
      .na.fill(0L,
        Seq("n_false_merge_groups", "docs_in_multi", "docs_in_false"))
      .withColumn("false_merge_bp",
        expr("(n_false_merge_groups * 10000) DIV greatest(n_multi_groups, 1)"))

  /** q286's swept canonical-key lengths — code-owned like q272's
    * GateSweep; the production q28 key (3 words) sits inside the bracket
    * and its row is byte-comparable to the oracled q225. */
  private[graft] val KeyWordsSweep: Seq[Int] = Seq(1, 2, 3, 5, 8)

  /** q286: canonical-KEY length sweep — the knob table behind q28's
    * first-k-words key: per k ∈ {1,2,3,5,8}, how many multi-doc key
    * groups exist, how many of them FALSE-MERGE distinct full texts
    * (q225's min≠max full-hash test — never a pairwise comparison), the
    * doc mass involved, and false_merge_bp. A 1-word key folds half the
    * corpus into false families; an 8-word key approaches full-text
    * hashing and stops folding boilerplate-prefixed copies — this curve
    * shows where THIS corpus's precision knee sits before anyone moves
    * the production literal. k = 3 is flagged and equals the q225 row by
    * construction.
    *
    * Scale shape: ONE text scan projects all five keys + the full hash
    * into a checkpointed hash-only frame; each k then costs one
    * map-side-combined key fold over 16-byte digests — never a second
    * text scan.
    */
  def q286PrefixKeySweep(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(
      KeyWordsSweep.map(k =>
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, k))).as(s"k$k")) :+
        md5(col("text")).as("ft"): _*)
      .localCheckpoint()
    KeyWordsSweep.map { k =>
      base.groupBy(col(s"k$k"))
        .agg(count(lit(1)).as("n"), min(col("ft")).as("a"), max(col("ft")).as("b"))
        .filter(col("n") > 1)
        .agg(count(lit(1)).as("n_multi_groups"),
          coalesce(sum(when(col("a") =!= col("b"), 1L)), lit(0L))
            .as("n_false_merge_groups"),
          coalesce(sum(col("n")), lit(0L)).as("docs_in_multi"),
          coalesce(sum(when(col("a") =!= col("b"), col("n"))), lit(0L))
            .as("docs_in_false"))
        .select(lit(k.toLong).as("key_words"), lit(k == 3).as("is_production"),
          col("n_multi_groups"), col("n_false_merge_groups"),
          col("docs_in_multi"), col("docs_in_false"),
          expr("(n_false_merge_groups * 10000) DIV greatest(n_multi_groups, 1)")
            .as("false_merge_bp"))
    }.reduce(_ unionByName _)
  }

  /** q289: DUP rate by LENGTH decile — "are short docs the duplication
    * problem": exact-dup membership (q28's canonical families via the
    * shared [[TextAnalysis.contentHashCol]]) crossed with q230's
    * value-domain length deciles (decile of a length = cum-count-before
    * ·10 DIV n — all docs of equal length share a decile, no per-doc rank
    * anywhere). Boilerplate-heavy short docs usually dominate exact-dup
    * mass; if THIS corpus inverts that, the dedup key (q286) and the
    * min-words gate (q272) are being tuned on the wrong intuition —
    * this table is where that shows.
    *
    * Scale shape: one text scan to (length, hash), one content-hash
    * exchange for the family size (q28's shuffle), then everything on
    * the |distinct lengths|-bounded value-domain frame.
    */
  def q289DupByLength(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flagged = Tables.documents(s, dir)
      .select(size(graft.functions.Tokens(col("text"))).cast("long").as("n_words"),
        TextAnalysis.contentHashCol.as("ch"))
      .withColumn("nc", count(lit(1)).over(Window.partitionBy(col("ch"))))
      .select(col("n_words"), (col("nc") > 1).as("is_dup"))
    val cells = flagged.groupBy(col("n_words"))
      .agg(count(lit(1)).as("vc"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dups"))
      .localCheckpoint() // decile derivation + final fold share one pass
    val perV = cells
      .withColumn("cum_before", coalesce(
        sum(col("vc")).over(Window.orderBy(col("n_words"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum(col("vc")).over(Window.partitionBy()))
      .select(col("n_words"), expr("cum_before * 10 DIV tot").as("decile"))
    cells.join(perV, Seq("n_words"))
      .groupBy(col("decile"))
      .agg(sum(col("vc")).as("n_docs"), sum(col("dups")).as("n_dup_docs"))
      .withColumn("dup_bp", expr("n_dup_docs * 10000 DIV n_docs"))
  }

  /** q32: embedding-cosine near-dup pairs, blocked by label (the cluster
    * prior); at 100 TB the label blocking becomes coarse-quantizer cells.
    */
  def q32DedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= 0.35)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** q54: the 100 TB-shaped embedding near-dup — pairs blocked by LEARNED
    * IVF cells (the q48 k-means quantizer) instead of q32's within-label
    * all-pairs. Each vector lands in its top-`probes` cells (default 4; multi-probe, so
    * boundary-straddling near-dups are still co-bucketed), pair expansion
    * happens within cells only, and duplicate pairs from shared probes
    * collapse. Candidate work is Σ n_cell² over balanced learned cells —
    * O(n²·probes²/k) with a cell count that scales with the corpus,
    * instead of O(n²/|labels|) over fixed labels. NOTE on the testdata:
    * the synthetic embeddings are UNclustered (same-label mean cosine
    * ≈ 0), so pair co-location costs ~half of all-pairs here by
    * information-theoretic necessity; on a real near-dup corpus the same
    * operator's work collapses with cluster tightness. Rows-only (the
    * learned quantizer is not SQL-expressible); DedupSimilaritySpec bounds
    * the candidate-pair count and asserts recovery of q32's pairs.
    */
  def q54DedupEmbeddingCells(s: SparkSession, dir: String,
                             k: Int = 32, probes: Int = 4): DataFrame = {
    val centers = Similarity.kmeansCentroids(s, dir, k = k, iters = 3)
    val assigned = Tables.embeddings(s, dir)
      .withColumn("probes",
        slice(Similarity.sortedScoredCells(col("embedding"), centers), 1, probes))
      .withColumn("cell", explode(expr("transform(probes, s -> -s.negcell)")))
      .select(col("cell"), col("vec_id"), col("embedding"))
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= 0.35)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 4).as("cos_sim"))
      .dropDuplicates("vec_a", "vec_b")
  }

  // ---- oracle SQL ----

  private val shingleCte =
    """t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) i FROM t),
       sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM ix)"""

  private val minhashCtes: String = {
    val mins = cwParams.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * fp + $b) % $MersenneP) m$i" }.mkString(", ")
    val bands = (0 until NumBands)
      .map(b => s"SELECT doc_id, $b AS band_id, " +
        s"m${2 * b}::VARCHAR || ':' || m${2 * b + 1}::VARCHAR AS sig FROM mh")
      .mkString(" UNION ALL ")
    // every Spark-side candidate path funnels through [[expandPairs]]'s
    // hot-bucket guard (buckets > graft.dedup.maxBucketSize=4096 dropped,
    // not expanded); the oracle must drop the SAME buckets or a corpus
    // with a hot bucket would make the engines disagree — so the cap is
    // inlined HERE, once, and every oracle that joins `bands` against
    // itself (q29/q31/q199/q240/q210 and the q56/q169/q179 reach CTEs)
    // inherits it. No bucket reaches the cap at tested SFs (output
    // byte-identical); the symmetry is for the corpus that does.
    s"""$shingleCte,
        shfp AS (SELECT doc_id, ('0x' || substring(md5(sh), 1, 7))::BIGINT AS fp FROM sh),
        mh AS (SELECT doc_id, $mins FROM shfp GROUP BY doc_id),
        bands0 AS ($bands),
        bands AS (SELECT b.* FROM bands0 b
                  JOIN (SELECT band_id, sig FROM bands0 GROUP BY 1, 2
                        HAVING count(*) <= 4096) ok USING (band_id, sig))"""
  }

  /** The recursive transitive-closure cluster CTEs shared by the
    * q56/q169/q179 oracles: LSH candidate pairs → bidirectional edges →
    * reachability fixpoint (per-doc min-reachable label = the connected
    * component). */
  private[graft] val reachCtes: String =
    s"""$minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                    UNION SELECT doc_b AS src, doc_a AS dst FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)"""

  /** The DuckDB twin of [[q30DedupSimhash]]: same tokenization
    * (string_split keeps empty tokens, like Spark's split), same four
    * 16-bit md5 chunks, and the SAME bit-sum / chunk-value / assembly /
    * band formula strings — embedded verbatim from the builders above.
    */
  private val simhashCtes: String = {
    val bitSums = (0 until 64).map(simhashBitSumSql).mkString(", ")
    val chunkVals = (0 until 4).map(simhashChunkValSql).mkString(", ")
    val bands = simhashBandSqls.map { case (n, f) => s"$f AS $n" }.mkString(", ")
    val chunks = (0 until 4).map(c =>
      s"('0x' || substring(md5(w), ${1 + 4 * c}, 4))::BIGINT AS c$c").mkString(", ")
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        chs AS (SELECT doc_id, $chunks FROM tok),
        bsums AS (SELECT doc_id, $bitSums FROM chs GROUP BY doc_id),
        cvals AS (SELECT doc_id, $chunkVals FROM bsums),
        shash AS (SELECT doc_id, $simhashAssembleSql AS simhash FROM cvals),
        simbands AS (SELECT doc_id, simhash, $bands FROM shash)"""
  }

  val oracles: Map[String, String] = Map(
    "q193_dup_family_dist" ->
      s"""WITH RECURSIVE $reachCtes,
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS family_size
                 FROM cl GROUP BY 1)
          SELECT family_size,
                 CAST(count(*) AS BIGINT) AS n_families,
                 CAST(family_size * count(*) AS BIGINT) AS n_docs,
                 CAST((family_size - 1) * count(*) AS BIGINT) AS n_excess
          FROM sz GROUP BY 1""",
    "q169_canonical_docs" -> {
      val en = TextAnalysis.duckStopCount("en")
      s"""WITH RECURSIVE $reachCtes,
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          qt AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
          q AS (SELECT doc_id,
                       round(0.5 * least(CAST(len(w) AS DOUBLE) / 50.0, 1.0) +
                             0.5 * (CAST($en AS DOUBLE) / len(w)), 4) AS quality
                FROM qt),
          r AS (SELECT cl.doc_id, cluster_id, quality,
                       row_number() OVER (PARTITION BY cluster_id
                         ORDER BY quality DESC, cl.doc_id) AS rn
                FROM cl JOIN q ON cl.doc_id = q.doc_id)
          SELECT doc_id, cluster_id, quality, rn = 1 AS keep FROM r"""
    },
    "q28_dedup_exact" ->
      """SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS content_hash,
                count(*) AS n_copies, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q273_near_dup_shardability" ->
      s"""WITH RECURSIVE $reachCtes,
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          m AS (SELECT cl.cluster_id, d.source
                FROM cl JOIN documents d USING (doc_id)),
          fam AS (SELECT cluster_id, count(*) AS n_copies,
                         count(DISTINCT source) AS n_sources
                  FROM m GROUP BY 1)
          SELECT n_copies AS family_size,
                 CAST(count(*) AS BIGINT) AS n_families,
                 CAST(n_copies * count(*) AS BIGINT) AS n_docs,
                 CAST((n_copies - 1) * count(*) AS BIGINT) AS global_removals,
                 CAST(sum(n_copies - n_sources) AS BIGINT) AS sharded_removals,
                 CAST(sum(n_sources - 1) AS BIGINT) AS missed_removals,
                 count(*) FILTER (WHERE n_sources = 1) AS mono_source_families,
                 CAST(sum(n_sources - 1) * 10000
                      // ((n_copies - 1) * count(*)) AS BIGINT) AS missed_bp
          FROM fam GROUP BY 1""",
    "q271_dedup_shardability" ->
      """WITH h AS (SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS ch,
                           source
                    FROM documents),
          fam AS (SELECT ch, count(*) AS n_copies,
                         count(DISTINCT source) AS n_sources
                  FROM h GROUP BY 1 HAVING count(*) > 1)
          SELECT n_copies AS family_size,
                 CAST(count(*) AS BIGINT) AS n_families,
                 CAST(n_copies * count(*) AS BIGINT) AS n_docs,
                 CAST((n_copies - 1) * count(*) AS BIGINT) AS global_removals,
                 CAST(sum(n_copies - n_sources) AS BIGINT) AS sharded_removals,
                 CAST(sum(n_sources - 1) AS BIGINT) AS missed_removals,
                 count(*) FILTER (WHERE n_sources = 1) AS mono_source_families,
                 CAST(sum(n_sources - 1) * 10000
                      // ((n_copies - 1) * count(*)) AS BIGINT) AS missed_bp
          FROM fam GROUP BY 1""",
    "q30_dedup_simhash" ->
      s"""WITH $simhashCtes
          SELECT doc_id, simhash, band0, band1, band2, band3 FROM simbands""",
    "q69_dedup_simhash_pairs" ->
      s"""WITH $simhashCtes,
          sb AS (SELECT doc_id, simhash, 0 AS band_id, band0 AS sig FROM simbands
                 UNION ALL
                 SELECT doc_id, simhash, 1 AS band_id, band1 AS sig FROM simbands
                 UNION ALL
                 SELECT doc_id, simhash, 2 AS band_id, band2 AS sig FROM simbands
                 UNION ALL
                 SELECT doc_id, simhash, 3 AS band_id, band3 AS sig FROM simbands),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.simhash AS ha, b.simhash AS hb
                   FROM sb a JOIN sb b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
          FROM cand WHERE bit_count(xor(ha, hb)) <= 3""",
    "q29_dedup_minhash" ->
      s"""WITH $minhashCtes
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
          FROM bands a JOIN bands b USING (band_id, sig)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2""",
    "q199_containment" ->
      s"""WITH $minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN sh sa ON sa.doc_id = c.doc_a
                    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
                    GROUP BY 1, 2),
          sc AS (SELECT i.doc_a, i.doc_b,
                        i.n_inter * 10000 // ca.c AS containment_a_bp,
                        i.n_inter * 10000 // cb.c AS containment_b_bp
                 FROM inter i
                 JOIN sizes ca ON ca.doc_id = i.doc_a
                 JOIN sizes cb ON cb.doc_id = i.doc_b)
          SELECT doc_a, doc_b, containment_a_bp, containment_b_bp,
                 CASE WHEN containment_a_bp >= 9000 AND containment_b_bp >= 9000 THEN 'mutual'
                      WHEN containment_a_bp >= 9000 THEN 'a_in_b'
                      WHEN containment_b_bp >= 9000 THEN 'b_in_a'
                      ELSE 'overlap' END AS relation
          FROM sc""",
    "q31_ngram_jaccard" ->
      s"""WITH $minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN sh sa ON sa.doc_id = c.doc_a
                    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
                    GROUP BY 1, 2)
          SELECT i.doc_a, i.doc_b,
                 round(CAST(i.n_inter AS DOUBLE) / (ca.c + cb.c - i.n_inter), 4) AS jaccard
          FROM inter i
          JOIN sizes ca ON ca.doc_id = i.doc_a
          JOIN sizes cb ON cb.doc_id = i.doc_b""",
    "q240_minhash_calibration" -> {
      val est = (0 until NumHashes)
        .map(i => s"(CASE WHEN ma.m$i = mb.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN sh sa ON sa.doc_id = c.doc_a
                    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
                    GROUP BY 1, 2),
          sc AS (SELECT i.doc_a, i.doc_b,
                        i.n_inter * 10000 // (ca.c + cb.c - i.n_inter) AS jac_bp,
                        CAST($est AS BIGINT) AS est_matches
                 FROM inter i
                 JOIN sizes ca ON ca.doc_id = i.doc_a
                 JOIN sizes cb ON cb.doc_id = i.doc_b
                 JOIN mh ma ON ma.doc_id = i.doc_a
                 JOIN mh mb ON mb.doc_id = i.doc_b)
          SELECT est_matches, CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(round(CAST(sum(jac_bp) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_jaccard_bp,
                 CAST(min(jac_bp) AS BIGINT) AS min_jaccard_bp,
                 CAST(max(jac_bp) AS BIGINT) AS max_jaccard_bp,
                 est_matches * 10000 // $NumHashes AS est_bp
          FROM sc GROUP BY 1""" },
    "q261_lsh_band_sweep" -> {
      // one CTE family per scheme, generated from the same BandSchemes
      // list the Spark side reads; each scheme inherits the hot-bucket
      // cap exactly as expandPairs applies it per banding
      val per = BandSchemes.map { case (b, r) =>
        val bandSel = (0 until b).map { i =>
          val sig = (0 until r).map(j => s"m${i * r + j}::VARCHAR")
            .mkString(" || ':' || ")
          s"SELECT doc_id, $i AS band_id, $sig AS sig FROM mh"
        }.mkString(" UNION ALL ")
        val sfx = s"_${b}_$r"
        (s"""b$sfx AS ($bandSel),
          ok$sfx AS (SELECT band_id, sig FROM b$sfx GROUP BY 1, 2
                     HAVING count(*) <= 4096),
          c$sfx AS (SELECT DISTINCT a.doc_id AS doc_a, z.doc_id AS doc_b
                    FROM b$sfx a JOIN b$sfx z USING (band_id, sig)
                    JOIN ok$sfx USING (band_id, sig)
                    WHERE a.doc_id < z.doc_id),
          i$sfx AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM c$sfx c
                    JOIN sh sa ON sa.doc_id = c.doc_a
                    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
                    GROUP BY 1, 2),
          jb$sfx AS (SELECT i.doc_a, i.doc_b,
                            i.n_inter * 10000 // (ca.c + cb.c - i.n_inter)
                              AS j_bp
                     FROM i$sfx i
                     JOIN sizes ca ON ca.doc_id = i.doc_a
                     JOIN sizes cb ON cb.doc_id = i.doc_b)""",
          s"""SELECT CAST($b AS BIGINT) AS bands,
                 CAST($r AS BIGINT) AS rows_per_band,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(round(CAST(sum(j_bp) AS DOUBLE) /
                      CAST(count(j_bp) AS DOUBLE)) AS BIGINT)
                   AS mean_jaccard_bp,
                 min(j_bp) AS min_jaccard_bp,
                 CAST(COALESCE(sum(CASE WHEN j_bp IS NULL THEN 1 ELSE 0 END), 0)
                   AS BIGINT) AS n_zero_overlap
          FROM c$sfx LEFT JOIN jb$sfx USING (doc_a, doc_b)""")
      }
      s"""WITH $minhashCtes,
          sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
          ${per.map(_._1).mkString(",\n          ")}
          ${per.map(_._2).mkString("\nUNION ALL\n")}"""
    },
    "q255_lsh_bucket_occupancy" ->
      s"""WITH $minhashCtes,
          bu AS (SELECT band_id, sig, CAST(count(*) AS BIGINT) AS bs
                 FROM bands0 GROUP BY 1, 2)
          SELECT band_id, CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(sum(CASE WHEN bs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_multi_buckets,
                 max(bs) AS max_bucket,
                 round(quantile_cont(bs, 0.95), 4) AS p95_bucket,
                 CAST(sum(CASE WHEN bs > 1 THEN bs * (bs - 1) // 2 ELSE 0 END)
                   AS BIGINT) AS n_pairs_expanded,
                 CAST(sum(CASE WHEN bs > 4096 THEN bs ELSE 0 END) AS BIGINT)
                   AS docs_in_overcap
          FROM bu GROUP BY 1""",
    "q249_cross_source_mirror" ->
      s"""WITH $minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN sh sa ON sa.doc_id = c.doc_a
                    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
                    GROUP BY 1, 2),
          conf AS (SELECT i.doc_a, i.doc_b
                   FROM inter i
                   JOIN sizes ca ON ca.doc_id = i.doc_a
                   JOIN sizes cb ON cb.doc_id = i.doc_b
                   WHERE i.n_inter * 10000 // (ca.c + cb.c - i.n_inter) >= 8000),
          cells AS (SELECT least(da.source, db.source) AS source_a,
                           greatest(da.source, db.source) AS source_b
                    FROM conf
                    JOIN documents da ON conf.doc_a = da.doc_id
                    JOIN documents db ON conf.doc_b = db.doc_id),
          tot AS (SELECT count(*) AS n_total FROM cells)
          SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
                 source_a = source_b AS within_source,
                 (count(*) * 10000) // n_total AS share_bp
          FROM cells CROSS JOIN tot GROUP BY 1, 2, n_total""",
    "q250_canonical_source_bias" ->
      s"""WITH RECURSIVE $reachCtes,
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          m AS (SELECT d.source,
                       CASE WHEN cl.doc_id = cl.cluster_id THEN 1 ELSE 0 END
                         AS is_canon
                FROM cl JOIN documents d ON cl.doc_id = d.doc_id),
          tot AS (SELECT count(*) AS mt, CAST(sum(is_canon) AS BIGINT) AS ct
                  FROM m)
          SELECT source, CAST(count(*) AS BIGINT) AS n_members,
                 CAST(sum(is_canon) AS BIGINT) AS n_canonical,
                 (CAST(sum(is_canon) AS BIGINT) * 10000) // count(*) AS keep_bp,
                 (count(*) * 10000) // mt AS member_share_bp,
                 (CAST(sum(is_canon) AS BIGINT) * 10000) // greatest(ct, 1)
                   AS canonical_share_bp
          FROM m CROSS JOIN tot GROUP BY 1, mt, ct""",
    "q210_dedup_threshold_curve" ->
      s"""WITH $minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN sh sa ON sa.doc_id = c.doc_a
                    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
                    GROUP BY 1, 2),
          jac AS (SELECT i.doc_a, i.doc_b,
                         i.n_inter * 10000 // (ca.c + cb.c - i.n_inter) AS j_bp
                  FROM inter i
                  JOIN sizes ca ON ca.doc_id = i.doc_a
                  JOIN sizes cb ON cb.doc_id = i.doc_b),
          th AS (SELECT unnest([5000, 6000, 7000, 8000, 9000]::BIGINT[]) AS threshold_bp),
          sel AS (SELECT t.threshold_bp, j.doc_a, j.doc_b
                  FROM th t JOIN jac j ON j.j_bp >= t.threshold_bp),
          ex AS (SELECT threshold_bp, doc_a AS d FROM sel
                 UNION ALL SELECT threshold_bp, doc_b FROM sel)
          SELECT threshold_bp, count(*) // 2 AS n_pairs,
                 count(DISTINCT d) AS n_docs
          FROM ex GROUP BY 1""",
    "q70_edit_distance" ->
      s"""WITH $minhashCtes,
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b USING (band_id, sig)
                   WHERE a.doc_id < b.doc_id),
          f AS (SELECT doc_id,
                       regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS ftext
                FROM documents),
          j AS (SELECT c.doc_a, c.doc_b, da.ftext AS fa, db.ftext AS fb
                FROM cand c
                JOIN f da ON da.doc_id = c.doc_a
                JOIN f db ON db.doc_id = c.doc_b)
          SELECT doc_a, doc_b,
                 CAST(levenshtein(fa, fb) AS BIGINT) AS edit_distance,
                 CAST(levenshtein(fa, fb) AS BIGINT) * 10000
                   // greatest(greatest(length(fa), length(fb)), 1) AS norm_bp
          FROM j""",
    "q179_cluster_split" ->
      s"""WITH RECURSIVE $reachCtes,
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          g AS (SELECT d.doc_id,
                       coalesce(cl.cluster_id, d.doc_id) AS group_key,
                       cl.cluster_id IS NOT NULL AS in_cluster
                FROM documents d LEFT JOIN cl USING (doc_id)),
          co AS (SELECT *, ${TextAnalysis.duckCoin("group_key")} AS coin FROM g)
          SELECT doc_id, group_key, in_cluster,
                 CASE WHEN coin < 204 THEN 'train'
                      WHEN coin < 230 THEN 'val'
                      ELSE 'test' END AS split
          FROM co""",
    "q56_dedup_clusters" ->
      s"""WITH RECURSIVE $reachCtes
          SELECT src AS doc_id,
                 least(src, min(dst)) AS cluster_id,
                 (src = least(src, min(dst))) AS is_survivor
          FROM reach GROUP BY src""",
    "q224_near_dup_token_savings" ->
      s"""WITH RECURSIVE $reachCtes,
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          tok AS (SELECT doc_id, source,
                         CAST(len(list_filter(string_split(text, ' '),
                                              x -> x <> '')) AS BIGINT) AS n_tok
                  FROM documents),
          j AS (SELECT t.source, t.n_tok,
                       CASE WHEN cl.cluster_id IS NOT NULL
                                 AND cl.cluster_id <> t.doc_id
                            THEN 1 ELSE 0 END AS is_removed
                FROM tok t LEFT JOIN cl ON t.doc_id = cl.doc_id)
          SELECT source, count(*) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                 CAST(sum(is_removed) AS BIGINT) AS n_removed_docs,
                 CAST(sum(is_removed * n_tok) AS BIGINT) AS tokens_removed,
                 (CAST(sum(is_removed * n_tok) AS BIGINT) * 10000)
                   // greatest(CAST(sum(n_tok) AS BIGINT), 1) AS saved_bp
          FROM j GROUP BY 1""",
    "q289_dup_by_length" ->
      """WITH h AS (SELECT CAST(len(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS BIGINT) AS n_words,
                           md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS ch
                    FROM documents),
          f AS (SELECT n_words,
                       count(*) OVER (PARTITION BY ch) > 1 AS is_dup
                FROM h),
          cells AS (SELECT n_words, count(*) AS vc,
                           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                             AS dups
                    FROM f GROUP BY 1),
          d AS (SELECT n_words,
                       CAST(COALESCE(sum(vc) OVER (ORDER BY n_words
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0) * 10
                         // (SELECT count(*) FROM h) AS BIGINT) AS decile
                FROM cells)
          SELECT decile,
                 CAST(sum(vc) AS BIGINT) AS n_docs,
                 CAST(sum(dups) AS BIGINT) AS n_dup_docs,
                 CAST(sum(dups) AS BIGINT) * 10000 // CAST(sum(vc) AS BIGINT)
                   AS dup_bp
          FROM cells JOIN d USING (n_words)
          GROUP BY decile""",
    "q286_prefix_key_sweep" -> {
      // one aggregate per swept k, generated from the SAME KeyWordsSweep
      // list; the k=3 branch is q225's SQL shape with the sweep columns
      val rows = KeyWordsSweep.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS key_words, ${k == 3} AS is_production,
              count(*) AS n_multi_groups,
              COALESCE(CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT), 0)
                AS n_false_merge_groups,
              COALESCE(CAST(sum(n) AS BIGINT), 0) AS docs_in_multi,
              COALESCE(CAST(sum(CASE WHEN a <> b THEN n ELSE 0 END) AS BIGINT), 0)
                AS docs_in_false,
              (COALESCE(CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT), 0)
                * 10000) // greatest(count(*), 1) AS false_merge_bp
           FROM (SELECT k$k AS k, count(*) AS n, min(ft) AS a, max(ft) AS b
                 FROM h GROUP BY 1 HAVING count(*) > 1)"""
      }.mkString("\nUNION ALL\n")
      s"""WITH h AS (SELECT ${KeyWordsSweep.map(k =>
            s"md5(array_to_string(string_split(text, ' ')[1:$k], ' ')) AS k$k")
            .mkString(", ")},
                           md5(text) AS ft
                    FROM documents)
          $rows"""
    },
    "q225_dedup_key_precision" ->
      """WITH h AS (SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS k,
                           md5(text) AS ft
                    FROM documents),
          g AS (SELECT k, count(*) AS n, min(ft) AS a, max(ft) AS b
                FROM h GROUP BY k HAVING count(*) > 1)
          SELECT count(*) AS n_multi_groups,
                 COALESCE(CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT), 0)
                   AS n_false_merge_groups,
                 COALESCE(CAST(sum(n) AS BIGINT), 0) AS docs_in_multi,
                 COALESCE(CAST(sum(CASE WHEN a <> b THEN n ELSE 0 END) AS BIGINT), 0)
                   AS docs_in_false,
                 (COALESCE(CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT), 0)
                   * 10000) // greatest(count(*), 1) AS false_merge_bp
          FROM g""",
    "q32_dedup_embedding" ->
      """WITH c AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                  list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                  (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                   sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos_sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, round(cos_sim, 4) AS cos_sim
         FROM c WHERE cos_sim >= 0.35""")

  /** q193: duplicate-family size distribution — the dedup IMPACT report a
    * corpus datasheet carries: per family size, how many near-dup
    * families exist, how many documents they hold, and how many are
    * EXCESS (the copies a collapse removes — family_size − 1 per
    * family). Reads the shared [[clusterMap]] (one cheap reuse of the
    * build-once pass); two tiny map-side-combined aggregates over the
    * candidate-bounded membership frame — nothing corpus-scale beyond
    * the shared build. Oracled through the same recursive
    * transitive-closure CTE as q56.
    */
  def q193DupFamilyDist(s: SparkSession, dir: String): DataFrame =
    clusterMap(s, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("family_size"))
      .groupBy(col("family_size"))
      .agg(count(lit(1)).as("n_families"))
      .select(col("family_size"), col("n_families"),
        (col("family_size") * col("n_families")).as("n_docs"),
        ((col("family_size") - 1) * col("n_families")).as("n_excess"))

  /** q169: canonical-document selection — the production answer to "WHICH
    * copy do we keep": q56 collapses near-dup clusters but crowns the
    * MIN-doc_id survivor (deterministic, quality-blind); here each
    * cluster keeps its highest-q37-quality member instead (doc_id
    * tiebreak — quality is the oracled round-4 value, so the ranking
    * cannot ulp-flip between engines). Scope is q56's: docs in clusters;
    * singletons are trivially their own canonical copy.
    *
    * Shape: the shared [[clusterMap]] (built once per session/dir, or a
    * PUBLISHED cluster table at deployment scale) joined with q37's
    * quality projection on doc_id (both corpus-bounded), then one
    * row_number window per cluster — bounded by cluster size, never
    * global.
    */
  def q169CanonicalDocs(s: SparkSession, dir: String): DataFrame =
    canonicalFrom(clusterMap(s, dir),
      TextAnalysis.q37QualityScore(s, dir).select(col("doc_id"), col("quality")))

  /** q169's rule over ANY (doc_id, cluster_id) membership frame — pass
    * `spark.table(...)` from [[writeClusterTableBucketed]] to crown
    * canonical docs off the published map without re-clustering. */
  def canonicalFrom(clusters: DataFrame, quality: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    clusters.select(col("doc_id"), col("cluster_id"))
      .join(quality, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality"), col("keep"))
  }

  /** q175: SemDeDup — semantic deduplication in embedding space (Abbas et
    * al. 2023's cluster-then-prune): k-means-cluster the corpus with the
    * q48 quantizer, then within each cluster DROP every vector that has a
    * ≥ τ cosine twin ranked ahead of it under the (centroid-sim, vec_id)
    * total order — keeping, per the paper, the member FURTHEST from its
    * centroid (low anchor similarity ⇒ the harder, more diverse example),
    * with vec_id breaking exact ties deterministically. Unlike q32/q54
    * (pair REPORTS), this emits the per-vector keep/drop VERDICT a
    * curation pipeline actually consumes; the minimum-ranked member of
    * any τ-connected group can never be dominated, so every duplicate
    * group retains at least one representative.
    *
    * Scale shape: the centroids are a driver-held memoized model (q48);
    * assignment + anchor similarity are ONE pure projection (argmax over
    * k cells, no shuffle); candidate pairs expand within cells only
    * (Σ n_c² balanced by the learned quantizer — the paper's own shape at
    * 440 M docs); the verdict is a distinct on the dominated side plus a
    * left join back. Rows-only (the learned quantizer has no SQL mirror);
    * DedupSimilaritySpec recomputes the rule via the independent HOF
    * cosine and a different aggregation shape.
    */
  def q175SemDedup(s: SparkSession, dir: String,
                   k: Int = 16, iters: Int = 3, tau: Double = 0.35): DataFrame = {
    val centers = Similarity.kmeansCentroids(s, dir, k = k, iters = iters)
    val assigned = Tables.embeddings(s, dir)
      .withColumn("best", Similarity.bestScoredCell(col("embedding"), centers))
      .select(col("vec_id"),
        col("embedding"),
        (-col("best").getField("negcell")).as("cell"),
        col("best").getField("cs").as("cent_sim"))
      // three consumers (both pair sides + the verdict join) — checkpoint
      // so the scan + k-cell argmax run once; at 100 TB this materialized
      // frame IS the persisted cell-partitioned IvfIndex layout, built once
      .localCheckpoint()
    val ahead = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("cent_sim").as("cent_a"))
    val behind = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("cent_sim").as("cent_b"))
    val dropped = ahead.join(behind, Seq("cell"))
      .filter(col("cent_a") < col("cent_b") ||
        (col("cent_a") === col("cent_b") && col("id_a") < col("id_b")))
      .filter(VectorOps.cosine(col("ea"), col("eb")) >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    assigned
      .join(dropped.withColumn("dominated", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        round(col("cent_sim"), 4).as("cent_sim"),
        col("dominated").isNull.as("is_kept"))
  }

  /** q179: dedup-aware split assignment — the FIX for what q178 measures:
    * q74's per-doc coin lets near-duplicate documents straddle
    * train/val/test, leaking training signal into evaluation. Here the
    * coin is thrown per near-dup CLUSTER (q56's connected components;
    * singletons are their own group), so an entire duplicate group lands
    * in one split — leakage through the q29 candidate graph is
    * structurally zero while marginal split fractions stay ~80/10/10
    * (the coin is uniform over group keys).
    *
    * Shape: the shared [[clusterMap]] (one CC pass per session/dir —
    * q56/q169/q179 no longer each recompute it; a deployment reads the
    * published table instead) + one left join of the doc spine against
    * the cluster-membership frame (candidate-bounded, broadcastable in
    * practice but planned as a plain join — correct either way) + a pure
    * md5-coin projection. Nothing new at corpus scale beyond q56 itself.
    */
  def q179ClusterSplit(s: SparkSession, dir: String): DataFrame =
    clusterSplitFrom(Tables.documents(s, dir).select(col("doc_id")),
      clusterMap(s, dir))

  /** q179's rule over ANY doc spine + (doc_id, cluster_id) membership
    * frame — the published-cluster-table serving path. */
  def clusterSplitFrom(docs: DataFrame, clusters0: DataFrame): DataFrame = {
    val clusters = clusters0.select(col("doc_id"), col("cluster_id"))
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("coin", TextAnalysis.md5Coin(col("group_key")))
      .select(col("doc_id"), col("group_key"),
        col("cluster_id").isNotNull.as("in_cluster"),
        when(col("coin") < 204, "train").when(col("coin") < 230, "val")
          .otherwise("test").as("split"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_semdedup"       -> ((s, dir) => q175SemDedup(s, dir)),
    "q193_dup_family_dist" -> (q193DupFamilyDist _),
    "q179_cluster_split"  -> (q179ClusterSplit _),
    "q169_canonical_docs" -> (q169CanonicalDocs _),
    "q28_dedup_exact"     -> (q28DedupExact _),
    "q271_dedup_shardability" -> (q271DedupShardability _),
    "q273_near_dup_shardability" -> (q273NearDupShardability _),
    "q224_near_dup_token_savings" -> (q224NearDupTokenSavings _),
    "q225_dedup_key_precision" -> (q225DedupKeyPrecision _),
    "q286_prefix_key_sweep" -> (q286PrefixKeySweep _),
    "q289_dup_by_length" -> (q289DupByLength _),
    "q29_dedup_minhash"   -> (q29DedupMinhash _),
    "q199_containment"    -> (q199Containment _),
    "q49_dedup_minhash_fast" -> (q49DedupMinhashFast _),
    "q30_dedup_simhash"   -> (q30DedupSimhash _),
    "q69_dedup_simhash_pairs" -> ((s, dir) => q69DedupSimhashPairs(s, dir)),
    "q31_ngram_jaccard"   -> (q31NgramJaccard _),
    "q210_dedup_threshold_curve" -> (q210ThresholdCurve _),
    "q240_minhash_calibration" -> (q240MinhashCalibration _),
    "q249_cross_source_mirror" -> (q249CrossSourceMirror _),
    "q250_canonical_source_bias" -> (q250CanonicalSourceBias _),
    "q255_lsh_bucket_occupancy" -> (q255LshBucketOccupancy _),
    "q261_lsh_band_sweep" -> (q261LshBandSweep _),
    "q70_edit_distance"   -> (q70EditDistance _),
    "q102_edit_distance_fast" -> (q102EditDistanceFast _),
    "q56_dedup_clusters"  -> (q56DedupClusters _),
    "q32_dedup_embedding" -> (q32DedupEmbedding _),
    "q54_dedup_embedding_cells" -> ((s, dir) => q54DedupEmbeddingCells(s, dir)))
}
