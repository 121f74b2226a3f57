package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Persisted IVF vector index — the 100 TB serving shape of q48.
  *
  * `build` trains the spherical k-means coarse quantizer ONCE, writes the
  * corpus as parquet PARTITIONED BY its cell assignment, and persists the
  * centroid model next to it. `probe` then reads only the `nprobe` cell
  * partitions closest to each query: the scan carries a
  * `cell IN (...)` partition filter, so a probe touches ~nprobe/k of the
  * stored bytes — the index IS the directory layout, no load-time shuffle,
  * no per-query training. IvfIndexSpec asserts the PartitionFilters on the
  * probe scan's physical plan and result-equality with the in-memory q48.
  */
object IvfIndex {

  private val TopK = 5

  /** Train the quantizer and write the index:
    * `indexDir/corpus` — embeddings partitioned by `cell`;
    * `indexDir/centers` — (cell, centroid) parquet, the fitted model.
    */
  def build(s: SparkSession, dir: String, indexDir: String,
            k: Int = 16, iters: Int = 3, trainMod: Long = 1L): Unit = {
    val centers = Similarity.kmeansCentroids(s, dir, k, iters, trainMod)
    graft.Tables.embeddings(s, dir)
      .withColumn("cell", Similarity.nearestCell(col("embedding"), centers))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$indexDir/corpus")
    import s.implicits._
    centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centers")
  }

  /** Incremental refresh: assign a new embedding batch with the EXISTING
    * model and append it into the cell-partitioned layout — serving
    * continues with no retrain and no rewrite of resident data (partition
    * append: only the touched cell directories gain files, the q54/s04
    * "touch only what changed" rule applied to the vector side). The
    * documented trade: the quantizer drifts as appended data shifts the
    * distribution — when recall decays, `build` re-trains and rewrites.
    *
    * DELIVERY CONTRACT (at-least-once, like rollupStream's sink note):
    * the parquet append commits all-or-nothing per CALL, but a caller that
    * retries after an unreported success double-inserts the batch — there
    * is no batch id in the layout to make the append idempotent. Callers
    * with retry semantics must either dedupe by `vec_id` downstream
    * (q28's exact-dedup shape over the probe result) or wrap appends in a
    * batch-id marker the way `Dedup.publishBatch` versions its
    * generations. The batch is validated against the stored model first:
    * a wrong-dimension embedding would otherwise poison every future
    * probe's cosine with a silent zero-padded score.
    */
  def appendBatch(s: SparkSession, indexDir: String, batch: DataFrame): Unit = {
    val centers = loadCenters(s, indexDir)
    require(batch.columns.contains("vec_id") && batch.columns.contains("embedding"),
      s"appendBatch: batch must carry (vec_id, embedding), got ${batch.columns.mkString(", ")}")
    val dim = centers.head.length
    // one pass over the (incremental-sized) batch; catches a model/batch
    // dimensionality mismatch before any file lands in the index
    val badDims = batch.select(size(col("embedding")).as("d"))
      .filter(col("d") =!= dim).limit(1).collect()
    require(badDims.isEmpty,
      s"appendBatch: embedding dim ${badDims.headOption.map(_.get(0)).getOrElse("?")} " +
        s"does not match the stored model's dim $dim — retrain via build() instead")
    batch
      .withColumn("cell", Similarity.nearestCell(col("embedding"), centers))
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(s"$indexDir/corpus")
  }

  // ===================================================================
  // IVF×PQ — the composed production serving shape: q48's cell-partitioned
  // layout STORING q134's PQ codes. A probe is (1) partition-pruned scan
  // of the ~nprobe/k probed cells' CODE bytes (each ~1/32 the float row),
  // (2) ADC shortlist per query — m table lookups per candidate, no float
  // touched, (3) exact re-rank fetching full vectors for only the
  // shortlist rows, partition-pruned to the SAME probed cells. Encode and
  // ADC are the one-definition kernels shared with q134
  // ([[Similarity.pqCodesOf]] / [[Similarity.adcTablesOf]] /
  // [[Similarity.adcScore]]), so the in-memory query and the persisted
  // index cannot drift.
  // ===================================================================

  /** Train coarse quantizer + PQ codebooks and write the composed index:
    * `indexDir/corpus`  — float vectors partitioned by cell (the exact
    *                      re-rank side — [[build]]'s layout, unchanged);
    * `indexDir/pqcodes` — (vec_id, codes) partitioned by cell — the ADC
    *                      scan side, ~32× smaller than the floats;
    * `indexDir/centers` — the coarse quantizer model;
    * `indexDir/books`   — PQ codebooks as (sub, code, codeword) rows.
    */
  def buildPq(s: SparkSession, dir: String, indexDir: String,
              k: Int = 16, iters: Int = 3, trainMod: Long = 1L,
              m: Int = Similarity.PqM, pqK: Int = Similarity.PqK,
              pqIters: Int = 3): Unit = {
    build(s, dir, indexDir, k, iters, trainMod)
    val books = Similarity.pqCodebooks(s, dir, m, pqK, pqIters, trainMod)
    // encode FROM the cell-partitioned layout (not the source table): the
    // stored cell assignment is the one truth, and codes are a pure
    // projection of it — no second quantizer pass, no drift window
    writeCodes(s.read.parquet(s"$indexDir/corpus"), indexDir, books,
      SaveMode.Overwrite)
    import s.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
    }.toSeq.toDF("sub", "code", "codeword")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/books")
  }

  private def writeCodes(corpusWithCell: DataFrame, indexDir: String,
      books: Array[Array[Array[Double]]], mode: SaveMode): Unit =
    Similarity.pqCodesOf(
        corpusWithCell.select(col("cell"), col("vec_id"), col("embedding")),
        "embedding", books)
      .select(col("cell"), col("vec_id"), col("codes"))
      .write.mode(mode).partitionBy("cell").parquet(s"$indexDir/pqcodes")

  /** The PQ model is m×k×(dim/m) doubles (~16 KB) — driver-held by
    * design, like the coarse quantizer. */
  private[graft] def loadBooks(
      s: SparkSession, indexDir: String): Array[Array[Array[Double]]] = {
    val rows = s.read.parquet(s"$indexDir/books").collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    Array.tabulate(m)(j => rows.filter(_._1 == j).sortBy(_._2).map(_._3))
  }

  /** Incremental refresh of the COMPOSED index: [[appendBatch]]'s
    * dim-validated float append plus the matching code append, both
    * assigned/encoded with the STORED models — serving continues with no
    * retrain. Same delivery contract as [[appendBatch]] (at-least-once;
    * idempotence is the caller's via vec_id dedup or batch-id markers).
    */
  def appendBatchPq(s: SparkSession, indexDir: String, batch: DataFrame): Unit = {
    appendBatch(s, indexDir, batch) // validates (vec_id, embedding) + dim
    val centers = loadCenters(s, indexDir)
    val books = loadBooks(s, indexDir)
    writeCodes(
      batch.withColumn("cell", Similarity.nearestCell(col("embedding"), centers)),
      indexDir, books, SaveMode.Append)
  }

  /** ANN top-k served from the composed persisted layout. Probe cells are
    * driver-computed from the loaded coarse model (literal `cell IN`
    * lists → static partition pruning on BOTH scans): the ADC pass reads
    * only the probed cells' code bytes (~nprobe/k · corpus/32), the
    * re-rank reads float vectors only for the broadcast shortlist's keys
    * within those same cells.
    */
  def probePq(s: SparkSession, indexDir: String, queries: DataFrame,
              nprobe: Int = 8, topK: Int = TopK,
              shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val centers = loadCenters(s, indexDir)
    val books = loadBooks(s, indexDir)
    val qs = queries
      .withColumn("probes",
        slice(Similarity.sortedScoredCells(col("qe"), centers), 1, nprobe))
      .withColumn("cell", explode(expr("transform(probes, s -> -s.negcell)")))
      .drop("probes")
    val qsAdc = Similarity.adcTablesOf(qs, "qe", books)
      .select(col("query_id"), col("cell"), col("qt"))
    // union of all queries' probe cells — driver-computed from the model
    // side (bounded by k), never from the corpus
    val probedCells: Seq[Int] = qs.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val codes = s.read.parquet(s"$indexDir/pqcodes")
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("codes"))
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val short = codes.join(broadcast(qsAdc), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", Similarity.adcScore)
      .withColumn("arnk", row_number().over(adcW))
      .filter(col("arnk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val floats = s.read.parquet(s"$indexDir/corpus")
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cs"), 6).desc, col("neighbor_id").asc)
    floats.join(broadcast(short.join(queries, "query_id")), Seq("neighbor_id"))
      .withColumn("cs", VectorOps.cosine(col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cs"), 4).as("cos_sim"), col("rnk"))
  }

  /** The model is k×dim doubles — driver-held by design (same as a fitted
    * KMeansModel); this collect is the whole model, not data.
    */
  private[graft] def loadCenters(s: SparkSession, indexDir: String): Array[Array[Double]] =
    s.read.parquet(s"$indexDir/centers")
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** ANN top-k for `queries` (`query_id`, `qe: array<float|double>`) served
    * from the persisted layout. Probe cells are computed driver-side from
    * the loaded model, so the corpus scan's `cell IN (...)` predicate is a
    * literal list → static partition pruning at plan time.
    */
  def probe(s: SparkSession, indexDir: String, queries: DataFrame,
            nprobe: Int = 8, topK: Int = TopK): DataFrame =
    probeWith(s, indexDir, queries, None, nprobe, topK)

  /** [[probe]] with an optional extra corpus frame unioned under the same
    * probe-cell filter — the serving path for
    * [[graft.streaming.VectorIngest]]'s un-compacted ingest lane (the
    * extra frame carries the SAME (cell, vec_id, embedding) columns; its
    * cell predicate pushes down rather than partition-prunes, which is the
    * documented trade for the lane's bounded size).
    */
  private[graft] def probeWith(s: SparkSession, indexDir: String, queries: DataFrame,
      extraCorpus: Option[DataFrame], nprobe: Int, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cs"), 6).desc, col("neighbor_id").asc)
    scoredProbeJoin(s, indexDir, queries, extraCorpus, nprobe)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cs"), 4).as("cos_sim"), col("rnk"))
  }

  /** RANGE search — every neighbor with cosine ≥ `minCos` among the
    * probed cells: the all-within-radius API every ANN deployment has
    * beside top-k (semantic-dedup at a similarity bar, policy-match
    * sweeps, "return EVERYTHING this close" lookups — a top-k cannot
    * answer "how many are this close" and a brute radius scan reads the
    * whole corpus). Same partition-pruned cell scan and approximation
    * contract as [[probe]] (a neighbor outside the probed cells is
    * missed; recall rises with nprobe — spec-pinned against the exact
    * brute radius sweep, with full cell coverage ≡ exact). The output is
    * data-dependent in size by design; `rnk` carries the deterministic
    * within-query order (cosine desc, id asc) so a downstream take(n)
    * agrees across engines and runs.
    */
  def probeRange(s: SparkSession, indexDir: String, queries: DataFrame,
                 minCos: Double, nprobe: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cs"), 6).desc, col("neighbor_id").asc)
    scoredProbeJoin(s, indexDir, queries, None, nprobe)
      .filter(round(col("cs"), 6) >= minCos)
      .withColumn("rnk", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"),
        round(col("cs"), 4).as("cos_sim"), col("rnk"))
  }

  /** The shared probe scaffold: queries scored against the model
    * driver-side → literal `cell IN (...)` partition-pruned corpus scan →
    * broadcast join → native cosine. One definition under [[probe]],
    * [[probeRange]] and the ingest lane's [[probeWith]].
    */
  private def scoredProbeJoin(s: SparkSession, indexDir: String, queries: DataFrame,
      extraCorpus: Option[DataFrame], nprobe: Int): DataFrame = {
    val centers = loadCenters(s, indexDir)
    val qs = queries
      .withColumn("probes",
        slice(Similarity.sortedScoredCells(col("qe"), centers), 1, nprobe))
      .withColumn("cell", explode(expr("transform(probes, s -> -s.negcell)")))
      .drop("probes")
    // the union of all queries' probe cells, driver-computed from the model
    // (bounded by k) — NOT from the corpus
    val probedCells: Seq[Int] = qs.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val base = s.read.parquet(s"$indexDir/corpus")
      .select(col("cell"), col("vec_id"), col("embedding"))
    val corpus = extraCorpus.fold(base)(base.unionByName(_))
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    corpus.join(broadcast(qs), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cs", VectorOps.cosine(col("qe"), col("ne")))
  }
}
