package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, Similarity}

/** IVF×PQ composed persisted index: cell-partitioned CODE layout beside the
  * float layout, partition-pruned ADC probe + exact re-rank, incremental
  * append — the production ANN serving shape composed from q48 (IVF cells)
  * and q134 (PQ/ADC), sharing their one-definition kernels.
  */
class IvfPqIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"

  private lazy val indexDir: String = {
    val d = Files.createTempDirectory("graft-ivfpq").toString
    IvfIndex.buildPq(spark, sf, d, k = 16, iters = 3)
    d
  }

  private def queriesOf(dir: String) = Tables.embeddings(spark, dir)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

  private def recallVsExact(approx: org.apache.spark.sql.DataFrame,
                            dir: String): Double = {
    val exact = neighborSets(Similarity.q33KnnBrute(spark, dir))
    val ap = neighborSets(approx)
    val rs = exact.map { case (q, ex) =>
      ap.get(q).map(a => (a & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    rs.sum / rs.size
  }

  test("composed layout: floats AND codes partitioned by cell, both models persisted") {
    def cellDirs(sub: String) = new java.io.File(s"$indexDir/$sub").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    val fCells = cellDirs("corpus")
    val cCells = cellDirs("pqcodes")
    assert(fCells.size > 1 && cCells == fCells,
      s"code partitions must mirror float partitions: $cCells vs $fCells")
    assert(spark.read.parquet(s"$indexDir/centers").count() == 16)
    val books = spark.read.parquet(s"$indexDir/books")
    assert(books.count() == Similarity.PqM.toLong * Similarity.PqK)
    // every (vec_id, cell) of the float layout has exactly one code row in
    // the SAME cell — the two sides are projections of one assignment
    val f = spark.read.parquet(s"$indexDir/corpus").select("vec_id", "cell")
    val c = spark.read.parquet(s"$indexDir/pqcodes").select("vec_id", "cell")
    assert(f.exceptAll(c).count() == 0 && c.exceptAll(f).count() == 0)
    // codes are well-formed: m per vector, each in [0, pqK)
    val codes = spark.read.parquet(s"$indexDir/pqcodes")
    assert(codes.filter(size(col("codes")) =!= Similarity.PqM).count() == 0)
    assert(codes.filter(exists(col("codes"),
      x => x < 0 || x >= Similarity.PqK)).count() == 0)
  }

  test("probePq: BOTH scans carry cell partition filters; ADC side never reads floats") {
    val probed = IvfIndex.probePq(spark, indexDir, queriesOf(sf), nprobe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    // two partition-pruned file scans: the pqcodes ADC scan and the
    // corpus float re-rank scan — each restricted to the probed cells
    val scans = "PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r
      .findAllIn(plan).length
    assert(scans >= 2, s"expected both scans partition-pruned, plan:\n$plan")
    // the ADC shortlist stage reads codes, not embeddings: the pqcodes
    // scan's ReadSchema must not contain the float vector column
    val pqScan = plan.linesIterator.filter(_.contains("pqcodes")).mkString("\n")
    assert(pqScan.nonEmpty && !pqScan.contains("embedding"),
      s"ADC scan must be code-only:\n$pqScan")
    assert(probed.count() > 0)
  }

  test("full coverage is EXACT: nprobe=k + corpus-wide shortlist equals q33 brute force") {
    // nprobe=16 probes every cell and the shortlist exceeds the corpus, so
    // the exact re-rank sees every candidate — the composed path must
    // reproduce the brute-force rows bit-for-bit (the q257 anchor rule)
    val full = IvfIndex.probePq(spark, indexDir, queriesOf(sf),
      nprobe = 16, shortlist = 1000000)
    val exact = Similarity.q33KnnBrute(spark, sf)
    assert(full.exceptAll(exact).count() == 0 && exact.exceptAll(full).count() == 0)
  }

  test("recall@5 at sf0.01 meets the q48 floor at the q48 operating point") {
    val d = Files.createTempDirectory("graft-ivfpq01").toString
    IvfIndex.buildPq(spark, sf01, d, k = 16, iters = 3)
    val r = recallVsExact(IvfIndex.probePq(spark, d, queriesOf(sf01), nprobe = 8), sf01)
    // same deterministic query sample (vec_id % 100 == 0) and the same
    // floor the q48/q257 specs pin for nprobe=8 — the PQ stage's loss is
    // absorbed by the exact re-rank (the shortlist-depth lever)
    assert(r >= 0.8, s"IVF×PQ recall@5 = $r < 0.8")
    info(s"IVF×PQ recall@5 sf0.01 nprobe=8 = $r")
  }

  test("appendBatchPq: floats and codes both append, only the batch's cells touched, clone retrievable") {
    val d = Files.createTempDirectory("graft-ivfpq-append").toString
    IvfIndex.buildPq(spark, sf, d, k = 16, iters = 3)
    def filesPerCell(sub: String): Map[String, Int] = {
      new java.io.File(s"$d/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(f => f.getName -> f.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    val (fb, cb) = (filesPerCell("corpus"), filesPerCell("pqcodes"))
    val batch = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(3L, 7L))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"), col("label"))
    IvfIndex.appendBatchPq(spark, d, batch)
    val (fa, ca) = (filesPerCell("corpus"), filesPerCell("pqcodes"))
    val fTouched = fa.filter { case (k2, n) => fb.getOrElse(k2, 0) != n }.keySet
    val cTouched = ca.filter { case (k2, n) => cb.getOrElse(k2, 0) != n }.keySet
    assert(fTouched.nonEmpty && fTouched.size <= 2 && cTouched == fTouched,
      s"float/code appends must touch the same (batch-only) cells: $fTouched vs $cTouched")
    // a clone is its original's nearest neighbor by construction, and its
    // PQ codes equal the original's (same embedding, same frozen books) —
    // the composed probe must surface it at rank 1
    val res = IvfIndex.probePq(spark, d,
      Tables.embeddings(spark, sf).filter(col("vec_id").isin(3L, 7L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      .filter(col("rnk") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(res == Map(3L -> 1000003L, 7L -> 1000007L),
      s"appended clones must be top-1 for their originals: $res")
  }

  test("wrong-dimension batch is rejected before any file lands (both layouts intact)") {
    val d = Files.createTempDirectory("graft-ivfpq-dim").toString
    IvfIndex.buildPq(spark, sf, d, k = 16, iters = 3)
    import spark.implicits._
    val nCodesBefore = spark.read.parquet(s"$d/pqcodes").count()
    val bad = Seq((9999999L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      IvfIndex.appendBatchPq(spark, d, bad)
    }
    assert(spark.read.parquet(s"$d/pqcodes").count() == nCodesBefore)
    assert(spark.read.parquet(s"$d/corpus")
      .filter(col("vec_id") === 9999999L).count() == 0)
  }
}
