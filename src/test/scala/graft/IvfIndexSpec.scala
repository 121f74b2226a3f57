package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, Similarity}

/** Persisted IVF index: cell-partitioned layout, pruned probes, parity with
  * the in-memory q48 path.
  */
class IvfIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val indexDir: String = {
    val d = Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(spark, sf, d, k = 16, iters = 3)
    d
  }

  private def queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  test("index layout is partitioned by cell with the model persisted") {
    val cells = new java.io.File(s"$indexDir/corpus").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cells.length > 1, s"expected multiple cell partitions, got ${cells.toSeq}")
    val centers = spark.read.parquet(s"$indexDir/centers")
    assert(centers.count() == 16)
    assert(centers.schema.fieldNames.toSet == Set("cell", "centroid"))
  }

  test("probe scan carries a cell partition filter (partition-pruned read)") {
    val probed = IvfIndex.probe(spark, indexDir, queries, nprobe = 1)
    val plan = probed.queryExecution.executedPlan.toString
    // the corpus scan (not the un-partitioned queries scan) must carry a
    // non-empty partition filter on `cell`: nprobe=1 over 5 queries touches
    // at most 5 of the 16 cell partitions
    val cellFilter = "(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"
    assert(plan.matches(cellFilter), plan)
    assert(probed.count() > 0)
  }

  test("persisted probe is row-identical to the in-memory q48 at the same nprobe") {
    // both paths share the memoized quantizer for (sf, k=16, iters=3), so
    // cell assignments agree and results must match exactly
    val fromIndex = IvfIndex.probe(spark, indexDir, queries, nprobe = 8)
    val inMemory = Similarity.q48KnnIvf(spark, sf, k = 16, nprobe = 8, iters = 3)
    assert(fromIndex.exceptAll(inMemory).count() == 0 &&
      inMemory.exceptAll(fromIndex).count() == 0)
  }

  test("quantizer is trained once and memoized across calls") {
    val a = Similarity.kmeansCentroids(spark, sf, k = 16, iters = 3)
    val b = Similarity.kmeansCentroids(spark, sf, k = 16, iters = 3)
    assert(a eq b, "memoized centroids should be the same instance")
  }

  test("appendBatch serves new vectors without retraining and touches only their cells") {
    val d = Files.createTempDirectory("graft-ivf-append").toString
    IvfIndex.build(spark, sf, d, k = 16, iters = 3)
    def filesPerCell(): Map[String, Int] = {
      val root = new java.io.File(s"$d/corpus")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(f => f.getName -> f.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    val before = filesPerCell()
    // the batch: clones of two resident vectors under fresh ids — their own
    // nearest neighbors by construction, so a probe MUST surface them
    val batch = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(3L, 7L))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
        col("label"))
    IvfIndex.appendBatch(spark, d, batch)
    val after = filesPerCell()
    val touched = after.filter { case (c, n) => before.getOrElse(c, 0) != n }
    assert(touched.nonEmpty && touched.size <= 2,
      s"append must only add files to the batch's own cells: $touched")
    assert((before.keySet -- after.keySet).isEmpty, "no resident cell may vanish")
    val res = IvfIndex.probe(spark, d,
      Tables.embeddings(spark, sf).filter(col("vec_id").isin(3L, 7L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      .filter(col("rnk") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(res == Map(3L -> 1000003L, 7L -> 1000007L),
      s"appended clones must be the top-1 neighbors of their originals: $res")
  }

  test("q195 IVF balance: k rows incl. empty cells, accounting identities hold at sf0.001") {
    val k = 16
    val df = Similarity.q195IvfBalance(spark, sf, k = k).collect()
    assert(df.length == k) // every cell reported, empty ones as 0
    assert(df.map(_.getAs[Long]("cell")).sorted.toSeq == (0L until k.toLong))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(df.map(_.getAs[Long]("n_vecs")).sum == total)
    val hot = df.map(_.getAs[Long]("share_bp")).max
    df.foreach { r =>
      assert(r.getAs[Long]("ideal_bp") == 10000L / k)
      assert(r.getAs[Long]("hottest_bp") == hot) // hottest = max share, every row
      assert(r.getAs[Long]("share_bp") <= 10000L)
    }
    // integer-floor shares sum to ≤ 10000, within k rounding steps of it
    val shareSum = df.map(_.getAs[Long]("share_bp")).sum
    assert(shareSum <= 10000L && shareSum > 10000L - k)
  }

  test("q195 skew gate: fires on a planted 90/10 corpus, silent on a balanced one") {
    import spark.implicits._
    // four well-separated axis centroids; vectors land exactly on them
    val centers = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    def vecsAt(cellOf: Int => Int, n: Int) =
      (0 until n).map(i => (i.toLong, centers(cellOf(i)).map(_.toFloat).toSeq))
        .toDF("vec_id", "embedding")
    // skewed: 90% of vectors in cell 0 — hottest share 9000 bp > 2×2500
    val skewed = Similarity.ivfBalanceOf(vecsAt(i => if (i < 90) 0 else i % 4, 100), centers)
      .collect()
    assert(skewed.forall(_.getAs[Boolean]("rebalance_recommended")))
    assert(skewed.map(_.getAs[Long]("hottest_bp")).head >= 9000L)
    // balanced: 25 per cell — every share at the ideal, gate silent
    val balanced = Similarity.ivfBalanceOf(vecsAt(_ % 4, 100), centers).collect()
    assert(balanced.forall(!_.getAs[Boolean]("rebalance_recommended")))
    assert(balanced.forall(_.getAs[Long]("share_bp") == 2500L))
    // collapsed-centroid symptom: a corpus missing cell 3 reports it empty
    val gap = Similarity.ivfBalanceOf(vecsAt(_ % 3, 99), centers).collect()
    assert(gap.count(_.getAs[Long]("n_vecs") == 0L) == 1)
  }

  test("probeRange: full cell coverage equals the exact brute radius sweep; nprobe=8 recall floor holds") {
    val minCos = 0.35
    // exact radius sets, driver-side brute force over the whole corpus
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val qids = all.keys.filter(_ % 100 == 0).toSeq.sorted
    val exact = qids.map { q =>
      q -> all.filter { case (id, v) =>
        // same post-round bar as the operator (6-dp round then >=)
        id != q && BigDecimal(cos(all(q), v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= minCos
      }.keySet
    }.toMap
    // full coverage: nprobe = k probes every cell -> the range result IS
    // the exact radius set
    val full = IvfIndex.probeRange(spark, indexDir, queries, minCos, nprobe = 16)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    qids.foreach { q =>
      assert(full.getOrElse(q, Set.empty) == exact(q), s"query $q full-coverage set")
    }
    // pruned: every returned neighbor is genuinely in-radius (no false
    // positives — pruning can only MISS), and recall clears the q48 floor
    val pruned = IvfIndex.probeRange(spark, indexDir, queries, minCos, nprobe = 8)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    qids.foreach { q =>
      assert(pruned.getOrElse(q, Set.empty).subsetOf(exact(q)), s"query $q false positive")
    }
    val (hit, want) = qids.map(q =>
      (pruned.getOrElse(q, Set.empty).intersect(exact(q)).size, exact(q).size))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(want > 0, "radius bar too tight for the spec corpus")
    assert(hit.toDouble / want >= 0.8, s"range recall $hit/$want under the floor")
    // rnk is the deterministic (cos desc, id asc) order within each query
    val rows = IvfIndex.probeRange(spark, indexDir, queries, minCos, nprobe = 8)
      .collect().groupBy(_.getAs[Long]("query_id"))
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(r => (-r.getAs[Double]("cos_sim"), r.getAs[Long]("neighbor_id")))
        .map(_.getAs[Long]("neighbor_id")).toSeq
      val byRnk = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("neighbor_id")).toSeq
      // cos_sim is 4-dp rounded for display; rnk was assigned on the 6-dp
      // key, so equal-4dp neighbors may interleave — check rnk is a
      // permutation 1..n and the 4-dp scores are non-increasing by rnk
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length),
        "rnk must be a dense 1..n permutation")
      val scoresByRnk = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos_sim")).toSeq
      assert(scoresByRnk.zip(scoresByRnk.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rnk")
      assert(sorted.toSet == byRnk.toSet)
    }
  }
}
