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
}
