package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZoneMap

/** Zone-map file skipping: a range-clustered layout + per-file manifest
  * must answer selective range queries reading a strict subset of files,
  * with results identical to the full scan.
  */
class ZoneMapSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val laidOut: String = {
    val dir = Files.createTempDirectory("graft-zonemap").toString + "/orders"
    // the write-clustering half: range-partition by the stat column so
    // each of the 8 files owns a tight cents interval (q119's layout idea
    // on one dimension)
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .repartitionByRange(8, col("cents"))
      .sortWithinPartitions(col("cents"))
      .write.parquet(dir)
    ZoneMap.build(spark, dir, Seq("cents"))
    dir
  }

  test("selective range reads a strict subset of files, same rows as the full scan") {
    val all = spark.read.parquet(laidOut)
    val (lo, hi) = (2000000L, 4000000L)
    val (pruned, kept, total) = ZoneMap.scanRange(spark, laidOut, "cents", lo, hi)
    assert(total == 8, s"expected 8 data files, zone map has $total")
    assert(kept < total, s"selective range kept all $total files — no skipping")
    assert(kept > 0)
    val expect = all.filter(col("cents").between(lo, hi))
    assert(pruned.exceptAll(expect).count() == 0 && expect.exceptAll(pruned).count() == 0)
  }

  test("covering range keeps every file; disjoint range reads none") {
    val (_, keptAll, total) = ZoneMap.scanRange(spark, laidOut, "cents", 0L, Long.MaxValue)
    assert(keptAll == total)
    val (empty, keptNone, _) = ZoneMap.scanRange(spark, laidOut, "cents",
      Long.MaxValue - 10, Long.MaxValue)
    assert(keptNone == 0)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.contains("cents")) // schema preserved when empty
  }

  test("zone pruning is a superset guarantee: kept files still row-filter") {
    // a range inside ONE file's envelope: rows outside [lo, hi] in that
    // file must still be filtered out row-level
    val zm = spark.read.parquet(s"$laidOut/_zonemap").orderBy(col("cents_min")).collect()
    val mid = zm(zm.length / 2)
    val (lo, hi) = (mid.getAs[Long]("cents_min") + 1, mid.getAs[Long]("cents_max") - 1)
    assume(lo < hi)
    val (pruned, _, _) = ZoneMap.scanRange(spark, laidOut, "cents", lo, hi)
    assert(pruned.filter(col("cents") < lo || col("cents") > hi).count() == 0)
  }

  test("oversized candidate set falls back to a directory scan, results identical") {
    // maxCandidateFiles below the surviving count: the driver must not
    // collect the list; the scan reverts to the plain directory read with
    // the row predicate (identical rows, skipping disabled)
    spark.conf.set("graft.zonemap.maxCandidateFiles", "1")
    try {
      val (lo, hi) = (0L, Long.MaxValue)
      val (df, kept, total) = ZoneMap.scanRange(spark, laidOut, "cents", lo, hi)
      assert(kept.toLong == total, "every file survives a covering range")
      val expect = spark.read.parquet(laidOut).filter(col("cents").between(lo, hi))
      assert(df.exceptAll(expect).count() == 0 && expect.exceptAll(df).count() == 0)
    } finally spark.conf.unset("graft.zonemap.maxCandidateFiles")
  }
}
