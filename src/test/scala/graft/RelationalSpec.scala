package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  // queries that may legitimately return zero rows at sf0.001
  private val mayBeEmpty = Set("q02_filter_project", "q03_join_agg", "q11_anti_join", "q16_having",
    "q28_dedup_exact", "q29_dedup_minhash", "q31_ngram_jaccard", "q32_dedup_embedding",
    "q199_containment", "q56_dedup_clusters", "q58_decontaminate", "q69_dedup_simhash_pairs",
    "q143_linkage_pairs", // 200 parts at sf0.001 → (brand, head) blocks of ~1
    "q197_image_phash_pairs", // distinct synth sides/content → pairs only when planted
    "q198_audio_fp_pairs", // distinct synth lengths/content → pairs only when planted
    "q193_dup_family_dist", // derives from q56's (possibly empty) clusters
    "q273_near_dup_shardability") // same cluster derivation as q193

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      // column names must be distinct (the driver hashes by sorted name)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"duplicate columns in $name")
    }
  }

  test("q01 pricing summary values are sane") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length >= 3) // at least 3 (flag,status) combos
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 2000 && total <= 6000) // shipdate filter keeps ~54% of 6000
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
