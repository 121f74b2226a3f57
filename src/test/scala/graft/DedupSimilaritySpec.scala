package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Property checks for the rows-only (non-oracle) dedup/similarity ops. */
class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark._

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

  private def meanRecallVsExact(approx: org.apache.spark.sql.DataFrame): Double = {
    val exact = neighborSets(Similarity.q33KnnBrute(spark, sf))
    val ap = neighborSets(approx)
    val recalls = exact.map { case (q, ex) =>
      ap.get(q).map(a => (a & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("q48 IVF recall vs q33 exact baseline is nonzero") {
    assert(meanRecallVsExact(Similarity.q48KnnIvf(spark, sf)) > 0.0)
  }

  test("q34 LSH recall vs q33 exact baseline is nonzero") {
    assert(meanRecallVsExact(Similarity.q34KnnLsh(spark, sf)) > 0.0)
  }
}
