package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MinHash, MinHashAgg}
import graft.plans.GraftExtensions

/** The native long[k]-buffer minhash aggregate: bit-equality with the
  * composed k-separate-min form it replaces, merge correctness across
  * forced partitionings, serialization, and the SQL registration.
  */
class MinHashSpec extends AnyFunSuite {
  import TestSpark._

  private val K = 16

  private def shingles = Tables.documents(spark, sf)
    .select(col("source"), explode(split(col("text"), " ")).as("g"))

  test("native minhash is bit-identical to the composed min(xxhash64(lit(i), g)) form") {
    val native = shingles.groupBy("source")
      .agg(MinHash.minhash(col("g"), K).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val aggs = (0 until K).map(i => min(xxhash64(lit(i), col("g"))).as(s"h$i"))
    val composed = shingles.groupBy("source")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) ->
        (1 to K).map(r.getLong).toVector).toMap
    assert(native == composed,
      "the native aggregate must reproduce the composed form exactly")
  }

  test("native minhash over LONG inputs matches the composed form (the q49 shape)") {
    val hashed = shingles.withColumn("h0", xxhash64(col("g"))).drop("g")
    val native = hashed.groupBy("source")
      .agg(MinHash.minhash(col("h0"), K).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val aggs = (0 until K).map(i => min(xxhash64(lit(i), col("h0"))).as(s"h$i"))
    val composed = hashed.groupBy("source")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) ->
        (1 to K).map(r.getLong).toVector).toMap
    assert(native == composed)
  }

  test("NULL inputs contribute the seed itself, exactly like the composed form") {
    val s = spark
    import s.implicits._
    // group 'a' mixes nulls in; group 'b' is ALL null — both must match
    // the composed form (nulls fold to the unchanged seed accumulator)
    val df = Seq(("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", None), ("b", None)).toDF("grp", "v")
    val native = df.groupBy("grp")
      .agg(MinHash.minhash(col("v"), K).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val aggs = (0 until K).map(i => min(xxhash64(lit(i), col("v"))).as(s"h$i"))
    val composed = df.groupBy("grp")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) ->
        (1 to K).map(r.getLong).toVector).toMap
    assert(native == composed)
    assert(!native("b").contains(Long.MaxValue),
      "the all-null group must not leak the MaxValue sentinel")
  }

  test("signature is partitioning-invariant (merge is an elementwise-min monoid)") {
    val one = shingles.coalesce(1).groupBy("source")
      .agg(MinHash.minhash(col("g"), K).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val many = shingles.repartition(13).groupBy("source")
      .agg(MinHash.minhash(col("g"), K).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    assert(one == many)
  }

  test("serialization round-trips the buffer") {
    val agg = MinHashAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), K)
    val b = agg.createAggregationBuffer()
    b(0) = -42L; b(K - 1) = 7L
    assert(agg.deserialize(agg.serialize(b)).toSeq == b.toSeq)
  }

  test("graft_minhash is SQL-callable with a validated builder") {
    GraftExtensions.register(spark)
    shingles.createOrReplaceTempView("mh_shingles")
    val viaSql = spark.sql(
      s"SELECT source, graft_minhash(g, $K) AS sig FROM mh_shingles GROUP BY source")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val viaApi = shingles.groupBy("source")
      .agg(MinHash.minhash(col("g"), K).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    assert(viaSql == viaApi)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(g, source) FROM mh_shingles").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }
}
