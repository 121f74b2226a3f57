package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** H-block: source/sink round-trips and partitioned layout behavior. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val li = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("csv round-trip preserves data with explicit schema") {
    val dir = tmp("csv")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(li.schema).csv(dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0)
  }

  test("json round-trip preserves data") {
    val dir = tmp("json")
    li.write.mode("overwrite").json(dir)
    val back = spark.read.schema(li.schema).json(dir)
    assert(back.exceptAll(li).count() == 0)
  }

  test("orc round-trip preserves data") {
    val dir = tmp("orc")
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(li).count() == 0)
  }

  test("binaryFile source ingests raw payload files for the multimodal path") {
    // the ingest format for image/audio corpora: whole files as rows of
    // (path, modificationTime, length, content) — the front door of the
    // F-block, whose operators all consume opaque binary columns
    val dir = tmp("binfile")
    val payloads = Map("a.pgm" -> Array[Byte](0x50, 0x35, 0x0A, 0x01, 0x02),
                       "b.pgm" -> Array[Byte](0x50, 0x35, 0x0A, 0x7F),
                       "skip.txt" -> Array[Byte](0x00))
    payloads.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(dir, name), bytes) }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pgm") // format-level filtering at the source
      .load(dir)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val back = df.select(col("path"), col("length"), col("content")).collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1), r.getAs[Array[Byte]](2)))
    assert(back.map(_._1).toSet == Set("a.pgm", "b.pgm"), "glob filter must skip .txt")
    for ((name, len, content) <- back) {
      assert(content.sameElements(payloads(name)), s"$name content mismatch")
      assert(len == payloads(name).length.toLong)
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    // partition pruning: the scan must carry a PartitionFilters entry on
    // the partition column (inputFiles does not reflect pruning)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"), plan)
    assert(pruned.count() == li.filter(col("l_returnflag") === "R").count())
  }

  test("text source round-trips lines for the raw-corpus ingest path") {
    val dir = tmp("text")
    val docs = Tables.documents(spark, sf).select(col("text"))
    docs.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.count() == docs.count())
    // line-per-row semantics: the multiset of lines survives
    assert(back.select(col("value")).exceptAll(docs).isEmpty &&
      docs.exceptAll(back.select(col("value"))).isEmpty)
  }

  test("dynamic partition pruning: a filtered dim join prunes the fact scan at runtime") {
    val dir = tmp("dpp")
    // fact partitioned by day; dim maps day -> label with a selective filter
    val fact = Tables.events(spark, sf)
      .withColumn("day", expr("unix_micros(ts) DIV 86400000000"))
    fact.write.mode("overwrite").partitionBy("day").parquet(dir)
    val s = spark
    import s.implicits._
    val days = fact.select("day").distinct().collect().map(_.getLong(0)).sorted
    // the dim must be a FILE source: a LocalRelation's filter constant-folds
    // away and DPP's selectivity check sees no predicate; day is written as
    // INT to match the re-inferred partition-column type (a cast on the
    // partition key would also defeat the pruning rule)
    val dimDir = tmp("dpp-dim")
    days.map(d => (d.toInt, if (d == days.head) "keep" else "drop"))
      .toSeq.toDF("day", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).filter(col("tag") === "keep"), "day")
    val plan = joined.queryExecution.executedPlan.toString
    // the fact side must carry a dynamicpruning subquery on the partition
    // column — Spark's runtime answer to "only read the dim's days"
    assert(plan.contains("dynamicpruning"), plan)
    assert(joined.count() ==
      fact.filter(col("day") === days.head).count())
  }
}
