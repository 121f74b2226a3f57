package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ETL: dirty CSV in → clean partitioned parquet out. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("pipeline ingests dirty csv, cleans, dedupes, publishes partitioned") {
    val rawDir = Files.createTempDirectory("graft-raw").toString
    val outDir = Files.createTempDirectory("graft-pub").toString

    // export real events as CSV, then inject dirt: duplicates, a negative
    // value, a bad event_type casing, and an unparseable row
    val events = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").option("header", "true").csv(rawDir)
    val extra = Seq(
      """9999999,2024-01-15T00:00:00.000Z,1,PURCHASE,-5.0,"{}"""",   // casing + negative value
      """9999998,2024-01-15T00:00:00.000Z,2,wat,1.0,"{}"""",        // invalid type → dropped
      """not-a-number,2024-01-15T00:00:00.000Z,3,click,1.0,"{}"""") // corrupt → quarantined
    Files.write(java.nio.file.Paths.get(s"$rawDir/extra.csv"),
      ("event_id,ts,user_id,event_type,value,props\n" + extra.mkString("\n")).getBytes)
    // duplicate delivery of the first 50 events
    events.limit(50).write.mode("append").option("header", "true").csv(rawDir)

    val published = Pipeline.run(spark, rawDir, outDir)
    val nEvents = events.count()

    // duplicates collapsed, invalid/corrupt dropped, casing+clamp applied
    assert(published.count() == nEvents + 1) // +1 = the fixed-up PURCHASE row
    assert(published.select("event_id").distinct().count() == nEvents + 1)
    val fixed = published.filter(col("event_id") === 9999999L).head()
    assert(fixed.getAs[String]("event_type") == "purchase")
    assert(fixed.getAs[Double]("value") == 0.0)
    // published layout is date-partitioned and prunable
    val pruned = published.filter(col("event_date") === "2024-01-15")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"), plan)
    assert(pruned.count() >= 1)
  }

  test("normalize unions heterogeneous vendor feeds into the canonical schema") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // vendor A: canonical-ish names but string-typed ids/timestamps
    val va = Seq(
      ("1", "2024-01-01 10:00:00", "7", "CLICK", "2.5", "{}"),
      ("2", "2024-01-01 11:00:00", "8", "view", "1.0", "{}"))
      .toDF("evt", "evt_time", "uid", "kind", "amount", "extra")
    val ma = Pipeline.VendorMapping("vendor_a", Map(
      "event_id"   -> col("evt"),
      "ts"         -> col("evt_time"),
      "user_id"    -> col("uid"),
      "event_type" -> lower(col("kind")),
      "value"      -> col("amount"),
      "props"      -> col("extra")))
    // vendor B: different names again, and NO value/props columns at all
    val vb = Seq((10L, java.sql.Timestamp.valueOf("2024-02-01 09:00:00"), 9L, "purchase"))
      .toDF("id", "when_ts", "account", "action")
    val mb = Pipeline.VendorMapping("vendor_b", Map(
      "event_id"   -> col("id"),
      "ts"         -> col("when_ts"),
      "user_id"    -> col("account"),
      "event_type" -> col("action")))

    val out = Pipeline.normalize(Seq(va -> ma, vb -> mb))
    // exact canonical schema + lineage, in declaration order
    assert(out.columns.toSeq ==
      Pipeline.canonicalFields.map(_._1) :+ "ingest_vendor")
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("event_id") == LongType && types("ts") == TimestampType &&
      types("user_id") == LongType && types("value") == DoubleType)
    assert(out.count() == 3)
    // vendor A strings were cast to the canonical types
    val a1 = out.filter(col("event_id") === 1L).head()
    assert(a1.getAs[Long]("user_id") == 7L && a1.getAs[Double]("value") == 2.5 &&
      a1.getAs[String]("event_type") == "click" &&
      a1.getAs[String]("ingest_vendor") == "vendor_a")
    // vendor B's unmapped canonical columns are typed nulls, not missing
    val b = out.filter(col("ingest_vendor") === "vendor_b").head()
    assert(b.isNullAt(b.fieldIndex("value")) && b.isNullAt(b.fieldIndex("props")))
    assert(b.getAs[Long]("event_id") == 10L)
  }

  test("publishIncremental rewrites only the partitions present in the new frame") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-incr").toString
    def mkDay(day: String, ids: Seq[Long], v: Double) =
      ids.toDF("event_id")
        .withColumn("value", lit(v))
        .withColumn("event_date", to_date(lit(day)))
    // initial publish: day A (3 rows) + day B (2 rows)
    Pipeline.publishIncremental(
      mkDay("2024-03-01", Seq(1L, 2L, 3L), 1.0)
        .unionByName(mkDay("2024-03-02", Seq(4L, 5L), 1.0)), outDir)
    val filesA0 = new java.io.File(s"$outDir/event_date=2024-03-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq

    // incremental refresh: ONLY day B, with different content (1 row, v=9)
    Pipeline.publishIncremental(mkDay("2024-03-02", Seq(6L), 9.0), outDir)

    val back = spark.read.parquet(outDir)
    // day A untouched: same rows, same files on disk
    assert(back.filter(col("event_date") === "2024-03-01").count() == 3)
    val filesA1 = new java.io.File(s"$outDir/event_date=2024-03-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq
    assert(filesA1 == filesA0, "day A partition files were rewritten")
    // day B replaced (not appended): exactly the new row
    val dayB = back.filter(col("event_date") === "2024-03-02").collect()
    assert(dayB.length == 1 && dayB.head.getAs[Long]("event_id") == 6L &&
      dayB.head.getAs[Double]("value") == 9.0)
  }

  test("manifest reconciles per-partition counts and stat bounds with the published data") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-manifest").toString
    def mkDay(day: String, ids: Seq[Long], v: Double) =
      ids.toDF("event_id")
        .withColumn("value", lit(v))
        .withColumn("event_date", to_date(lit(day)))
    Pipeline.publishIncremental(
      mkDay("2024-03-01", Seq(1L, 2L, 3L), 1.5)
        .unionByName(mkDay("2024-03-02", Seq(9L, 4L), 7.0)), outDir)
    val m = Pipeline.manifest(spark, outDir, Seq("event_id", "value"))
      .collect().map(r => r.getAs[java.sql.Date]("event_date").toString -> r).toMap
    assert(m.keySet == Set("2024-03-01", "2024-03-02"))
    val a = m("2024-03-01")
    assert(a.getAs[Long]("n_rows") == 3 && a.getAs[Long]("event_id_min") == 1L &&
      a.getAs[Long]("event_id_max") == 3L && a.getAs[Double]("value_min") == 1.5)
    val b = m("2024-03-02")
    assert(b.getAs[Long]("n_rows") == 2 && b.getAs[Long]("event_id_min") == 4L &&
      b.getAs[Long]("event_id_max") == 9L && b.getAs[Double]("value_max") == 7.0)
    // the manifest answers pruning questions without touching data: the
    // partitions whose [min,max] admit event_id=2 are exactly day A
    val admitting = m.filter { case (_, r) =>
      r.getAs[Long]("event_id_min") <= 2L && 2L <= r.getAs[Long]("event_id_max")
    }.keySet
    assert(admitting == Set("2024-03-01"))
  }

  test("compact collapses fragmented partitions without changing the data") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-compact").toString
    // fragment: 8 separate appends of the same two days → ≥8 files per day
    val day = to_date(lit("2024-05-01"))
    (1 to 8).foreach { i =>
      Seq((i.toLong, 1.0)).toDF("event_id", "value")
        .withColumn("event_date", day)
        .unionByName(Seq((100L + i, 2.0)).toDF("event_id", "value")
          .withColumn("event_date", to_date(lit("2024-05-02"))))
        .repartition(4)
        .write.mode("append").partitionBy("event_date").parquet(outDir)
    }
    def files(day: String) = new java.io.File(s"$outDir/event_date=$day")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = spark.read.parquet(outDir).orderBy("event_id").collect().toSeq
    assert(files("2024-05-01") >= 8)

    Pipeline.compact(spark, outDir, filesPerPartition = 1)

    assert(files("2024-05-01") == 1 && files("2024-05-02") == 1,
      s"files after compact: ${files("2024-05-01")}/${files("2024-05-02")}")
    val after = spark.read.parquet(outDir).orderBy("event_id").collect().toSeq
    assert(after == before)
    // no leftover swap dirs
    assert(!new java.io.File(s"$outDir.compacting").exists())
    assert(!new java.io.File(s"$outDir.old").exists())
  }

  test("compact bounds files per partition by the requested fan-out") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-compact2").toString
    (1 to 6).foreach { i =>
      (i * 100 to i * 100 + 20).map(_.toLong).toDF("event_id")
        .withColumn("value", lit(1.0))
        .withColumn("event_date", to_date(lit("2024-06-01")))
        .repartition(4)
        .write.mode("append").partitionBy("event_date").parquet(outDir)
    }
    val before = spark.read.parquet(outDir).orderBy("event_id").collect().toSeq
    Pipeline.compact(spark, outDir, filesPerPartition = 2)
    val n = new java.io.File(s"$outDir/event_date=2024-06-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(n >= 1 && n <= 2, s"expected <=2 files, got $n")
    assert(spark.read.parquet(outDir).orderBy("event_id").collect().toSeq == before)
  }

  test("schema evolution: later batches with new columns merge on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, 10.0)).toDF("event_id", "value").write.mode("append").parquet(dir)
    // a later vendor adds a column — old files simply lack it
    Seq((2L, 20.0, "web")).toDF("event_id", "value", "channel")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("event_id", "value", "channel"))
    val r1 = merged.filter(col("event_id") === 1L).head()
    assert(r1.isNullAt(r1.fieldIndex("channel"))) // typed null for old rows
    assert(merged.filter(col("event_id") === 2L).head()
      .getAs[String]("channel") == "web")
  }

  test("cleanAudit counters reconcile exactly with clean()'s row delta") {
    val rawDir = Files.createTempDirectory("graft-audit").toString
    val rows = Seq(
      """1,2024-01-01T00:00:00.000Z,1,click,1.0,"{}"""",      // clean
      """2,2024-01-01T00:00:00.000Z,2,VIEW,-3.0,"{}"""",      // clamped
      """3,2024-01-01T00:00:00.000Z,3,wat,1.0,"{}"""",        // bad type
      """4,2024-01-01T00:00:00.000Z,4,,1.0,"{}"""",           // NULL type → bad type
      """5,2024-01-01T00:00:00.000Z,,click,1.0,"{}"""",       // null required
      """oops,2024-01-01T00:00:00.000Z,6,click,1.0,"{}"""")   // corrupt
    Files.write(java.nio.file.Paths.get(s"$rawDir/audit.csv"),
      ("event_id,ts,user_id,event_type,value,props\n" + rows.mkString("\n")).getBytes)

    val raw = Pipeline.ingestCsv(spark, rawDir)
    val a = Pipeline.cleanAudit(raw).head()
    assert(a.getAs[Long]("n_raw") == 6)
    assert(a.getAs[Long]("n_corrupt") == 1)
    assert(a.getAs[Long]("n_null_required") == 1)
    assert(a.getAs[Long]("n_bad_event_type") == 2) // 'wat' AND the NULL event_type
    assert(a.getAs[Long]("n_value_clamped") == 1)
    assert(a.getAs[Long]("n_published") == 2)
    // the audit's published count IS clean's output count, and the drop
    // categories partition the raw input exactly
    assert(a.getAs[Long]("n_published") == Pipeline.clean(raw).count())
    assert(a.getAs[Long]("n_corrupt") + a.getAs[Long]("n_null_required") +
      a.getAs[Long]("n_bad_event_type") + a.getAs[Long]("n_published") ==
      a.getAs[Long]("n_raw"))
  }
}
