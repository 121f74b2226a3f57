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
}
