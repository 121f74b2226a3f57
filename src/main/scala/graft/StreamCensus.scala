package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming scale-census main (dev tool, the StageCensus of the
  * streaming path): drives the s28 maintained-daily-table monitor over a
  * replica-scaled events table through a REAL file stream
  * (maxFilesPerTrigger=1 → one micro-batch per file) and prints one JSON
  * line per batch — batch wall ms, fragment cells touched, maintained
  * cells after the merge, and the per-trigger estimator-derive ms
  * (q301's changepoint off the maintained table, the monitor contract).
  *
  * What it measures: the s25/s28 state architecture's central claim —
  * per-batch cost is O(fragment + calendar-bounded table), NOT O(event
  * history): the maintained (event_type, day, n) table converges to
  * |types| × |days| cells no matter how many replicas stream in, so
  * batch wall must stay FLAT as the table ages. A cost line that grows
  * with batch index would falsify the claim (SURVEY §8 records the
  * table).
  *
  * Usage: runMain graft.StreamCensus <sfDir> <nBatches>
  */
object StreamCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batches = args(1).toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val workDir = java.nio.file.Files.createTempDirectory("graft-streamcensus").toString
    // one file per micro-batch; the repartition splits days across
    // batches, so the late-day MERGE path is exercised every trigger
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("ts"))
      .repartition(batches)
      .write.parquet(s"$workDir/in")
    val schema = spark.read.parquet(s"$workDir/in").schema

    val cells = mutable.Map.empty[(String, Long), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(DataFrame, Long)] = lastId.map { id =>
      import spark.implicits._
      (cells.toSeq.map { case ((et, d), n) => (et, d, n) }
        .toDF("event_type", "day", "n"), id)
    }
    val t0 = System.nanoTime()
    var lastPublish = t0
    val lines = mutable.ArrayBuffer.empty[String]
    def publishDelta(delta: DataFrame, batchId: Long): Unit = {
      val rows = delta.collect()
      rows.foreach { r =>
        cells((r.getAs[String]("event_type"), r.getAs[Long]("day"))) =
          r.getAs[Long]("n")
      }
      lastId = Some(batchId)
      val now = System.nanoTime()
      val batchMs = (now - lastPublish) / 1000000
      // the monitor contract: estimators re-derive from the maintained
      // table per trigger — time q301's changepoint, the heaviest of the five
      val d0 = System.nanoTime()
      val nVerdicts = graft.streaming.TrendMonitor.changepoint(store().get._1).count()
      val deriveMs = (System.nanoTime() - d0) / 1000000
      lines += s"""{"batch":$batchId,"batch_ms":$batchMs,"frag_cells":${rows.length},""" +
        s""""table_cells":${cells.size},"derive_ms":$deriveMs,"verdict_rows":$nVerdicts}"""
      lastPublish = System.nanoTime()
    }

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$workDir/in")
      // the round-tripped parquet reads back TIMESTAMP_NTZ; the monitor's
      // day bucketing (unix_micros) wants the instant type
      .select(col("event_type"), col("ts").cast("timestamp").as("ts"))
    val q = graft.streaming.TrendMonitor
      .trendMonitorStream(stream, store _)(publishDelta)
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    lines.foreach(println)
    println(s"""{"total_s":${(System.nanoTime() - t0) / 1e9},""" +
      s""""batches":${lines.size},"final_cells":${cells.size}}""")
    spark.stop()
  }
}
