package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI entry point for the ETL pipeline: raw CSV dir → published
  * date-partitioned parquet, printing a one-line run summary.
  *
  * Usage: runMain graft.PipelineMain <rawCsvDir> <outDir>
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    val published = Pipeline.run(spark, rawDir, outDir)
    val nRows = published.count()
    val nIds = published.select(col("event_id")).distinct().count()
    val nParts = published.select(col("event_date")).distinct().count()
    println(s"""{"published_rows":$nRows,"distinct_ids":$nIds,"date_partitions":$nParts,"out":"${GraftSession.jsonEscape(outDir)}"}""")
    spark.stop()
  }
}
