package graft

import org.apache.spark.sql.functions._

/** Stream-stream-join scale census (dev tool — the r18 verdict's #9
  * second candidate: the ONE streaming shape without a Census artifact):
  * drives the s12 watermarked LEFT-OUTER attribution join (purchases ⟕
  * same-user clicks in the preceding hour — `EventStream.attributeStreamOuter`)
  * over a replica-scaled events table through a REAL file stream, one
  * time-contiguous micro-batch per file, and prints one JSON line per
  * batch from the engine's own progress metrics.
  *
  * What it measures: the s06/s12 state architecture's central claim —
  * join state is bounded by the WATERMARK HORIZON's traffic (a click
  * older than purchase-watermark − 1 h can never match and is GC'd), so
  * `state_rows` and `batch_ms` must stay FLAT in batch index no matter
  * how long the stream runs, and scale with traffic RATE (the replica
  * factor), never with stream AGE. A `state_rows` line that grows with
  * batch index would falsify the claim; SURVEY §8 records the 1× vs 10×
  * table.
  *
  * Replicas multiply TRAFFIC, not duplicates: each replica offsets
  * user_id/event_id into its own id space, so the join's per-user
  * matching work scales linearly and no cross-replica matches exist.
  * Batches are TIME-CONTIGUOUS (range-split on ts, written one file at
  * a time so modification-time order = event-time order): the watermark
  * advances every trigger, which is exactly the regime that exercises
  * state insertion AND eviction — a random split would jump the
  * watermark to max−delay at batch 1 and drop everything after as late.
  *
  * Usage: runMain graft.JoinCensus <sfDir> <nBatches> [replicas]
  */
object JoinCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batches = args(1).toInt
    val replicas = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (batches + 16).toString)
    val workDir = java.nio.file.Files.createTempDirectory("graft-joincensus").toString

    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts").cast("timestamp").as("ts"))
    val ev = (0 until replicas).map { r =>
      ev0.withColumn("user_id", col("user_id") + lit(r * 100000000L))
        .withColumn("event_id", col("event_id") + lit(r * 10000000000L))
    }.reduce(_ unionByName _)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .localCheckpoint()

    // time-contiguous batch files: quantile-cut on epoch-µs (approxQuantile
    // is numeric-only), each slice one part file renamed FLAT into in/ in
    // sequence, so FileStreamSource's mod-time order is event-time order
    val evU = ev.withColumn("us", unix_micros(col("ts")))
    val cuts = evU.stat.approxQuantile("us",
      (1 until batches).map(_.toDouble / batches).toArray, 0.001)
      .map(_.toLong)
    val bounds = (Array(Long.MinValue) ++ cuts) :+ Long.MaxValue
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$workDir/in"))
    (0 until batches).foreach { b =>
      evU.filter(col("us") >= bounds(b) && col("us") < bounds(b + 1)).drop("us")
        .coalesce(1).write.mode("overwrite").parquet(s"$workDir/tmp")
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$workDir/tmp/part-*"))
      require(part.nonEmpty, s"batch $b wrote no part file")
      fs.rename(part.head.getPath,
        new org.apache.hadoop.fs.Path(f"$workDir/in/b$b%04d.parquet"))
      Thread.sleep(15) // distinct mtimes pin the trigger order
    }
    val schema = spark.read.parquet(s"$workDir/in").schema

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$workDir/in")
    val purchases = stream.filter(col("event_type") === "purchase")
    val clicks = stream.filter(col("event_type").isin("click", "view"))
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStream.attributeStreamOuter(purchases, clicks)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/ckpt")
      .format("noop")
      .start()
    try q.processAllAvailable() finally q.stop()

    var totalOut = 0L
    q.recentProgress.filter(_.numInputRows > 0).zipWithIndex.foreach { case (p, i) =>
      val st = p.stateOperators.headOption
      totalOut += p.sink.numOutputRows
      println(s"""{"batch":$i,"input_rows":${p.numInputRows},""" +
        s""""batch_ms":${p.batchDuration},""" +
        s""""state_rows":${st.map(_.numRowsTotal).getOrElse(-1L)},""" +
        s""""state_evicted":${st.map(_.numRowsRemoved).getOrElse(-1L)},""" +
        s""""late_dropped":${st.map(_.numRowsDroppedByWatermark).getOrElse(-1L)},""" +
        s""""out_rows":${p.sink.numOutputRows}}""")
    }
    println(s"""{"total_s":${(System.nanoTime() - t0) / 1e9},"replicas":$replicas,""" +
      s""""batches":$batches,"out_rows_total":$totalOut}""")
    spark.stop()
  }
}
