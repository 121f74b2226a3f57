package graft

import scala.collection.mutable

import org.apache.spark.sql.functions.col

/** s38 scale-census main (the [[StreamCensus]] ritual pointed at the ONE
  * monitor whose state is NOT calendar-bounded): drives the streaming
  * cluster-map sink batch-at-a-time over synthetic mostly-novel document
  * batches (a few planted near-dups of the previous batch each round, so
  * the cross-pair path stays live) and prints one JSON line per batch —
  * wall ms, signature-table files probed vs live, map files probed vs
  * live, probed bytes vs live bytes, delta rows, map rows.
  *
  * What it measures: the r17 verdict's structural watch item — before
  * r18 the sink full-scanned BOTH published tables every micro-batch
  * (O(table age) probe reads); with commit-bloom probes
  * ([[CommitLog.snapshotProbe]]) per-batch reads must track the batch's
  * ACTUAL overlap with history, staying ~FLAT in the table's age while
  * live files/bytes grow linearly. A probed-files line that climbs with
  * batch index would falsify the claim (SURVEY §8 records the table).
  *
  * Usage: runMain graft.ClusterCensus <nBatches> [docsPerBatch=200]
  */
object ClusterCensus {

  /** Deterministic ~40-word document; novel per (batch, i) via the salt
    * words, so distinct docs share no 5-shingles (no accidental dups). */
  private def docText(batch: Int, i: Int): String = {
    val rnd = new scala.util.Random(batch * 100003L + i)
    (0 until 40).map(_ => s"w${rnd.nextInt(5000)}b${batch}i$i").mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args(0).toInt
    val docsPerBatch = if (args.length > 1) args(1).toInt else 200
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-clustercensus").toString
    val (mapRoot, sigRoot) = (s"$work/map", s"$work/sigs")

    def tableBytes(root: String): (Int, Long) = {
      val files = CommitLog.liveFiles(spark, root)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (files.size, files.map(p => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/$p")).getLen).sum)
    }
    val lines = mutable.ArrayBuffer.empty[String]
    val t0 = System.nanoTime()
    for (b <- 0 until nBatches) {
      // 2 planted dups per round from 8 ROTATING batch-0 lineages (new
      // ids, old text): the touched docs are already clustered from the
      // lineage's previous visit, so the map probe path runs every round,
      // while each lineage's signatures exist in only ~1/8 of history —
      // probe reads should track that REAL overlap (≈ b/8 + 1 files),
      // not the table's age (b files). A batch's overlap with history is
      // the quantity the bloom probes are supposed to surface.
      val novel = (0 until docsPerBatch).map(i =>
        (b.toLong * docsPerBatch + i, docText(b, i)))
      val plants = if (b == 0) Seq.empty else Seq(
        (1000000L + b * 2L, docText(0, 100 + b % 8)),
        (1000001L + b * 2L, docText(0, 120 + b % 8)))
      val batch = (novel ++ plants).toDF("doc_id", "text")
      val tb = System.nanoTime()
      graft.streaming.ClusterSink.applyBatch(batch, mapRoot, sigRoot, b.toLong)
      val wallMs = (System.nanoTime() - tb) / 1000000
      val probes = graft.streaming.ClusterSink.lastProbe
      val (sigKept, sigLive) = probes.getOrElse("sigs", (0, 0))
      val (mapKept, mapLive) = probes.getOrElse("map", (0, 0))
      val (sigFiles, sigBytes) = tableBytes(sigRoot)
      val mapRows =
        if (CommitLog.headVersion(spark, mapRoot) == 0L) 0L
        else CommitLog.snapshot(spark, mapRoot).count()
      lines += s"""{"batch":$b,"wall_ms":$wallMs,""" +
        s""""sig_files_probed":$sigKept,"sig_files_live":$sigLive,""" +
        s""""map_files_probed":$mapKept,"map_files_live":$mapLive,""" +
        s""""sig_table_files":$sigFiles,"sig_table_mb":${sigBytes / 1048576.0},""" +
        s""""map_rows":$mapRows}"""
    }
    lines.foreach(println)
    println(s"""{"total_s":${(System.nanoTime() - t0) / 1e9},"batches":$nBatches,"docs_per_batch":$docsPerBatch}""")
    spark.stop()
  }
}
