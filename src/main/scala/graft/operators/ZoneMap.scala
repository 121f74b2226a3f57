package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — data skipping for plain parquet directories,
  * the mechanism behind Delta/Iceberg file pruning: a manifest of per-FILE
  * min/max/count stats, consulted at query time to read only the files
  * whose value interval can intersect the predicate.
  *
  * This is the payoff side of q119's z-order layout: clustering the write
  * by a sort/interleave key gives every file a TIGHT min/max envelope, so
  * a selective range predicate skips most files before Spark plans a
  * single task. Partition pruning skips DIRECTORIES by key equality; zone
  * maps skip FILES by value range — orthogonal, and together they are the
  * full skipping story at 100 TB (the manifest is file-count-sized, read
  * driver-side like any table format's metadata layer; the row-group-level
  * analogue lives inside parquet itself via predicate pushdown, which
  * this complements at the planning layer: skipped files never even open
  * a footer).
  */
object ZoneMap {

  /** Build the per-file stats manifest for `statCols` (one scan of the
    * data, grouped by physical file) and persist it beside the data under
    * `_zonemap` (underscore prefix: invisible to directory readers).
    */
  def build(s: SparkSession, dir: String, statCols: Seq[String]): DataFrame = {
    val stats = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    val zm = s.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), stats: _*)
    zm.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/_zonemap")
    zm
  }

  /** Files whose [min, max] interval on `c` intersects [lo, hi] — the
    * candidate set a range query must read. The FILTER over the manifest
    * is a distributed Spark job (the `_zonemap` parquet is scanned and
    * pruned executor-side, so a manifest of millions of rows never
    * transits the driver whole); only the SURVIVING paths are collected,
    * because the scan planner needs concrete paths on the driver — the
    * same shape as Delta/Iceberg, whose log/manifest filtering is also
    * distributed but whose final file list is always driver-resident.
    * `None` = the surviving set itself is too large to collect (bound by
    * `graft.zonemap.maxCandidateFiles`, default 100k ≈ tens of MB of
    * paths) — the caller must fall back to the plain directory scan,
    * which is the right plan anyway for a predicate that unselective.
    * Files with a NULL min/max (all rows null in that file) cannot
    * satisfy a range predicate and are skipped.
    */
  private def candidateFiles(s: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): (Option[Seq[String]], Long, Long) = {
    val maxFiles = s.conf.getOption("graft.zonemap.maxCandidateFiles")
      .map(_.toLong).getOrElse(100000L)
    val zm = s.read.parquet(s"$dir/_zonemap")
    val total = zm.count()
    val keptDf = zm
      .filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select(col("file"))
    val nKept = keptDf.count()
    if (nKept > maxFiles) (None, nKept, total)
    else (Some(keptDf.collect().map(_.getString(0)).toSeq), nKept, total)
  }

  /** Range scan through the zone map: a DataFrame over ONLY the surviving
    * files (the row-level predicate still applies — zone pruning is a
    * superset guarantee, exactly like partition pruning), plus
    * (files read, files total) so callers and specs can see the skip.
    * An empty candidate set yields an empty frame with the data's schema.
    * A surviving set larger than `graft.zonemap.maxCandidateFiles` falls
    * back to the plain directory scan with the row predicate — skipping
    * buys nothing on an unselective predicate, and the fallback bounds
    * driver memory at any manifest size.
    */
  def scanRange(s: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): (DataFrame, Int, Long) = {
    val (files, nKept, total) = candidateFiles(s, dir, c, lo, hi)
    val pred = col(c) >= lo && col(c) <= hi
    files match {
      case Some(fs) if fs.isEmpty => (s.read.parquet(dir).filter(lit(false)), 0, total)
      case Some(fs) => (s.read.parquet(fs: _*).filter(pred), fs.size, total)
      case None => (s.read.parquet(dir).filter(pred), nKept.toInt, total)
    }
  }
}
