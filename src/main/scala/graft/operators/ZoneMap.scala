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
    * candidate set a range query must read. Driver-side and
    * manifest-sized, never a data read. Files with a NULL min/max (all
    * rows null in that file) cannot satisfy a range predicate and are
    * skipped.
    */
  private def candidateFiles(s: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): (Seq[String], Long) = {
    val zm = s.read.parquet(s"$dir/_zonemap")
    val total = zm.count()
    val kept = zm
      .filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    (kept, total)
  }

  /** Range scan through the zone map: a DataFrame over ONLY the surviving
    * files (the row-level predicate still applies — zone pruning is a
    * superset guarantee, exactly like partition pruning), plus
    * (files read, files total) so callers and specs can see the skip.
    * An empty candidate set yields an empty frame with the data's schema.
    */
  def scanRange(s: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): (DataFrame, Int, Long) = {
    val (files, total) = candidateFiles(s, dir, c, lo, hi)
    val pred = col(c) >= lo && col(c) <= hi
    val df =
      if (files.isEmpty) s.read.parquet(dir).filter(lit(false))
      else s.read.parquet(files: _*).filter(pred)
    (df, files.size, total)
  }
}
