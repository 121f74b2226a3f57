package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Atomic store for [[EventStream.rollupStream]]'s published table — the
  * implementation of the SINK CONTRACT documented there: the delta and the
  * batch id that produced it must become visible in ONE atomic step, or a
  * crash between "data applied" and "id recorded" makes the at-least-once
  * replay re-merge the fragment and double-count every additive counter.
  *
  * The trick: the batch id IS the directory name. A batch's merged delta
  * is written to a dot-prefixed staging directory (invisible to readers —
  * Hadoop/Spark listings skip `.`/`_` paths), then one filesystem rename
  * publishes it as `tableDir/gen=<batchId>/`. After the rename both the
  * rows and the id are visible; before it, neither is. Rename is atomic on
  * POSIX filesystems and HDFS; on S3-style object stores (no atomic
  * rename) this sink needs a table format or commit service instead — the
  * same caveat every file-based streaming sink carries.
  *
  * Layout: an LSM-ish delta chain. Each generation holds ONLY the cells
  * its batch touched (per-batch write cost stays O(fragment), the
  * rollupStream promise); a cell's current value is its row in the
  * HIGHEST generation that contains it, because [[EventStream.rollupBatch]]
  * emits fully-merged replacement rows for touched cells. `load`
  * reconstructs the table with a per-cell argmax over `gen` (a partition
  * column — free from the directory name) and reports max(gen) as the
  * last-applied batch id. The chain is bounded by generation count, not
  * data size; folding old generations into a compacted base is a pointer
  * flip into a fresh table dir, exactly like Dedup.publishBatch's
  * generation chain.
  */
object RollupSink {

  private val CellKeys = Seq("event_type", "day")

  /** Write the delta to an invisible staging directory ([[AtomicGen]]'s
    * stage half, exposed for the crash-window spec). Returns its path.
    * A crash after this leaves only ignorable dot-prefixed litter.
    */
  private[graft] def stage(delta: DataFrame, tableDir: String, batchId: Long): String = {
    val tmp = AtomicGen.stagingPath(tableDir, batchId)
    delta.write.mode("overwrite").parquet(tmp)
    tmp
  }

  /** Publish a staged delta — [[AtomicGen.commit]]: ONE rename makes rows
    * + batch id visible together; a retry of a committed id discards the
    * staged copy.
    */
  private[graft] def commit(s: SparkSession, tableDir: String, staged: String,
      batchId: Long): Unit = {
    AtomicGen.commit(s, tableDir, staged, batchId): Unit
  }

  /** The `publishDelta` to hand to [[EventStream.rollupStream]]. */
  def publish(s: SparkSession, tableDir: String)(delta: DataFrame, batchId: Long): Unit =
    commit(s, tableDir, stage(delta, tableDir, batchId), batchId)

  /** Bound the delta chain: delete every generation whose cells ALL
    * reappear in some newer generation — a reader reconstructing the
    * table (max gen per cell) can never need a shadowed generation, so
    * the delete does not change `load`'s result, and the max generation
    * (which carries the last-applied batch id in its name) is never
    * shadowed by definition. The shadow computation reads only the
    * cell-key columns (column-pruned, cell-count-bounded); run gc from
    * the maintenance process, not concurrently with a reader that has
    * already planned a scan over the old file list — the same caveat as
    * any file-level compaction. Returns the deleted batch ids.
    */
  def gc(s: SparkSession, tableDir: String): Seq[Long] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val gens = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
    if (gens.size < 2) return Nil
    val w = Window.partitionBy(CellKeys.map(col): _*)
    // a generation survives iff it carries the newest copy of some cell
    val live = s.read.parquet(tableDir)
      .select((col("gen") +: CellKeys.map(col)): _*)
      .withColumn("mx", max(col("gen")).over(w))
      .filter(col("gen") === col("mx"))
      // cast: partition-column inference may type small ids as INT
      .select(col("gen").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val shadowed = gens.filterNot(g => g == gens.max || live.contains(g)).sorted
    shadowed.foreach(g => fs.delete(new Path(s"$tableDir/gen=$g"), true))
    shadowed
  }

  /** The `store` to hand to [[EventStream.rollupStream]]: current table +
    * last-applied batch id, or None before the first commit. The
    * generation listing is a driver-side directory list bounded by batch
    * count, never a data read.
    */
  def load(s: SparkSession, tableDir: String): Option[(DataFrame, Long)] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val gens = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
    if (gens.isEmpty) None
    else {
      val w = Window.partitionBy(CellKeys.map(col): _*).orderBy(col("gen").desc)
      val table = s.read.parquet(tableDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn", "gen")
      Some((table, gens.max))
    }
  }
}
