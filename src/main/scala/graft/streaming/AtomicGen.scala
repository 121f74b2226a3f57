package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** THE atomic generation-commit idiom, in one place: a batch's output is
  * written to an invisible dot-prefixed staging directory, then ONE
  * filesystem rename publishes it as `<root>/gen=<batchId>` — rows and
  * batch id become visible together, a crash before the rename leaves only
  * ignorable litter, and a replay of a committed id is a no-op. Shared by
  * [[RollupSink]] (rollup deltas), [[VectorIngest]] (ANN ingest lane) and
  * [[ExpectationsGate]] (gated publish/quarantine) so the
  * exists-check → stage → lost-race-delete → rename sequence cannot drift
  * between sinks. Rename is atomic on POSIX/HDFS; object stores without
  * atomic rename need a table format or commit service instead — the
  * caveat every file-based sink here carries.
  *
  * Writer contract: ONE writer per root at a time. foreachBatch gives this
  * for free (Spark runs one instance of a streaming query; a zombie driver
  * is fenced by the checkpoint), and the batch entry points are driver-side
  * calls. With two live writers racing the SAME batch id the rename itself
  * stays safe — [[commit]] re-checks the target after a failed/ambiguous
  * rename and treats "someone else committed it" as the ordinary lost-race
  * discard (HDFS renames onto an existing directory NEST the source inside
  * it rather than replacing it, so the loser must detect the race by the
  * target's existence, not by rename's return value) — but concurrent
  * DIFFERENT batch ids against one root are outside the contract.
  */
private[graft] object AtomicGen {

  def target(root: String, batchId: Long): String = s"$root/gen=$batchId"

  /** Fresh invisible staging path for a batch (readers skip `.`/`_`). */
  def stagingPath(root: String, batchId: Long): String =
    s"$root/.staging-$batchId-${java.util.UUID.randomUUID()}"

  def committed(s: SparkSession, root: String, batchId: Long): Boolean = {
    val t = new Path(target(root, batchId))
    t.getFileSystem(s.sparkContext.hadoopConfiguration).exists(t)
  }

  /** Publish a staged directory: one rename makes rows + id visible
    * together. Returns false (discarding the staged copy) if the
    * generation was already committed — the retry-after-lost-success
    * case; the committed generation wins.
    */
  def commit(s: SparkSession, root: String, staged: String, batchId: Long): Boolean = {
    val t = new Path(target(root, batchId))
    val fs = t.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root))) fs.mkdirs(new Path(root))
    if (fs.exists(t)) { fs.delete(new Path(staged), true); false }
    else if (!fs.rename(new Path(staged), t)) {
      // Failed rename is ambiguous: re-check the target. If a racing writer
      // committed this generation between our exists-check and the rename,
      // that's the ordinary lost race — their copy wins, ours is litter.
      // (On HDFS a rename onto an existing dir would instead NEST staged
      // inside it; the dot-prefixed name keeps that litter reader-invisible
      // and the exists(t) check still reports the generation committed.)
      if (fs.exists(t)) { fs.delete(new Path(staged), true); false }
      else throw new java.io.IOException(s"atomic gen commit: rename $staged -> $t failed")
    } else true
  }

  /** The whole cycle: skip if committed (the `write` thunk — including any
    * validation inside it — never runs on a replay), else stage + commit.
    */
  def publish(s: SparkSession, root: String, batchId: Long)(write: String => Unit): Boolean = {
    if (committed(s, root, batchId)) return false
    val staged = stagingPath(root, batchId)
    write(staged)
    commit(s, root, staged, batchId)
  }
}
