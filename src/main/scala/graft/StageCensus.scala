package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-census main: runs the named queries (noop sink, N iterations)
  * with a listener recording per-stage task counts and executor time —
  * the attribution tool behind SURVEY §8's swing audits (the q48
  * standard: name the mechanism, don't shrug at a slow row).
  *
  * Usage: runMain graft.StageCensus <sfDir> <iters> <query> [query ...]
  */
object StageCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    final case class St(name: String, tasks: Int, execMs: Long, wallMs: Long,
        gcMs: Long, spillBytes: Long)
    // listener events arrive on the async bus thread; every access to the
    // buffer (append here, clear/snapshot below) synchronizes on it — an
    // attribution tool must not read a torn buffer
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.name.takeWhile(_ != '\n'), si.numTasks,
            si.taskMetrics.executorRunTime, wall,
            si.taskMetrics.jvmGCTime,
            si.taskMetrics.memoryBytesSpilled + si.taskMetrics.diskBytesSpilled)
        }
      }
    })
    /** The bus delivers completion events AFTER the action returns (the
      * final — usually biggest — stage would otherwise be censused into
      * the NEXT iteration or dropped): wait until the buffer is quiet.
      * The public API has no bus-drain hook, so quiesce by stability.
      */
    def quiesce(): Unit = {
      var last = -1
      var stable = 0
      while (stable < 2) {
        Thread.sleep(100)
        val now = stages.synchronized(stages.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }
    // warmup: JIT/codegen on the smallest SF
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    quiesce() // drain the warmup's events before the first clear
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to iters).foreach { it =>
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        quiesce()
        val snap = stages.synchronized(stages.toVector)
        println(f"===== $n iter $it: $sec%.3f s, ${snap.size} stages =====")
        snap.sortBy(-_.execMs).take(8).foreach { s =>
          println(f"  tasks=${s.tasks}%3d exec=${s.execMs}%6d ms wall=${s.wallMs}%6d ms " +
            f"gc=${s.gcMs}%5d ms spill=${s.spillBytes}%d  ${s.name.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
