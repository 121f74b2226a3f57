package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point for the LLM-corpus pipeline: documents table at an SF
  * dir → published lang-partitioned clean corpus, printing the per-stage
  * audit as one JSON line.
  *
  * Usage: runMain graft.CorpusPipelineMain <sfDir> <outDir>
  */
object CorpusPipelineMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    val (_, audit) = CorpusPipeline.run(spark, sfDir, outDir)
    val stages = audit.collect()
      .map(r =>
        s""""${r.getString(0)}":{"docs":${r.getLong(1)},"tokens":${r.getLong(2)}}""")
      .mkString(",")
    println(s"""{"stages":{$stages},"out":"${GraftSession.jsonEscape(outDir)}"}""")
    spark.stop()
  }
}
