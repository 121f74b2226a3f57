package graft

import org.apache.spark.sql.SparkSession

/** The one local SparkSession builder every graft CLI main uses — the four
  * previously hand-copied builder blocks had already drifted (PipelineMain
  * lacked the nanos flag the events table needs). One definition, one
  * place to add the next parity-critical conf.
  */
object GraftSession {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Escape a string for embedding in the hand-built JSON summary lines. */
  def jsonEscape(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"")
}
