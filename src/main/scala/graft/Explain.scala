package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for the named
  * queries (all if none given) at the given SF dir — the audit tool for
  * pushdown / broadcast / codegen checks.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    var unknown = false
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          println(s"===== $n =====")
          q(spark, sfDir).explain("formatted")
        case None =>
          unknown = true
          System.err.println(
            s"unknown query '$n'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
    if (unknown) sys.exit(1)
  }
}
