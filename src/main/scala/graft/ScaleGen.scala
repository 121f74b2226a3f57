package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke replica generator: writes a ~10x copy of the EVENT- and
  * ORDER-side tables under an output dir (default `target/sf1ev`), for
  * the §8 sf≈1 event-family StageCensus (TESTDATA itself is read-only).
  *
  * Replication model — k ∈ 0..9 replicas with key-space OFFSETS, not row
  * copies under the same keys: each replica introduces NEW users,
  * customers, orders and docs (the way a 10x-bigger feed actually looks),
  * so per-key group sizes stay realistic while key domains grow 10x:
  *   - events:   event_id += k·10¹², user_id += k·10⁹ (same time span →
  *               10x daily volume, 10x concurrency, 10x users)
  *   - orders:   o_orderkey += k·10¹², o_custkey += k·10⁹
  *   - customer: c_custkey += k·10⁹ (so every replica order joins its
  *               own replica customer; segments/nations unchanged)
  *   - lineitem: l_orderkey += k·10¹² (part/supplier dims kept — 10x
  *               fan-in per part, the conservative join direction)
  *   - documents: doc_id += k·10⁹ (q83's packing reads only token counts)
  * Dimension tables (nation, region, supplier, part, embeddings) copy
  * through unchanged — dims don't grow 10x when a feed does.
  *
  * Usage: runMain graft.ScaleGen [srcDir] [outDir] [replicas]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1ev")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    /** k offset copies of `df`, each bumping the named key columns. */
    def replicate(df: DataFrame, bigKeys: Seq[String], medKeys: Seq[String]): DataFrame =
      (0 until k).map { i =>
        val b = bigKeys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000000L)))
        medKeys.foldLeft(b)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))
      }.reduce(_ unionByName _)

    write(replicate(tbl("events"), Seq("event_id"), Seq("user_id")), "events")
    write(replicate(tbl("orders"), Seq("o_orderkey"), Seq("o_custkey")), "orders")
    write(replicate(tbl("customer"), Nil, Seq("c_custkey")), "customer")
    write(replicate(tbl("lineitem"), Seq("l_orderkey"), Nil), "lineitem")
    write(replicate(tbl("documents"), Nil, Seq("doc_id")), "documents")
    Seq("nation", "region", "supplier", "part", "embeddings")
      .foreach(n => write(tbl(n), n))
    println(s"""{"out":"$out","replicas":$k}""")
    spark.stop()
  }
}
