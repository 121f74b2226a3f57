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
  * Document text modes (4th arg):
  *   - `verbatim` (default): replicas carry the text unchanged — every doc
  *     gains 9 extra EXACT copies, so pair-based dedup queries go ~100x
  *     (replica semantics, not a plan defect — the r15 §8 q261 attribution).
  *     Right for smoke-timing scan-bound queries, wrong for oracling the
  *     pair family.
  *   - `salt`: replica i>0 suffixes every whitespace token with `~i`
  *     (empty tokens from runs of spaces pass through, so split-on-space /
  *     join-with-space is structure-preserving). Each replica keeps the
  *     source corpus's INTERNAL duplicate/near-dup structure but shares no
  *     token, shingle, or exact hash across replicas — dup mass scales ~10x
  *     like a 10x-bigger crawl, which is the shape the sf1ev ORACLE runs
  *     need (a verbatim replica would hand DuckDB a quadratic pair table).
  *     n_chars is recomputed to match the salted text.
  *
  * Usage: runMain graft.ScaleGen [srcDir] [outDir] [replicas] [docMode]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1ev")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val docMode = args.lift(3).getOrElse("verbatim")
    require(docMode == "verbatim" || docMode == "salt", s"docMode must be verbatim|salt, got $docMode")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    /** k offset copies of `df`, each bumping the named key columns and
      * applying the optional per-replica column transform. */
    def replicate(df: DataFrame, bigKeys: Seq[String], medKeys: Seq[String],
                  perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val b = bigKeys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000000L)))
        val m = medKeys.foldLeft(b)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))
        perReplica(m, i)
      }.reduce(_ unionByName _)

    /** salt mode: replica i>0 suffixes each non-empty space-token with ~i
      * (split/join on single space with empties passed through is exactly
      * structure-preserving), n_chars recomputed. Replica 0 is byte-equal
      * to the source corpus. */
    def saltDocs(d: DataFrame, i: Int): DataFrame =
      if (docMode == "verbatim" || i == 0) d
      else d
        .withColumn("text", array_join(
          transform(split(col("text"), " ", -1),
            t => when(t === "", t).otherwise(concat(t, lit(s"~$i")))), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))

    write(replicate(tbl("events"), Seq("event_id"), Seq("user_id")), "events")
    write(replicate(tbl("orders"), Seq("o_orderkey"), Seq("o_custkey")), "orders")
    write(replicate(tbl("customer"), Nil, Seq("c_custkey")), "customer")
    write(replicate(tbl("lineitem"), Seq("l_orderkey"), Nil), "lineitem")
    write(replicate(tbl("documents"), Nil, Seq("doc_id"), saltDocs), "documents")
    Seq("nation", "region", "supplier", "part", "embeddings")
      .foreach(n => write(tbl(n), n))
    println(s"""{"out":"$out","replicas":$k,"docMode":"$docMode"}""")
    spark.stop()
  }
}
