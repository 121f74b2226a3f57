package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.JaroWinkler

/** Record linkage / entity resolution: approximate-name matching with
  * blocking — the classic data-integration operator (Fellegi–Sunter shape:
  * block → compare → score) that complements the document-level dedup
  * block (C): q28/q29 find duplicate CONTENT, this finds duplicate
  * ENTITIES whose names differ by typos or variant spellings.
  */
object Linkage {

  /** q143: candidate entity pairs among part names — Jaro–Winkler ≥ the
    * threshold within a (brand, first-name-token) block.
    *
    * Blocking is the scale design: the all-pairs comparison is O(n²) and
    * never runs; pairs form only within blocks, and the blocking key
    * (brand × first token) grows with the catalog, so block sizes stay
    * bounded as the table scales — same contract as q29's LSH bands and
    * the hot-bucket cap in Dedup. The self-join is a shuffle equi-join on
    * the block key (no broadcast: both sides are the full table);
    * `id_a < id_b` keeps each unordered pair once. Scores come from the
    * native codegen'd [[graft.functions.JaroWinkler]] expression — exact
    * integer basis points, no doubles, so the pair set is engine- and
    * replay-stable. DuckDB-oracled via its built-in
    * `jaro_winkler_similarity` (same Winkler form: prefix ≤ 4, p = 0.1,
    * 0.7 boost threshold): `floor(sim * 10000)` matched this exact
    * integer kernel on EVERY in-block pair at sf0.001/0.01/0.1
    * (0 / 9 900 / 999 806 pairs, full-result equality, not just the
    * emitted rows), including the ~31% of pairs whose 10000·jw is an
    * exact integer — the floor-boundary ulp risk is real in theory but
    * empirically absent here because both engines hit those rationals
    * exactly; the non-integer pairs sit ≥ 0.0129 from a boundary.
    * LinkageSpec additionally brute-forces block recall and pins the
    * kernel to the literature's hand-computed values.
    */
  def q143LinkagePairs(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir).select(
      col("p_partkey"), col("p_brand"), col("p_name"),
      split(col("p_name"), " ").getItem(0).as("name_head"))
    val a = parts.select(col("p_brand"), col("name_head"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = parts.select(col("p_brand"), col("name_head"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "name_head"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw_bp", JaroWinkler.jaroWinklerBp(col("name_a"), col("name_b")))
      .filter(col("jw_bp") >= 9000 && col("jw_bp") < 10000) // near, not identical
      .select(col("p_brand"), col("id_a"), col("id_b"), col("name_a"),
        col("name_b"), col("jw_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_linkage_pairs" -> (q143LinkagePairs _))

  val oracles: Map[String, String] = Map(
    "q143_linkage_pairs" ->
      """WITH parts AS (
           SELECT p_partkey, p_brand, p_name,
                  string_split(p_name, ' ')[1] AS name_head
           FROM part)
         SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
                a.p_name AS name_a, b.p_name AS name_b,
                CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 10000)
                  AS BIGINT) AS jw_bp
         FROM parts a JOIN parts b
           ON a.p_brand = b.p_brand AND a.name_head = b.name_head
          AND a.p_partkey < b.p_partkey
         WHERE jw_bp >= 9000 AND jw_bp < 10000""")
}
