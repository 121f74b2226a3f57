package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Dedup, Events, Geo, Graph, Linkage, Multimodal, Privacy, Quality, Relational, RelationalExt, Safety, Similarity, Stats, TextAnalysis}

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  *
  * `queries` maps every implemented operator id to a
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the DuckDB
  * mirror for each SQL-expressible one. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++ Events.queries ++
      Dedup.queries ++ TextAnalysis.queries ++ Similarity.queries ++
      Multimodal.queries ++ Privacy.queries ++ Geo.queries ++ Quality.queries ++
      Analytics.queries ++ Stats.queries ++ Linkage.queries ++ Graph.queries ++
      Safety.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ RelationalExt.oracles ++ Events.oracles ++
      Dedup.oracles ++ TextAnalysis.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ Privacy.oracles ++ Geo.oracles ++ Quality.oracles ++
      Analytics.oracles ++ Stats.oracles ++ Linkage.oracles ++ Graph.oracles ++
      Safety.oracles
}
