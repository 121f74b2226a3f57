package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities: explicit salting for hot keys, the manual
  * complement to AQE's runtime skew-join splitting (which only triggers on
  * sort-merge joins above its thresholds). At 100 TB a handful of hot
  * users/keys can hold a stage hostage; salting bounds any single task's
  * share of a hot key to 1/`saltFactor`.
  */
object Skew {

  /** Skewed aggregation: two-phase — salt the key, partially aggregate per
    * (key, salt), then merge per key. Both shuffles are skew-free.
    *
    * The salt is a deterministic function of the row content — a
    * nondeterministic salt (rand/monotonically_increasing_id) re-salts rows
    * differently when a task is retried after shuffle-fetch failure, which
    * double-counts or drops rows (the SPARK-23207 class of bug).
    *
    * Tradeoff: fully *identical* rows hash to the same salt, so a hot key
    * made of byte-identical duplicates keeps its skew — pre-aggregate the
    * duplicates (groupBy all columns + count) before salting in that case.
    * `hash` also rejects MapType columns; project them away first.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltFactor: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))

  /** Salted broadcast-free join of a skewed fact to a dim: the fact gets a
    * random salt in [0, saltFactor); the dim is exploded saltFactor ways so
    * every (key, salt) bucket finds its row. Use when the dim is too big to
    * broadcast and the fact's key distribution is heavy-tailed.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    // deterministic per-row salt (see saltedCountSum note on retry safety)
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
