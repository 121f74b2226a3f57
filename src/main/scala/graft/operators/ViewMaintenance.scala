package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOIN views — the join companion of
  * `Quality.dailyRollup`/`mergeRollups` (which maintain AGGREGATE views):
  * a materialized V = A ⋈ B absorbs insert-deltas without rejoining the
  * bases.
  *
  * Algebra (classic delta rule): with inserts dA, dB,
  *   V' = (A ∪ dA) ⋈ (B ∪ dB) = V ∪ dA⋈B ∪ A⋈dB ∪ dA⋈dB
  * so the refresh cost is delta-sized: each term joins a delta against a
  * base (or the two deltas), never base against base. At 100 TB the bases
  * are bucketed on the join key (SkewBucketSpec's Exchange-free co-located
  * join), so dA⋈B shuffles ONLY dA — the base is read pre-partitioned —
  * and the published view appends dV exactly like Pipeline's incremental
  * publish.
  *
  * Contract for [[joinDelta]]/[[refresh]]: APPEND-ONLY deltas (the
  * fact-stream case). Updates and deletes go through the COUNTING form
  * below ([[countingJoinDelta]]/[[refreshCounting]]): every row carries a
  * `mult` multiplicity (+1 insert, −1 retraction; an update is a −1/+1
  * pair), the same three delta terms apply with multiplicities
  * MULTIPLYING (the join of Z-relations is bilinear — the algebra DBSP /
  * differential dataflow builds on), and [[consolidate]] nets rows out:
  * sum(mult) = 0 rows vanish, so a delete of a base row retracts every
  * join output it produced. Non-key columns of A and B must be disjoint
  * (same as any natural-join view).
  */
object ViewMaintenance {

  /** The view delta dV for V = A ⋈_keys B under insert-deltas dA, dB. */
  def joinDelta(baseA: DataFrame, baseB: DataFrame,
      dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    dA.join(baseB, keys)
      .unionByName(baseA.join(dB, keys))
      .unionByName(dA.join(dB, keys))

  /** Refreshed view: V ∪ dV (the caller owns persisting/appending it). */
  def refresh(view: DataFrame, baseA: DataFrame, baseB: DataFrame,
      dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(joinDelta(baseA, baseB, dA, dB, keys))

  /** dV for V = A ⋈ B where every frame carries a BIGINT `mult` column:
    * the same three delta terms, output multiplicity = product of the
    * input multiplicities. Bases must be PRE-delta (as in [[joinDelta]]).
    */
  def countingJoinDelta(baseA: DataFrame, baseB: DataFrame,
      dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame = {
    def term(l: DataFrame, r: DataFrame): DataFrame =
      l.withColumnRenamed("mult", "mult_l")
        .join(r.withColumnRenamed("mult", "mult_r"), keys)
        .withColumn("mult", col("mult_l") * col("mult_r"))
        .drop("mult_l", "mult_r")
    term(dA, baseB).unionByName(term(baseA, dB)).unionByName(term(dA, dB))
  }

  /** Net out multiplicities: one aggregate over the view columns;
    * sum(mult) = 0 rows disappear (a delete met its insert). This is the
    * ONLY place retractions are resolved — the delta terms never look at
    * each other. Cost: one exchange over the (delta-sized, if called on
    * view ∪ dV fragments per key-partition) frame; at 100 TB consolidate
    * runs per storage partition during the publish, not globally.
    */
  def consolidate(view: DataFrame): DataFrame = {
    val cols = view.columns.filter(_ != "mult").map(col)
    view.groupBy(cols.toIndexedSeq: _*).agg(sum(col("mult")).as("mult"))
      .filter(col("mult") =!= 0L)
  }

  /** Refreshed + consolidated counting view. */
  def refreshCounting(view: DataFrame, baseA: DataFrame, baseB: DataFrame,
      dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    consolidate(view.unionByName(countingJoinDelta(baseA, baseB, dA, dB, keys)))
}
