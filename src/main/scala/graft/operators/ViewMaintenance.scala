package graft.operators

import org.apache.spark.sql.DataFrame

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
  * Contract: APPEND-ONLY deltas (the fact-stream case). Updates/deletes
  * need multiplicity-counting maintenance (each row carries a +1/−1
  * count and the view aggregates counts) — out of scope here, documented
  * so nobody mistakes this for a general CDC merge. Non-key columns of A
  * and B must be disjoint (same as any natural-join view).
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
}
