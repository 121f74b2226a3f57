package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-depth banding for the global-order decompositions (q105 Gini,
  * q111 equi-depth histogram, q129 skyline): band boundaries come from a
  * one-pass quantile sketch over the sort key instead of fixed $10k
  * widths, so per-band window partitions stay balanced on ANY
  * distribution — a revenue table concentrated in one $10k slice would
  * degrade the fixed-width variant toward a single-partition window at
  * scale.
  *
  * The band id is `|{boundaries ≤ key}|` — monotone in the key for any
  * boundary set, so band-then-key order IS global order (the invariant
  * every decomposition needs) and equal keys always share a band (ties
  * can never straddle a boundary). Correctness therefore does NOT depend
  * on the sketch: any boundary wobble only shifts balance, never ranks —
  * which is also why the banded queries stay bit-identical to their
  * DuckDB oracles.
  *
  * Cost: one extra aggregation over `df` for the 1-row boundary frame
  * (broadcast back as a literal array). The branches share df's upstream
  * exchanges via ReuseExchange; at 100 TB the boundaries would instead
  * come from persisted sketch state (the q67/dailyRollup quantile column)
  * and the extra pass disappears.
  *
  * Balance bound: percentile_approx at fractions i/K with relative-error
  * accuracy 1/ε keeps every band ≤ n/K + 2εn rows (+ tie mass); the spec
  * forces a distribution concentrated in one fixed-width band and asserts
  * ≤ 2·n/K.
  */
object Bands {

  /** Add a `band` column (BIGINT, 0..nBands−1, monotone in `key`). */
  def withEquiDepthBand(df: DataFrame, key: String, nBands: Int = 32): DataFrame = {
    val fracs = (1 until nBands).map(i => i.toDouble / nBands)
    val bnd = df.agg(
      percentile_approx(col(key), typedLit(fracs), lit(10000)).as("__bnd"))
    df.crossJoin(broadcast(bnd))
      .withColumn("band",
        expr(s"CAST(size(filter(__bnd, b -> b <= $key)) AS BIGINT)"))
      .drop("__bnd")
  }
}
