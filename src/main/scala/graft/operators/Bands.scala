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

  /** Add a `band` column (BIGINT, 0..nBands−1, monotone in `key`).
    * `accuracy` prices the boundary sketch only — correctness never
    * depends on it (see the object doc); callers that only need the
    * monotone decomposition (not tight balance) pass a small one. */
  def withEquiDepthBand(df: DataFrame, key: String, nBands: Int = 32,
      accuracy: Int = 10000): DataFrame = {
    val fracs = (1 until nBands).map(i => i.toDouble / nBands)
    val bnd = df.agg(
      percentile_approx(col(key), typedLit(fracs), lit(accuracy)).as("__bnd"))
    df.crossJoin(broadcast(bnd))
      .withColumn("band",
        expr(s"CAST(size(filter(__bnd, b -> b <= $key)) AS BIGINT)"))
      .drop("__bnd")
  }

  /** EXACT interpolated percentiles at scale, via band decomposition —
    * the distributed form of `percentile(key, fracs)` (r15): Spark's
    * exact percentile ships every value into one ObjectHashAggregate
    * buffer and merges it on a single reducer — at 100 TB that buffer IS
    * the OOM. Here the global order is decomposed the q111 way: band by
    * sketch boundaries (monotone in the key, so band-then-key order is
    * global order), fold to the 32-row band-count frame, locate each
    * needed GLOBAL rank's (band, local rank) arithmetically, and read the
    * order statistics with one per-band window over ONLY the ≤ |fracs|·2
    * touched bands (each ~n/32 rows). Every value-scale stage is a
    * partial-agg or a band-partitioned sort; nothing corpus-scale lands
    * on one reducer.
    *
    * Semantics: identical to `percentile(key, q)` / DuckDB
    * `quantile_cont` — rank r = q·(n−1), v = v_⌊r⌋ + (v_⌊r⌋₊₁ − v_⌊r⌋)·
    * (r − ⌊r⌋), the same formula text both engines evaluate (ties are
    * safe: equal keys share a band and equal order-stat values interpolate
    * to themselves). Spec'd bit-equal to `percentile()` on the corpus
    * columns AND on planted tie/short/skew frames.
    *
    * Returns one row: `pcts ARRAY<DOUBLE>` in `fracs` order.
    */
  def exactPercentiles(df: DataFrame, key: String,
      fracs: Seq[Double], nBands: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Boundaries are a DRIVER-HELD model (the kmeansCentroids precedent:
    // ≤ 31 doubles, bounded by construction — never data-scale), because
    // the in-plan `filter(__bnd, ...)` HOF runs an INTERPRETED lambda per
    // row per consumer (censused at ~2.5 s/scan × many consumers at
    // sf0.1); a chain of 31 codegen'd comparisons prices the same
    // banding at scan speed. Boundary accuracy 100: rank exactness never
    // depends on the sketch (only the touched-band sort sizes do).
    val src = df.select(col(key).as("__v")).filter(col("__v").isNotNull)
    val bnds = src.agg(percentile_approx(col("__v"),
        typedLit((1 until nBands).map(i => i.toDouble / nBands)), lit(100))
        .as("b"))
      .head().getSeq[Double](0)
    val bandCol = bnds
      .map(b => when(col("__v") > lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val banded = src.withColumn("band", bandCol)
    val counts = banded.groupBy(col("band")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // needed (global rank, kind) pairs per fraction: ⌊r⌋ and ⌊r⌋+1
    val ranks = counts.agg(sum(col("cnt")).as("n"))
      .select(posexplode(array(fracs.map(lit(_)): _*)).as(Seq("ord", "q")),
        col("n"))
      .withColumn("r", expr("q * CAST(n - 1 AS DOUBLE)"))
      .withColumn("i", expr("CAST(floor(r) AS BIGINT)"))
      .withColumn("fpart", expr("r - floor(r)"))
      .select(col("ord"), col("fpart"), explode(array(
        struct(lit(0).as("kind"), col("i").as("rank")),
        struct(lit(1).as("kind"), expr("least(i + 1, n - 1)").as("rank"))))
        .as("rk"))
      .select(col("ord"), col("fpart"),
        col("rk.kind").as("kind"), col("rk.rank").as("rank"))
    // locate each rank's band + local rank (32 × |fracs|·2 broadcast join)
    val needed = ranks.join(broadcast(counts),
        col("rank") >= col("cum_before") &&
          col("rank") < col("cum_before") + col("cnt"))
      .select(col("ord"), col("fpart"), col("kind"), col("band"),
        (col("rank") - col("cum_before")).as("lr"))
    // order statistics from ONLY the touched bands, sorted per band
    val stats = banded
      .join(broadcast(needed.select(col("band")).distinct()), Seq("band"),
        "left_semi")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band")).orderBy(col("__v"))).cast("long") - 1L)
      .join(broadcast(needed), Seq("band"))
      .filter(col("rn") === col("lr"))
      .select(col("ord"), col("fpart"), col("kind"), col("__v"))
    stats.groupBy(col("ord"), col("fpart"))
      .agg(min(when(col("kind") === 0, col("__v"))).as("v1"),
        min(when(col("kind") === 1, col("__v"))).as("v2"))
      .agg(expr("array_sort(collect_list(struct(ord, v1 + (v2 - v1) * fpart AS p)))")
        .as("ps"))
      .select(expr("transform(ps, x -> x.p)").as("pcts"))
  }

  /** EXACT weighted percentiles per GROUP at scale — the distributed form
    * of `percentile(v, fracs, f)` over a VALUE-DOMAIN frame
    * (group, v, f): Spark's exact weighted percentile ships every
    * (v, f) pair of a group into ONE ObjectHashAggregate buffer and a
    * single reducer sorts/merges it (q67's l_extendedprice buffer:
    * ~450 k pairs, censused 1.9 s single-task — and at 100 TB, where even
    * a continuous column's value domain stops fitting one reducer, that
    * buffer IS the OOM). Decomposition is [[exactPercentiles]]'s (q111):
    * band by per-group sketch boundaries (driver-held — the group axis is
    * a bounded PROFILE axis, e.g. q67's 3 columns, never data-scale),
    * fold to the |groups|·nBands band-count frame, locate each needed
    * WEIGHTED global rank's (band, local rank) arithmetically, and read
    * the order statistics with per-(group, band) windows over only the
    * touched bands.
    *
    * Semantics: bit-equal to `percentile(v, fracs, f)` BY ITS OWN
    * FORMULA — pos = q·(N−1) on N = Σf, and the interpolation replicates
    * Percentile.getPercentile verbatim: `v_lo` when ceil(pos) = floor(pos)
    * else `(hi − pos)·v_lo + (pos − lo)·v_hi` (NOT the algebraically
    * equal v1 + (v2−v1)·fpart, which can differ in the last ulp).
    * Boundary wobble moves band sizes, never ranks. Duplicate (group, v)
    * rows are safe (adjacent equal-value runs interpolate to the same
    * value); NULL v rows are dropped, as percentile drops them.
    *
    * Returns one row per group: (group, n_rows = value-domain row count,
    * pcts ARRAY<DOUBLE> in `fracs` order). `dom` is scanned three times
    * (boundaries, band fold, touched-band windows) — checkpoint it first
    * if it is expensive to recompute.
    */
  def exactPercentilesWeightedBy(dom: DataFrame, group: String, v: String,
      f: String, fracs: Seq[Double], nBands: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = dom.select(col(group).as("__g"), col(v).as("__v"),
      col(f).as("__f")).filter(col("__v").isNotNull)
    val bfr = (1 until nBands).map(i => i.toDouble / nBands)
    val bnds: Seq[(Any, Seq[Double])] = src
      .groupBy(col("__g"))
      .agg(percentile_approx(col("__v"), typedLit(bfr), lit(100)).as("b"))
      .collect().toSeq.map(r => r.get(0) -> r.getSeq[Double](1))
    val bandCol = bnds.foldLeft(lit(0L)) { case (acc, (g, bs)) =>
      val e = bs.map(b => when(col("__v") > lit(b), 1L).otherwise(0L))
        .reduceOption(_ + _).getOrElse(lit(0L))
      when(col("__g") === lit(g), e).otherwise(acc)
    }
    val banded = src.withColumn("band", bandCol)
    val wg = Window.partitionBy(col("__g")).orderBy(col("band"))
    val counts = banded.groupBy(col("__g"), col("band"))
      .agg(sum(col("__f")).as("cnt"), count(lit(1)).as("band_rows"))
      .withColumn("cum_before", coalesce(
        sum(col("cnt")).over(wg.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .localCheckpoint() // |groups|·nBands rows, three consumers
    val totals = counts.groupBy(col("__g"))
      .agg(sum(col("cnt")).as("n"), sum(col("band_rows")).as("n_rows"))
    // needed (weighted global rank, kind) pairs per (group, fraction):
    // floor(pos) and ceil(pos), pos = q·(N−1) — Percentile's arithmetic
    val ranks = totals
      .select(col("__g"), col("n"), col("n_rows"),
        posexplode(typedLit(fracs)).as(Seq("ord", "q")))
      .withColumn("pos", expr("q * CAST(n - 1 AS DOUBLE)"))
      .withColumn("lo", expr("CAST(floor(pos) AS BIGINT)"))
      .withColumn("hi", expr("CAST(ceil(pos) AS BIGINT)"))
      .select(col("__g"), col("ord"), col("pos"), col("lo"), col("hi"),
        explode(expr(
          """array(named_struct('kind', 0, 'idx', lo),
                   named_struct('kind', 1, 'idx', hi))""")).as("rk"))
      .select(col("__g"), col("ord"), col("pos"), col("lo"), col("hi"),
        col("rk.kind").as("kind"), col("rk.idx").as("idx"))
    // locate each rank's band + local weighted rank (tiny broadcast join)
    val needed = ranks.as("r").join(broadcast(counts).as("c"),
        col("r.__g") === col("c.__g") &&
          col("idx") >= col("cum_before") &&
          col("idx") < col("cum_before") + col("cnt"))
      .select(col("r.__g").as("__g"), col("ord"), col("pos"), col("lo"),
        col("hi"), col("kind"), col("band"),
        (col("idx") - col("cum_before")).as("lr"))
    // order statistics from ONLY the touched bands: per-(group, band)
    // window cumsum of the weights, one matching row per needed rank
    val wb = Window.partitionBy(col("__g"), col("band")).orderBy(col("__v"))
    val stats = banded
      .join(broadcast(needed.select(col("__g"), col("band")).distinct()),
        Seq("__g", "band"), "left_semi")
      .withColumn("cw", coalesce(
        sum(col("__f")).over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .join(broadcast(needed), Seq("__g", "band"))
      .filter(col("cw") <= col("lr") && col("lr") < col("cw") + col("__f"))
      .select(col("__g"), col("ord"), col("pos"), col("lo"), col("hi"),
        col("kind"), col("__v"))
    stats.groupBy(col("__g"), col("ord"), col("pos"), col("lo"), col("hi"))
      .agg(min(when(col("kind") === 0, col("__v"))).as("v1"),
        min(when(col("kind") === 1, col("__v"))).as("v2"))
      .withColumn("p", expr(
        """CASE WHEN hi = lo THEN v1
           ELSE (CAST(hi AS DOUBLE) - pos) * v1 + (pos - CAST(lo AS DOUBLE)) * v2
           END"""))
      .groupBy(col("__g"))
      .agg(expr("transform(array_sort(collect_list(struct(ord, p))), x -> x.p)")
        .as("pcts"))
      .join(broadcast(totals.select(col("__g"), col("n_rows"))), Seq("__g"))
      .select(col("__g").as(group), col("n_rows"), col("pcts"))
  }
}
