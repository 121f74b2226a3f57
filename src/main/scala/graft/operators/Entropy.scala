package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant-bin + exact-integer-entropy profile over a (key, bin, cnt)
  * count table — the shared kernel behind q211 (source × lang mix) and
  * q217 (event_type × hour-of-day): per key, the bin count, the dominant
  * bin with its share, and the distribution entropy in millinats.
  *
  * Entropy is exact-integer to the last step: H = ln N − (Σ c·ln c)/N,
  * computed as (lq(N)·N − Σ c·lq(c)) / N with lq = round(ln·1e6) BIGINT —
  * the numerator is an exact integer in both engines, one floating
  * division + round at the end. Dominant rank is deterministic
  * (cnt DESC, bin ASC). Both the DataFrame builder and the DuckDB oracle
  * generator live here so the two engines share ONE definition — a
  * drifted copy would silently diverge the parity contract.
  *
  * Scale shape: the input is an already-aggregated count table
  * (|keys × bins| rows); every window here runs over that bounded frame,
  * never a raw fact table.
  */
object Entropy {

  /** Columns out: key, n_total, n_bins, top_bin, top_share_bp,
    * entropy_x1000. Callers rename to their domain vocabulary.
    */
  private[graft] def dominantAndEntropy(counts: DataFrame, key: String,
      bin: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col(key))
    counts
      .withColumn("rnk", row_number().over(byKey.orderBy(col("cnt").desc, col(bin))))
      .withColumn("n_total", sum(col("cnt")).over(byKey))
      .withColumn("n_bins", count(lit(1)).over(byKey))
      .withColumn("sclnc", sum(expr(
        "cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)")).over(byKey))
      .filter(col("rnk") === 1)
      .select(col(key), col("n_total"), col("n_bins"), col(bin).as("top_bin"),
        expr("cnt * 10000 DIV n_total").as("top_share_bp"),
        expr("""CAST(round((CAST(round(ln(CAST(n_total AS DOUBLE)) * 1000000) AS BIGINT)
                * n_total - sclnc) / CAST(n_total AS DOUBLE) / 1000) AS BIGINT)""")
          .as("entropy_x1000"))
  }

  /** The DuckDB mirror of [[dominantAndEntropy]]: `src` must select
    * ($key, $bin, cnt). Output aliases are caller-supplied so the oracle
    * matches the renamed Spark columns.
    */
  private[graft] def dominantAndEntropySql(src: String, key: String, bin: String,
      outTotal: String, outBins: String, outTop: String): String =
    s"""WITH cl AS ($src),
         w AS (SELECT $key, $bin, cnt,
                      row_number() OVER (PARTITION BY $key
                                         ORDER BY cnt DESC, $bin) AS rnk,
                      CAST(sum(cnt) OVER (PARTITION BY $key) AS BIGINT) AS n_total,
                      count(*) OVER (PARTITION BY $key) AS n_bins,
                      CAST(sum(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000)
                               AS BIGINT)) OVER (PARTITION BY $key) AS BIGINT) AS sclnc
               FROM cl)
         SELECT $key, n_total AS $outTotal, n_bins AS $outBins, $bin AS $outTop,
                cnt * 10000 // n_total AS top_share_bp,
                CAST(round((CAST(round(ln(CAST(n_total AS DOUBLE)) * 1000000) AS BIGINT)
                  * n_total - sclnc) / CAST(n_total AS DOUBLE) / 1000) AS BIGINT)
                  AS entropy_x1000
         FROM w WHERE rnk = 1"""
}
