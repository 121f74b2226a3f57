package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** G-block: geospatial zone aggregation — the pickup/dropoff → zone rollup
  * stage of a trip pipeline.
  *
  * The testdata carries no coordinate columns, so q53 synthesizes
  * deterministic lat/lon from (user_id, value) with pure arithmetic that
  * both engines evaluate bit-identically; the operators under test are the
  * grid-cell assignment (a pure projection — scales with zero shuffle) and
  * the zone rollup (one map-side-combining aggregation). With real data the
  * synthetic projection is replaced by the table's own coordinates and
  * everything downstream is unchanged.
  */
object Geo {

  /** grid origin / cell size: a ~0.05° grid over a city bounding box. */
  private val Lat0 = 39.8
  private val Lon0 = -75.3
  private val Cell = 0.05

  private def synthLat: Column =
    lit(39.9) + (col("user_id") % 37).cast("double") * 0.01 + col("value") * 1e-4
  private def synthLon: Column =
    lit(-75.2) + (col("user_id") % 53).cast("double") * 0.01 - col("value") * 1e-4

  /** Grid-cell id for a coordinate: floor offset in cell units. */
  def zone(coord: Column, origin: Double, cell: Double): Column =
    floor((coord - lit(origin)) / lit(cell)).cast("long")

  /** q53: zone assignment + rollup — trips per grid zone with value stats.
    * Cell assignment is a projection; the rollup shuffles only (zone_x,
    * zone_y) keys, so the plan is scan → partial agg → one exchange.
    */
  def q53GeoZones(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("lat", synthLat)
      .withColumn("lon", synthLon)
      .withColumn("zone_x", zone(col("lon"), Lon0, Cell))
      .withColumn("zone_y", zone(col("lat"), Lat0, Cell))
      .groupBy(col("zone_x"), col("zone_y"))
      .agg(
        count(lit(1)).as("n_trips"),
        round(avg(col("value")), 4).as("avg_value"),
        round(sum(col("value")), 2).as("total_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_geo_zones" -> (q53GeoZones _))

  val oracles: Map[String, String] = Map(
    "q53_geo_zones" ->
      s"""WITH pts AS (
            SELECT 39.9 + (user_id % 37) * 0.01 + value * 1e-4 AS lat,
                   -75.2 + (user_id % 53) * 0.01 - value * 1e-4 AS lon,
                   value
            FROM events)
          SELECT CAST(floor((lon - ($Lon0)) / $Cell) AS BIGINT) AS zone_x,
                 CAST(floor((lat - $Lat0) / $Cell) AS BIGINT) AS zone_y,
                 count(*) AS n_trips,
                 round(avg(value), 4) AS avg_value,
                 round(sum(value), 2) AS total_value
          FROM pts GROUP BY 1, 2""")
}
