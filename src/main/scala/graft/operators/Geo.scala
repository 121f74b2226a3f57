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

  /** DuckDB mirrors of [[synthLat]]/[[synthLon]]/[[zone]] with every
    * literal FORCED to DOUBLE. DuckDB parses bare decimal literals as
    * DECIMAL and evaluates `39.9 + 5 * 0.01` EXACTLY (then one
    * decimal→double cast), where the Column form's IEEE chain rounds at
    * every op — on cell-corner inputs (value = 0, user_id % 37 ≡ 0 mod 5,
    * where the synthetic grid lands exactly on a 0.05° boundary) the two
    * sides of floor() disagree by one whole zone. Found by the r16 sf≈1
    * oracle sweep (q161: replica user ids minted fresh corner combos the
    * tri-SF data never hit); the forced casts make every arithmetic step
    * the SAME double operation in the SAME order on both engines. ONE
    * definition per engine for every floor-zone oracle below — the
    * µ-unit `round(lat * 1e6)` oracles intentionally keep DECIMAL
    * semantics because their Spark side is an `expr()` string whose bare
    * literals Spark ALSO parses as DECIMAL (matched pair, spec-pinned).
    */
  private val LatSql =
    "(CAST(39.9 AS DOUBLE) + (user_id % 37) * CAST(0.01 AS DOUBLE) + value * 1e-4)"
  private val LonSql =
    "(CAST(-75.2 AS DOUBLE) + (user_id % 53) * CAST(0.01 AS DOUBLE) - value * 1e-4)"
  private lazy val ZoneYSql =
    s"CAST(floor(($LatSql - CAST($Lat0 AS DOUBLE)) / CAST($Cell AS DOUBLE)) AS BIGINT)"
  private lazy val ZoneXSql =
    s"CAST(floor(($LonSql - CAST($Lon0 AS DOUBLE)) / CAST($Cell AS DOUBLE)) AS BIGINT)"

  /** Grid-cell id for a coordinate: floor offset in cell units. */
  def zone(coord: Column, origin: Double, cell: Double): Column =
    floor((coord - lit(origin)) / lit(cell)).cast("long")

  /** Scalar twin of [[synthLat]]/[[synthLon]]/[[zone]] for per-row state
    * code (s17): the SAME double operations in the SAME order as the
    * Column form, kept BESIDE it so a grid or synth change edits both or
    * neither — the streaming cells must be bit-identical to q159's.
    */
  private[graft] def zoneOfScalar(userId: Long, value: Double): (Long, Long) = {
    val lat = 39.9 + (userId % 37) * 0.01 + value * 1e-4
    val lon = -75.2 + (userId % 53) * 0.01 - value * 1e-4
    (math.floor((lon - Lon0) / Cell).toLong,
     math.floor((lat - Lat0) / Cell).toLong)
  }

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
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("total_value"))

  /** THE zone-tagged trips frame — one session per row with endpoint
    * zones and timestamps, the single definition q63/q161/q166 all
    * consume (the Events.withSessionNo rule: endpoint tie-break, zone
    * tagging and the session gap live in exactly one place). Consumers
    * that don't need the timestamps lose nothing: Catalyst prunes unused
    * aggregate expressions. ONE event-scale user_id exchange — the
    * session window and this rollup share its partitioning.
    */
  private def zoneTrips(s: SparkSession, dir: String): DataFrame = {
    val key = struct(unix_micros(col("ts")), col("event_id"))
    Events.withSessionNo(
      Tables.events(s, dir)
        .withColumn("lat", synthLat)
        .withColumn("lon", synthLon)
        .withColumn("zone_x", zone(col("lon"), Lon0, Cell))
        .withColumn("zone_y", zone(col("lat"), Lat0, Cell)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        min_by(col("zone_x"), key).as("origin_x"),
        min_by(col("zone_y"), key).as("origin_y"),
        max_by(col("zone_x"), key).as("dest_x"),
        max_by(col("zone_y"), key).as("dest_y"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"))
  }

  /** q63: origin→destination matrix — each session's first event supplies
    * the origin zone, its last the destination zone; the rollup counts
    * trips per OD pair with the integer Manhattan cell distance (integer
    * outputs keep the oracle hash free of transcendental-libm ULP risk —
    * haversine over cell centroids is a client-side projection away).
    * Shape: [[zoneTrips]] → one OD-key shuffle.
    */
  def q63OdMatrix(s: SparkSession, dir: String): DataFrame =
    zoneTrips(s, dir)
      .groupBy(col("origin_x"), col("origin_y"), col("dest_x"), col("dest_y"))
      .agg(count(lit(1)).as("n_trips"))
      .withColumn("cell_dist",
        abs(col("dest_x") - col("origin_x")) + abs(col("dest_y") - col("origin_y")))

  /** q299: zone GRAVITY / distance-decay profile — trip mass as a
    * function of OD cell distance: per Manhattan ring distance d, the
    * distinct OD pairs at that distance, total trips, trips-per-pair
    * ×100 (the decay curve a gravity model fits) and the trip-share bp.
    * q63 is the raw matrix and q180 its per-origin mixing; this is the
    * MARGINAL over distance — the one-line answer to "how local is
    * demand", and the decay slope a pricing/rebalancing model consumes.
    * Self-loops (d = 0) row like any other ring, so the short-haul share
    * reads directly off the table.
    *
    * Scale shape: q63's frame folded once more by distance — the
    * event-scale work is the shared session-trip derivation; the
    * distance fold is |zones|²-bounded in and |distances|-bounded out,
    * and the corpus total is an unpartitioned window over THAT bounded
    * frame (the q295 rule: never a second event scan for a scalar).
    */
  def q299ZoneGravity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    q63OdMatrix(s, dir)
      .groupBy(col("cell_dist"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("n_trips")).as("n_trips"))
      .withColumn("tot", sum(col("n_trips")).over(wAll))
      .select(col("cell_dist"), col("n_pairs"), col("n_trips"),
        expr("n_trips * 100 DIV n_pairs").as("trips_per_pair_x100"),
        expr("n_trips * 10000 DIV tot").as("share_bp"))
  }

  /** q288: OD-pair ASYMMETRY — the directional-imbalance table planners
    * read beside q63's raw matrix and q161's per-zone flux: per unordered
    * zone pair (canonical (x, y)-lexicographic orientation), the flow in
    * each direction, integer imbalance_bp = |ab − ba|·10⁴/(ab + ba) and
    * the net direction. A balanced pair is commuting that returns; a
    * one-way pair is fleet DRIFT — vehicles/supply accumulate at one end
    * and a rebalancing plan starts from exactly this table. Self-loop
    * trips are excluded (they carry no direction).
    *
    * Scale shape: everything derives from q63's zone-pair frame
    * (|zones|²-bounded — the event-scale work is the shared session-trip
    * derivation, one user_id exchange); the canonicalization is a pure
    * projection and the pair fold is grid-bounded.
    */
  def q288OdAsymmetry(s: SparkSession, dir: String): DataFrame = {
    val od = q63OdMatrix(s, dir)
      .filter(!(col("origin_x") === col("dest_x") && col("origin_y") === col("dest_y")))
      .withColumn("fwd",
        col("origin_x") < col("dest_x") ||
          (col("origin_x") === col("dest_x") && col("origin_y") < col("dest_y")))
    od.select(
        when(col("fwd"), col("origin_x")).otherwise(col("dest_x")).as("ax"),
        when(col("fwd"), col("origin_y")).otherwise(col("dest_y")).as("ay"),
        when(col("fwd"), col("dest_x")).otherwise(col("origin_x")).as("bx"),
        when(col("fwd"), col("dest_y")).otherwise(col("origin_y")).as("by"),
        when(col("fwd"), col("n_trips")).otherwise(lit(0L)).as("f_ab"),
        when(col("fwd"), lit(0L)).otherwise(col("n_trips")).as("f_ba"))
      .groupBy(col("ax"), col("ay"), col("bx"), col("by"))
      .agg(sum(col("f_ab")).as("flow_ab"), sum(col("f_ba")).as("flow_ba"))
      .select(col("ax"), col("ay"), col("bx"), col("by"),
        col("flow_ab"), col("flow_ba"),
        expr("abs(flow_ab - flow_ba) * 10000 DIV (flow_ab + flow_ba)")
          .as("imbalance_bp"),
        when(col("flow_ab") > col("flow_ba"), "ab")
          .when(col("flow_ba") > col("flow_ab"), "ba")
          .otherwise("balanced").as("net_dir"))
  }

  /** q295: hotspot PERSISTENCE — pop-up vs permanent demand per zone: how
    * many calendar weeks of the corpus span each zone saw activity,
    * persistence in integer bp against the global week count, and the
    * all-weeks `persistent` flag. q167 ranks hotspots by mass at a
    * moment; a planner siting fixed infrastructure needs to know whether
    * a hot zone is a festival (one hot week) or a habit (every week) —
    * that is THIS column. Calendar weeks are epoch-day DIV 7, exact on
    * both engines.
    *
    * Scale shape: ONE event scan — the per-zone fold carries min/max week
    * alongside the distinct-week count, and the global span is an
    * unpartitioned window over the |zones|-bounded aggregated frame
    * (value-domain window, never event-scale). The r15 verdict flagged
    * the previous shape (a second full events scan crossJoined back for
    * two scalars the partials already contained); this derives the span
    * from the aggregate itself.
    */
  def q295HotspotPersistence(s: SparkSession, dir: String): DataFrame =
    hotspotPersistenceOf(zoneWeekCellsOf(Tables.events(s, dir)))

  /** The (zone_x, zone_y, wk) → n cell fold over ANY events frame — ONE
    * definition shared by q295's batch scan and the s36 streaming
    * monitor's per-micro-batch fragment (the additive monoid both merge
    * on; batch/stream drift impossible). Map-side-combined: the exchange
    * carries the \|zones × weeks\| value domain, never event rows. */
  private[graft] def zoneWeekCellsOf(events: DataFrame): DataFrame =
    events
      .withColumn("lat", synthLat)
      .withColumn("lon", synthLon)
      .select(zone(col("lon"), Lon0, Cell).as("zone_x"),
        zone(col("lat"), Lat0, Cell).as("zone_y"),
        expr("unix_micros(ts) DIV 86400000000 DIV 7").as("wk"))
      .groupBy(col("zone_x"), col("zone_y"), col("wk"))
      .agg(count(lit(1)).as("n"))

  /** q295's report from a (zone_x, zone_y, wk, n) cell frame — the SAME
    * derivation serves the one-shot scan and the s36-maintained table.
    * distinct weeks = cell rows per zone; the global span is an
    * unpartitioned window over the \|zones\|-bounded fold (never a second
    * event scan). */
  private[graft] def hotspotPersistenceOf(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells.groupBy(col("zone_x"), col("zone_y"))
      .agg(count(lit(1)).as("weeks_active"),
        sum(col("n")).as("n_events"),
        min(col("wk")).as("zmin_wk"), max(col("wk")).as("zmax_wk"))
      .withColumn("n_weeks",
        max(col("zmax_wk")).over(wAll) - min(col("zmin_wk")).over(wAll) + 1)
      .select(col("zone_x"), col("zone_y"), col("n_events"),
        col("weeks_active"), col("n_weeks"),
        expr("weeks_active * 10000 DIV n_weeks").as("persistence_bp"),
        (col("weeks_active") === col("n_weeks")).as("persistent"))
  }

  /** q116: nearest-station assignment — every event snapped to the closest
    * of a small station grid (argmin over squared integer micro-degree
    * distance), then rolled up per station: the "assign trips to the
    * nearest depot/taxi-stand" operator of a trip pipeline, and the
    * 1-NN/Voronoi building block of any spatial rollup.
    *
    * The station dim (25 rows) is a DRIVER-HELD model (the k-means/IVF
    * centroid pattern — a real deployment collects its small stations
    * table once): the argmin is ONE codegen `least()` over 25 inlined
    * packed-distance terms, i.e. a pure projection — no 25× row
    * expansion, no event_id aggregate, no exchange until the 25-row
    * station rollup (map-side combined). The r9 A/B against the previous
    * broadcast-nested-loop + packed-min-groupBy form measured 1.88 →
    * 0.49–0.52 s at sf0.1 with hash-identical output; at 100 TB the old form
    * shuffled one row per EVENT (partial-agg'd but still event-scale),
    * this form's only exchange carries ≤ 25 rows per task. Packing:
    * d2*32+id is lexicographic (d2, id) because id < 32, cannot overflow
    * while d2 < 2^57 (a city box in squared micro-degrees is ~2^40), and
    * all distances are exact integers — the argmin cannot ulp-flip; the
    * station_id tiebreak makes equidistant points deterministic.
    */
  def q116NearestZone(s: SparkSession, dir: String): DataFrame = {
    val stations = (0 until 25).map(i =>
      (i.toLong, 39850000L + (i % 5) * 50000L, -75250000L + (i / 5) * 50000L))
    val packedMin = stations.map { case (id, la, lo) =>
      s"((ulat - ($la)) * (ulat - ($la)) + (ulon - ($lo)) * (ulon - ($lo))) * 32 + $id"
    }.mkString("least(", ", ", ")")
    Tables.events(s, dir)
      .select(
        expr("CAST(round((39.9 + (user_id % 37) * 0.01 + value * 1e-4) * 1000000) AS BIGINT)")
          .as("ulat"),
        expr("CAST(round((-75.2 + (user_id % 53) * 0.01 - value * 1e-4) * 1000000) AS BIGINT)")
          .as("ulon"))
      .select(expr(packedMin).as("p"))
      .select(expr("p % 32").as("station_id"), expr("p DIV 32").as("d2"))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"),
        sum(col("d2")).as("sum_d2"))
      .select(col("station_id"), col("n_events"), col("min_d2"),
        col("max_d2"), expr("sum_d2 DIV n_events").as("avg_d2"))
  }

  /** Bit-interleaved (Morton / z-order) key over two non-negative cell
    * coordinates, built from `bits` div/mod terms — NO bit operators, so
    * the SAME formula text (modulo the div token) runs in Spark and
    * DuckDB. Shared between the q119 plan and its oracle so the two can
    * never drift (the q99 builder rule).
    */
  private[graft] def zTerms(x: String, y: String, bits: Int,
      divOp: String): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($x $divOp $p) % 2) * ${1L << (2 * i + 1)}" +
        s" + (($y $divOp $p) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** q119: space-filling-curve layout key — each event's (zone_x, zone_y)
    * interleaved into one Morton key. THIS is the write-time clustering
    * story for 2-D predicates at 100 TB: `repartitionByRange(zkey)` +
    * sort-within-partitions gives every parquet file a tight min/max on
    * BOTH zone columns simultaneously (a 1-D sort is tight in one and
    * useless in the other), so a rectangle predicate prunes files in both
    * dimensions. The key itself is a pure projection (zero shuffle); the
    * spec pins the locality property (consecutive zkey cells are near in
    * Manhattan distance vs. a row-order baseline) and the RangePartitioning
    * plan of the layout write.
    */
  def q119ZorderKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("lat", synthLat)
      .withColumn("lon", synthLon)
      .withColumn("zone_x", zone(col("lon"), Lon0, Cell))
      .withColumn("zone_y", zone(col("lat"), Lat0, Cell))
      .select(col("event_id"), col("zone_x"), col("zone_y"),
        expr(zTerms("zone_x", "zone_y", 8, "DIV")).as("zkey"))

  /** Irregular polygon zone table for [[q131PipZones]] — six simple
    * polygons (4–7 vertices, two concave) in integer micro-degrees over
    * the same synthetic city box as q116, with pairwise-disjoint bounding
    * boxes. One shared literal feeds BOTH the Spark edge frame and the
    * oracle's VALUES list (the q99/zTerms builder rule), so the two
    * engines can never see different geometry.
    */
  private[graft] val pipPolygons: Seq[(Int, Seq[(Long, Long)])] = Seq(
    // The synthetic point cloud is (user_id mod)-driven: each user's
    // points share s = ulon+ulat (their lattice cell's anti-diagonal) and
    // spread along d = ulat−ulon with `value`. The zones are therefore
    // 45°-rotated polygons cut from consecutive slabs of s — every zone
    // catches points at EVERY SF (the smallest SF's 15 users span s ∈
    // [−35.30M, −35.02M]), and disjoint s-intervals make the zones
    // provably disjoint (s is linear, so a separating line exists; the
    // spec still proves pairwise disjointness geometrically).
    0 -> Seq((-75202000L, 39894000L), (-75190000L, 39900000L),
      (-75185000L, 39913000L), (-75218000L, 39946000L),
      (-75231000L, 39941000L), (-75237000L, 39929000L)),
    1 -> Seq((-75180000L, 39912000L), (-75154000L, 39942000L),
      (-75190000L, 39978000L), (-75208000L, 39968000L),
      (-75216000L, 39948000L)),
    2 -> Seq((-75151000L, 39943000L), (-75131000L, 39959000L),
      (-75171000L, 39999000L), (-75187000L, 39979000L)),
    3 -> Seq((-75131000L, 39963000L), (-75119667L, 39970333L),
      (-75104000L, 39992000L), (-75137000L, 40025000L),
      (-75142334L, 40011666L), (-75161667L, 40012333L),
      (-75168000L, 40000000L)),
    4 -> Seq((-75099000L, 39991000L), (-75083000L, 40011000L),
      (-75119000L, 40047000L), (-75132000L, 40042000L),
      (-75138000L, 40030000L)),
    5 -> Seq((-75082000L, 40014000L), (-75066000L, 40026000L),
      (-75051000L, 40039000L), (-75090000L, 40078000L),
      (-75103000L, 40063000L), (-75120000L, 40052000L)))

  /** Ring → directed edge list (zone_id, x1, y1, x2, y2), closing each
    * polygon back to its first vertex.
    */
  private[graft] def pipEdges: Seq[(Int, Long, Long, Long, Long)] =
    pipPolygons.flatMap { case (z, ring) =>
      ring.zip(ring.tail :+ ring.head).map { case ((x1, y1), (x2, y2)) =>
        (z, x1, y1, x2, y2)
      }
    }

  /** Even-odd ray-cast edge-crossing predicate over integer micro-degree
    * columns — the SAME formula text runs in Spark and DuckDB. The test
    * casts a ray from (px, py) toward +x and counts strict crossings with
    * the half-open vertex rule `(y1 > py) <> (y2 > py)` (each vertex
    * belongs to exactly one of its two edges, so a ray through a vertex
    * never double-counts). The x-intersection compare is cross-multiplied
    * — `(x2-x1)(py-y1) - (px-x1)(y2-y1)` sign-matched against the edge's
    * y direction — so no division, no doubles: every term is exact BIGINT
    * (city-box deltas are < 10^6 µdeg, so products stay < 2^41).
    *
    * Boundary tie rule (pinned by GeoSpec): with this formulation a point
    * exactly ON the boundary lands inside for left/bottom edges and
    * outside for right/top edges (PNPOLY's classic half-open convention),
    * so abutting zones sharing an edge would assign each boundary point
    * to exactly one zone.
    */
  private[graft] def rayCrossSql(px: String, py: String): String =
    s"""((y1 > $py) <> (y2 > $py)) AND
        (CASE WHEN y2 > y1
              THEN (x2 - x1) * ($py - y1) - ($px - x1) * (y2 - y1) > 0
              ELSE (x2 - x1) * ($py - y1) - ($px - x1) * (y2 - y1) < 0 END)"""

  /** q131: point-in-polygon zone assignment — trips assigned to IRREGULAR
    * polygon zones (the real municipal taxi-zone semantics; q53's grid and
    * q116's Voronoi snap are the regular approximations) and rolled up per
    * zone. Even-odd ray cast: count ray/edge crossings per (event, zone),
    * odd = contained.
    *
    * Shape: the edge table (34 rows) broadcasts; the expansion is a
    * |edges|× projection multiplier immediately cut by the crossing filter
    * and partially aggregated on (event_id, zone_id) before its one real
    * exchange — the q116 pattern with a predicate instead of an argmin. At
    * 100 TB a real zone table (a few hundred zones × dozens of vertices)
    * still broadcasts at ~100 KB; only if zones × edges outgrew the
    * executor heap would this need the bbox-bucketed join fallback (assign
    * candidate zones by grid cell first, ray-cast within the cell).
    */
  def q131PipZones(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = broadcast(
      pipEdges.toDF("zone_id", "x1", "y1", "x2", "y2"))
    Tables.events(s, dir)
      .select(col("event_id"), col("value"),
        expr("CAST(round((39.9 + (user_id % 37) * 0.01 + value * 1e-4) * 1000000) AS BIGINT)")
          .as("ulat"),
        expr("CAST(round((-75.2 + (user_id % 53) * 0.01 - value * 1e-4) * 1000000) AS BIGINT)")
          .as("ulon"))
      .crossJoin(edges)
      .filter(expr(rayCrossSql("ulon", "ulat")))
      .groupBy(col("event_id"), col("zone_id"))
      // min, not first: value is constant per event, and min renders the
      // same on the oracle side (first() has no deterministic SQL twin)
      .agg(count(lit(1)).as("n_cross"), min(col("value")).as("value"))
      .filter(col("n_cross") % 2 === 1)
      .groupBy(col("zone_id"))
      .agg(count(lit(1)).as("n_trips"),
        round(avg(col("value")), 4).as("avg_value"),
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("total_value"))
  }

  /** Hex cell size in degrees (center-to-edge scale parameter). */
  private val HexSize = 0.03

  /** The pointy-top axial hex assignment as a SHARED chain of named
    * intermediate formulas (the zTerms/q99 builder rule, applied to a
    * multi-step computation): fractional axial coords, then cube rounding
    * with `floor(v + 0.5)` as the rounding primitive — both engines
    * define it identically, unlike round()'s half-even/half-up split.
    * Every step is the same IEEE double expression TEXT in Spark and
    * DuckDB (constants written as literals — sqrt(3)/3 etc. pre-folded),
    * so the assignment cannot ulp-diverge between plan and oracle: same
    * ops, same order, same doubles.
    */
  private[graft] def hexSteps(lat: String, lon: String): Seq[(String, String)] = Seq(
    "qf" -> s"(0.5773502691896258 * ($lon) - 0.3333333333333333 * ($lat)) / $HexSize",
    "rf" -> s"(0.6666666666666666 * ($lat)) / $HexSize",
    "sf" -> "-qf - rf",
    "rq" -> "CAST(floor(qf + 0.5) AS BIGINT)",
    "rr" -> "CAST(floor(rf + 0.5) AS BIGINT)",
    "rs" -> "CAST(floor(sf + 0.5) AS BIGINT)",
    "dq" -> "abs(rq - qf)",
    "dr" -> "abs(rr - rf)",
    "ds" -> "abs(rs - sf)",
    // cube-round repair: push the axis with the largest rounding error
    // back onto the q+r+s=0 plane; only the q and r axes reach the output
    "hex_q" -> "CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END",
    "hex_r" -> "CASE WHEN NOT(dq > dr AND dq > ds) AND dr > ds THEN -rq - rs ELSE rr END")

  /** q133: hexagonal zone binning + rollup — the H3-style spatial index
    * every trip stack uses between q53's square grid and q131's exact
    * polygons: hexes have uniform center distance to all 6 neighbors, so
    * density rollups don't suffer the square grid's diagonal-neighbor
    * bias. Pure projection (zero shuffle for the assignment) + one
    * (hex_q, hex_r) rollup exchange — q53's plan shape on a hexagonal
    * lattice. The spec proves each point's assigned hex center is the
    * nearest of all its neighbor centers (the defining Voronoi property
    * of cube rounding).
    */
  def q133HexBins(s: SparkSession, dir: String): DataFrame =
    hexSteps("lat", "lon").foldLeft(
      Tables.events(s, dir)
        .withColumn("lat", synthLat)
        .withColumn("lon", synthLon)) { case (df, (name, f)) => df.withColumn(name, expr(f)) }
      .groupBy(col("hex_q"), col("hex_r"))
      .agg(count(lit(1)).as("n_trips"),
        round(avg(col("value")), 4).as("avg_value"),
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("total_value"))

  /** mm per micro-degree at the synthetic city's ~40°N latitude: 1 µdeg
    * of latitude ≈ 111 mm, of longitude ≈ 85 mm (cos 40° scaled). INTEGER
    * constants shared verbatim with the oracle, so displacement stays
    * exact BIGINT mm² end to end — no transcendental (cos/haversine)
    * whose libm rounding could differ between engines; the small-area
    * equirectangular error is irrelevant at city scale.
    */
  private val MmPerUlat = 111L
  private val MmPerUlon = 85L

  /** q135: trip displacement + speed plausibility — the spatial half of
    * q60's per-trip metrics and the physical-sanity QA gate every trip
    * feed needs (odometer-vs-clock checks): per session, the straight-line
    * origin→destination displacement, mean speed, and two impossibility
    * flags — `is_speeding` (mean speed above 120 km/h, the "GPS jumped a
    * city" signal) and `is_teleport` (distinct coordinates at identical
    * timestamps).
    *
    * Exactness: coordinates are integer micro-degrees, deltas scale by
    * integer mm-per-µdeg constants, so d2_mm2 is exact BIGINT (bounded by
    * the city box: |Δ| ≤ ~1.1e6 µdeg → d2 ≤ ~2e16, far inside int64);
    * dist_mm = floor(sqrt(d2)) is deterministic in both engines (IEEE
    * sqrt of an exact integer is correctly rounded, floor collapses the
    * shared value identically), and every speed comparison/division is
    * then pure integer arithmetic — 120 km/h enters as the exact cross-
    * multiplication 3·dist_mm > 100000·duration_s (100000/3 mm/s), never
    * as a rounded double threshold. Shape: q20's ONE user_id exchange →
    * per-session aggregate (min_by/max_by on the (µs, event_id) key picks
    * the endpoint coordinates in the same pass as the time bounds).
    */
  def q135TripSpeed(s: SparkSession, dir: String): DataFrame = {
    val key = struct(unix_micros(col("ts")), col("event_id"))
    Events.withSessionNo(
      Tables.events(s, dir)
        .withColumn("ulat",
          expr("CAST(round((39.9 + (user_id % 37) * 0.01 + value * 1e-4) * 1000000) AS BIGINT)"))
        .withColumn("ulon",
          expr("CAST(round((-75.2 + (user_id % 53) * 0.01 - value * 1e-4) * 1000000) AS BIGINT)")))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("t0_us"),
        max(unix_micros(col("ts"))).as("t1_us"),
        min_by(col("ulat"), key).as("f_ulat"),
        min_by(col("ulon"), key).as("f_ulon"),
        max_by(col("ulat"), key).as("l_ulat"),
        max_by(col("ulon"), key).as("l_ulon"))
      .withColumn("duration_s", expr("(t1_us - t0_us) DIV 1000000"))
      .withColumn("dx_mm", (col("l_ulon") - col("f_ulon")) * MmPerUlon)
      .withColumn("dy_mm", (col("l_ulat") - col("f_ulat")) * MmPerUlat)
      .withColumn("d2_mm2",
        col("dx_mm") * col("dx_mm") + col("dy_mm") * col("dy_mm"))
      .withColumn("dist_mm",
        expr("CAST(floor(sqrt(CAST(d2_mm2 AS DOUBLE))) AS BIGINT)"))
      .select(col("user_id"), col("sess_no"), col("n_events"),
        col("duration_s"),
        expr("dist_mm DIV 1000").as("dist_m"),
        expr("CASE WHEN duration_s > 0 THEN dist_mm DIV duration_s END")
          .as("speed_mmps"),
        expr("CAST(duration_s > 0 AND dist_mm * 3 > duration_s * 100000 AS INT)")
          .as("is_speeding"),
        expr("CAST(duration_s = 0 AND d2_mm2 > 0 AS INT)").as("is_teleport"))
  }

  /** q159: stay-point detection (the Zheng-et-al GPS-mining primitive —
    * where did each user LINGER, vs q20's when-were-they-active
    * sessions): maximal runs of consecutive same-zone events per user,
    * kept when the run has ≥ 3 events and spans ≥ 10 minutes. Spatial
    * gaps-and-islands — lag-change flag → running island id → island
    * rollup; re-visits to a zone stay separate islands (grouping carries
    * the island id, the output distinguishes them by enter_ts).
    *
    * Determinism: the zone projection is q53's bit-identical arithmetic;
    * dwell minutes are integer epoch-µs division (both engines truncate).
    *
    * Shape: ONE user_id exchange — the lag window, the running sum and
    * the island rollup (grouping keys prefixed by user_id) all reuse it;
    * the filter is post-aggregation. Zone assignment stays a projection.
    */
  def q159StayPoints(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("lat", synthLat)
      .withColumn("lon", synthLon)
      .select(col("user_id"), col("ts"), col("event_id"),
        zone(col("lon"), Lon0, Cell).as("zone_x"),
        zone(col("lat"), Lat0, Cell).as("zone_y"))
      .withColumn("moved", when(
        lag(col("zone_x"), 1).over(w).isNull ||
          lag(col("zone_x"), 1).over(w) =!= col("zone_x") ||
          lag(col("zone_y"), 1).over(w) =!= col("zone_y"), 1L).otherwise(0L))
      .withColumn("island", sum(col("moved")).over(w))
      .groupBy(col("user_id"), col("island"), col("zone_x"), col("zone_y"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("enter_ts"), max(col("ts")).as("exit_ts"))
      .withColumn("dwell_min",
        expr("(unix_micros(exit_ts) - unix_micros(enter_ts)) DIV 60000000"))
      .filter(col("n_events") >= 3 && col("dwell_min") >= 10)
      .select(col("user_id"), col("zone_x"), col("zone_y"),
        col("enter_ts"), col("exit_ts"), col("n_events"), col("dwell_min"))
  }

  /** q161: zone flux — per (zone, hour-of-day) ARRIVALS vs DEPARTURES and
    * their net, the rebalancing/relocation view q63's OD matrix doesn't
    * give (a fleet operator moves vehicles FROM chronically-positive
    * zones TO chronically-negative ones). Each session (q63's trips)
    * departs its origin zone at its start hour and arrives at its
    * destination zone at its end hour; single-event sessions arrive and
    * depart in place, identically in both engines.
    *
    * Shape: ONE event-scale user_id exchange (sessionize window + the
    * endpoint rollup riding its partitioning), the trips frame
    * localCheckpointed (two tagged consumers — Catalyst has no CSE; the
    * materialized frame is one row per session, not per event), then a
    * union of two projections into one (zone, hod) rollup — map-side
    * combined, grid×24-bounded.
    */
  def q161ZoneFlux(s: SparkSession, dir: String): DataFrame = {
    val trips = zoneTrips(s, dir).localCheckpoint()
    val dep = trips.select(col("origin_x").as("zone_x"), col("origin_y").as("zone_y"),
      hour(col("start_ts")).cast("long").as("hod"),
      lit(1L).as("dep"), lit(0L).as("arr"))
    val arr = trips.select(col("dest_x").as("zone_x"), col("dest_y").as("zone_y"),
      hour(col("end_ts")).cast("long").as("hod"),
      lit(0L).as("dep"), lit(1L).as("arr"))
    dep.unionAll(arr)
      .groupBy(col("zone_x"), col("zone_y"), col("hod"))
      .agg(sum(col("arr")).as("n_arrivals"), sum(col("dep")).as("n_departures"))
      .withColumn("net_flux", col("n_arrivals") - col("n_departures"))
  }

  /** q164: kernel-smoothed zone density — the heatmap surface behind every
    * trip-demand map: raw per-cell counts convolved with a truncated 3×3
    * kernel (center 4, edge 2, corner 1 — a binomial approximation of a
    * Gaussian, integer weights so the surface is engine-exact). Halo
    * cells (zero raw events, nonzero smoothed mass from neighbors) are
    * part of the surface; border cells simply sum fewer contributors
    * (standard truncated-kernel behavior), identically in both engines.
    *
    * Shape: the convolution runs on the GRID, not the events — one
    * event-scale map-side-combined cell count, then a 9× explode of the
    * grid-bounded frame into a second grid-bounded rollup. Zero
    * event-scale shuffles beyond the first aggregate at any corpus size.
    */
  def q164ZoneDensity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("lat", synthLat)
      .withColumn("lon", synthLon)
      .groupBy(zone(col("lon"), Lon0, Cell).as("zx"),
        zone(col("lat"), Lat0, Cell).as("zy"))
      .agg(count(lit(1)).as("n"))
      .select(col("zx"), col("zy"), col("n"), explode(expr(
        Seq((-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
            (0, -1, 2), (0, 0, 4), (0, 1, 2),
            (1, -1, 1), (1, 0, 2), (1, 1, 1))
          .map { case (dx, dy, w) => s"struct($dx AS dx, $dy AS dy, $w AS w)" }
          .mkString("array(", ", ", ")"))).as("k"))
      .groupBy((col("zx") + col("k.dx")).as("zone_x"),
        (col("zy") + col("k.dy")).as("zone_y"))
      .agg(sum(col("n") * col("k.w")).as("density_w"))

  /** q166: travel-time outliers — trips whose duration deviates more
    * than 3σ from their own ORIGIN→DESTINATION pair's distribution (the
    * incident/meter-fraud flag of a trip QA pipeline: a route's normal
    * time is the baseline, not the network's). Only OD pairs with ≥ 30
    * trips are judged (below that, σ is noise). The z-test is EXACT
    * integer arithmetic — |x − μ| > 3σ rewritten as
    * (n·x − Σx)² > 9·(n·Σx² − (Σx)²), no division, no sqrt, no doubles
    * (the q87/q165 sufficient-statistic rule; with seconds-granularity
    * durations the squares stay far inside BIGINT — a deployment with
    * n·x beyond ~3·10⁹·s would move the two comparison sides to
    * DECIMAL(38,0), same shapes).
    *
    * Shape: ONE event-scale user_id exchange (session window + endpoint
    * rollup), trips localCheckpointed (stats + probe consumers), the OD
    * stats frame is grid⁴-bounded and broadcast back — the outlier
    * filter is a projection over the trips frame.
    */
  def q166OdOutliers(s: SparkSession, dir: String): DataFrame = {
    val trips = zoneTrips(s, dir)
      .withColumn("dur_s",
        expr("(unix_micros(end_ts) - unix_micros(start_ts)) DIV 1000000"))
      .localCheckpoint()
    val odKeys = Seq("origin_x", "origin_y", "dest_x", "dest_y")
    val stats = trips.groupBy(odKeys.map(col): _*)
      .agg(count(lit(1)).as("od_n"), sum(col("dur_s")).as("sx"),
        sum(col("dur_s") * col("dur_s")).as("sxx"))
      .filter(col("od_n") >= 30)
    trips.join(broadcast(stats), odKeys)
      .withColumn("dev", col("od_n") * col("dur_s") - col("sx"))
      .filter(expr("dev * dev > 9 * (od_n * sxx - sx * sx)"))
      .select(col("user_id"), col("sess_no"),
        col("origin_x"), col("origin_y"), col("dest_x"), col("dest_y"),
        col("dur_s"), col("od_n"),
        expr("sx DIV od_n").as("od_mean_s"),
        when(col("dev") < 0, "fast").otherwise("slow").as("direction"))
  }

  /** q167: hot/cold-spot detection — Getis–Ord Gi* with binary 3×3
    * weights over the occupied zone grid: a cell is HOT when its
    * neighborhood sum G = Σ_{j ∈ 3×3 ∩ occupied} nⱼ (self included, k
    * occupied neighbors) sits more than 2σ above what a random draw of k
    * cells from the grid would give, COLD symmetric below. The Gi*
    * z-score's sqrt never materializes: z > 2 is tested as
    * dev > 0 ∧ dev²·(N−1) > 4·(N·Σn²−(Σn)²)·(N·k−k²) with
    * dev = N·G − k·Σn — every factor an exact integer in both engines
    * (the q166 squared-form rule). Magnitude bound: dev²·(N−1) tops out
    * near 10¹⁸ on the driver grid (~9× inside BIGINT); a deployment
    * with N·Σn ≳ 10⁹ moves both comparison sides to DECIMAL(38,0).
    *
    * Shape: one event-scale map-side-combined cell count; the
    * neighborhood sums are the q164 trick JOINED BACK to occupied cells
    * (contributions explode the GRID frame, 9 rows per occupied cell);
    * global stats are a 1-row broadcast — everything after the first
    * aggregate is grid-bounded.
    */
  def q167Hotspots(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .withColumn("lat", synthLat)
      .withColumn("lon", synthLon)
      .groupBy(zone(col("lon"), Lon0, Cell).as("zone_x"),
        zone(col("lat"), Lat0, Cell).as("zone_y"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // three consumers: contribs, join, globals
    val contribs = cells
      .select(col("zone_x").as("cx"), col("zone_y").as("cy"), col("n").as("cn"),
        explode(expr(
          (for (dx <- -1 to 1; dy <- -1 to 1)
            yield s"struct($dx AS dx, $dy AS dy)").mkString("array(", ", ", ")")))
          .as("k"))
      .groupBy((col("cx") + col("k.dx")).as("zone_x"),
        (col("cy") + col("k.dy")).as("zone_y"))
      .agg(sum(col("cn")).as("g_sum"), count(lit(1)).as("k_nbrs"))
    val globals = cells.agg(count(lit(1)).as("n_cells"),
      sum(col("n")).as("tot"), sum(col("n") * col("n")).as("tot_sq"))
    cells.join(contribs, Seq("zone_x", "zone_y"))
      .crossJoin(broadcast(globals))
      .withColumn("dev", expr("n_cells * g_sum - k_nbrs * tot"))
      .withColumn("var_term", expr(
        "4 * (n_cells * tot_sq - tot * tot) * (n_cells * k_nbrs - k_nbrs * k_nbrs)"))
      .withColumn("hot", expr("dev > 0 AND dev * dev * (n_cells - 1) > var_term"))
      .withColumn("cold", expr("dev < 0 AND dev * dev * (n_cells - 1) > var_term"))
      .select(col("zone_x"), col("zone_y"), col("n"), col("k_nbrs"),
        col("g_sum"), col("hot"), col("cold"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_hotspots" -> (q167Hotspots _),
    "q166_od_outliers" -> (q166OdOutliers _),
    "q164_zone_density" -> (q164ZoneDensity _),
    "q161_zone_flux" -> (q161ZoneFlux _),
    "q159_stay_points" -> (q159StayPoints _),
    "q53_geo_zones" -> (q53GeoZones _),
    "q135_trip_speed" -> (q135TripSpeed _),
    "q116_nearest_zone" -> (q116NearestZone _),
    "q119_zorder" -> (q119ZorderKey _),
    "q63_od_matrix" -> (q63OdMatrix _),
    "q299_zone_gravity" -> (q299ZoneGravity _),
    "q288_od_asymmetry" -> (q288OdAsymmetry _),
    "q295_hotspot_persistence" -> (q295HotspotPersistence _),
    "q180_od_entropy" -> (q180OdEntropy _),
    "q131_pip_zones" -> (q131PipZones _),
    "q133_hex_bins" -> (q133HexBins _))

  /** q180: destination-entropy per origin zone — "from this zone, how
    * DIVERSE are the places trips go" (Shannon entropy of the OD row),
    * the mobility-mixing diagnostic planners read beside q63's raw
    * matrix: a commuter feeder zone scores near 0, a mixed-use hub near
    * ln(k). The q163 micro-nat discipline makes it engine-exact: each
    * destination's p·ln(1/p) term is rounded to 1e-6 nats (integer) and
    * the per-origin entropy is an exact BIGINT sum of those terms;
    * norm_bp (entropy / ln(n_dests)) is one double over two integers.
    *
    * Shape: [[zoneTrips]] → one OD-key aggregate (the q63 exchange) →
    * per-origin window + rollup on the zone²-bounded OD frame. Nothing
    * after the trips aggregate is event-scale.
    */
  def q180OdEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val od = zoneTrips(s, dir)
      .groupBy(col("origin_x"), col("origin_y"), col("dest_x"), col("dest_y"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("origin_x"), col("origin_y"))
    od
      .withColumn("no", sum(col("n")).over(w))
      .withColumn("term_unat", expr(
        """CAST(round(1000000.0 * (CAST(n AS DOUBLE) / CAST(no AS DOUBLE)) *
                ln(CAST(no AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)"""))
      .groupBy(col("origin_x"), col("origin_y"))
      .agg(max(col("no")).as("n_trips"),
        count(lit(1)).as("n_dests"),
        sum(col("term_unat")).as("entropy_unat"))
      .withColumn("norm_bp", expr(
        """CASE WHEN n_dests > 1
                THEN CAST(round(10000.0 * CAST(entropy_unat AS DOUBLE) /
                     (1000000.0 * ln(CAST(n_dests AS DOUBLE)))) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END"""))
  }

  val oracles: Map[String, String] = Map(
    "q180_od_entropy" ->
      s"""WITH z AS (
            SELECT user_id, ts, event_id,
                   $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y
            FROM events),
          e AS (
            SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM z),
          s AS (
            SELECT user_id, ts, event_id, zone_x, zone_y,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
            FROM e),
          r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM s),
          trips AS (
            SELECT o.zone_x AS origin_x, o.zone_y AS origin_y,
                   d.zone_x AS dest_x, d.zone_y AS dest_y
            FROM (SELECT * FROM r WHERE rn_a = 1) o
            JOIN (SELECT * FROM r WHERE rn_d = 1) d USING (user_id, sess_no)),
          od AS (
            SELECT origin_x, origin_y, dest_x, dest_y,
                   CAST(count(*) AS BIGINT) AS n
            FROM trips GROUP BY 1, 2, 3, 4),
          wno AS (
            SELECT *, CAST(sum(n) OVER (PARTITION BY origin_x, origin_y) AS BIGINT) AS no
            FROM od),
          t AS (
            SELECT *, CAST(round(1000000.0 * (CAST(n AS DOUBLE) / CAST(no AS DOUBLE)) *
                          ln(CAST(no AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS term_unat
            FROM wno),
          agg AS (
            SELECT origin_x, origin_y, max(no) AS n_trips,
                   CAST(count(*) AS BIGINT) AS n_dests,
                   CAST(sum(term_unat) AS BIGINT) AS entropy_unat
            FROM t GROUP BY 1, 2)
          SELECT origin_x, origin_y, n_trips, n_dests, entropy_unat,
                 CASE WHEN n_dests > 1
                      THEN CAST(round(10000.0 * CAST(entropy_unat AS DOUBLE) /
                           (1000000.0 * ln(CAST(n_dests AS DOUBLE)))) AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS norm_bp
          FROM agg""",
    "q167_hotspots" ->
      s"""WITH cells AS (
            SELECT $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          k(dx, dy) AS (VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,0), (0,1), (1,-1), (1,0), (1,1)),
          nbr AS (
            SELECT zone_x + dx AS zone_x, zone_y + dy AS zone_y,
                   CAST(sum(n) AS BIGINT) AS g_sum,
                   CAST(count(*) AS BIGINT) AS k_nbrs
            FROM cells CROSS JOIN k
            GROUP BY 1, 2),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                       CAST(sum(n) AS BIGINT) AS tot,
                       CAST(sum(n * n) AS BIGINT) AS tot_sq
                FROM cells),
          j AS (
            SELECT c.zone_x, c.zone_y, c.n, nbr.k_nbrs, nbr.g_sum,
                   n_cells * g_sum - k_nbrs * tot AS dev,
                   4 * (n_cells * tot_sq - tot * tot)
                     * (n_cells * k_nbrs - k_nbrs * k_nbrs) AS var_term,
                   n_cells
            FROM cells c JOIN nbr USING (zone_x, zone_y) CROSS JOIN g)
          SELECT zone_x, zone_y, n, k_nbrs, g_sum,
                 dev > 0 AND dev * dev * (n_cells - 1) > var_term AS hot,
                 dev < 0 AND dev * dev * (n_cells - 1) > var_term AS cold
          FROM j""",
    "q166_od_outliers" ->
      s"""WITH z AS (
            SELECT user_id, ts, event_id,
                   $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y
            FROM events),
          e AS (
            SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM z),
          sx AS (
            SELECT user_id, ts, event_id, zone_x, zone_y,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
            FROM e),
          r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM sx),
          trips AS (
            SELECT o.user_id, o.sess_no,
                   o.zone_x AS origin_x, o.zone_y AS origin_y,
                   d.zone_x AS dest_x, d.zone_y AS dest_y,
                   (epoch_us(d.ts) - epoch_us(o.ts)) // 1000000 AS dur_s
            FROM (SELECT * FROM r WHERE rn_a = 1) o
            JOIN (SELECT * FROM r WHERE rn_d = 1) d USING (user_id, sess_no)),
          g AS (
            SELECT origin_x, origin_y, dest_x, dest_y,
                   CAST(count(*) AS BIGINT) AS od_n,
                   CAST(sum(dur_s) AS BIGINT) AS sx,
                   CAST(sum(dur_s * dur_s) AS BIGINT) AS sxx
            FROM trips GROUP BY 1, 2, 3, 4
            HAVING count(*) >= 30)
          SELECT user_id, sess_no, origin_x, origin_y, dest_x, dest_y,
                 dur_s, od_n, sx // od_n AS od_mean_s,
                 CASE WHEN od_n * dur_s - sx < 0 THEN 'fast' ELSE 'slow' END AS direction
          FROM trips JOIN g USING (origin_x, origin_y, dest_x, dest_y)
          WHERE (od_n * dur_s - sx) * (od_n * dur_s - sx)
                  > 9 * (od_n * sxx - sx * sx)""",
    "q164_zone_density" ->
      s"""WITH cells AS (
            SELECT $ZoneXSql AS zx,
                   $ZoneYSql AS zy,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          k(dx, dy, w) AS (VALUES
            (-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
            ( 0, -1, 2), ( 0, 0, 4), ( 0, 1, 2),
            ( 1, -1, 1), ( 1, 0, 2), ( 1, 1, 1))
          SELECT zx + dx AS zone_x, zy + dy AS zone_y,
                 CAST(sum(n * w) AS BIGINT) AS density_w
          FROM cells CROSS JOIN k
          GROUP BY 1, 2""",
    "q161_zone_flux" ->
      s"""WITH z AS (
            SELECT user_id, ts, event_id,
                   $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y
            FROM events),
          e AS (
            SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM z),
          s AS (
            SELECT user_id, ts, event_id, zone_x, zone_y,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
            FROM e),
          r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM s),
          tagged AS (
            SELECT zone_x, zone_y, CAST(hour(ts) AS BIGINT) AS hod,
                   CAST(1 AS BIGINT) AS dep, CAST(0 AS BIGINT) AS arr
            FROM r WHERE rn_a = 1
            UNION ALL
            SELECT zone_x, zone_y, CAST(hour(ts) AS BIGINT),
                   CAST(0 AS BIGINT), CAST(1 AS BIGINT)
            FROM r WHERE rn_d = 1)
          SELECT zone_x, zone_y, hod,
                 CAST(sum(arr) AS BIGINT) AS n_arrivals,
                 CAST(sum(dep) AS BIGINT) AS n_departures,
                 CAST(sum(arr) - sum(dep) AS BIGINT) AS net_flux
          FROM tagged GROUP BY 1, 2, 3""",
    "q159_stay_points" ->
      s"""WITH z AS (
            SELECT user_id, ts, event_id,
                   $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y
            FROM events),
          m AS (
            SELECT *, CASE WHEN lag(zone_x) OVER w IS NULL
                            OR lag(zone_x) OVER w <> zone_x
                            OR lag(zone_y) OVER w <> zone_y THEN 1 ELSE 0 END AS moved
            FROM z WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          i AS (
            SELECT *, CAST(sum(moved) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS island
            FROM m),
          g AS (
            SELECT user_id, island, zone_x, zone_y,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS enter_ts, max(ts) AS exit_ts
            FROM i GROUP BY 1, 2, 3, 4)
          SELECT user_id, zone_x, zone_y, enter_ts, exit_ts, n_events,
                 (epoch_us(exit_ts) - epoch_us(enter_ts)) // 60000000 AS dwell_min
          FROM g
          WHERE n_events >= 3
            AND (epoch_us(exit_ts) - epoch_us(enter_ts)) // 60000000 >= 10""",
    "q135_trip_speed" ->
      s"""WITH z AS (
            SELECT user_id, ts, event_id,
                   CAST(round((39.9 + (user_id % 37) * 0.01 + value * 1e-4) * 1000000) AS BIGINT) AS ulat,
                   CAST(round((-75.2 + (user_id % 53) * 0.01 - value * 1e-4) * 1000000) AS BIGINT) AS ulon
            FROM events),
          e AS (
            SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM z),
          s AS (
            SELECT user_id, ts, event_id, ulat, ulon,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
            FROM e),
          g AS (
            SELECT user_id, sess_no, count(*) AS n_events,
                   epoch_us(min(ts)) AS t0_us, epoch_us(max(ts)) AS t1_us
            FROM s GROUP BY 1, 2),
          r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM s),
          trips AS (
            SELECT g.user_id, g.sess_no, g.n_events,
                   (g.t1_us - g.t0_us) // 1000000 AS duration_s,
                   (d.ulon - o.ulon) * $MmPerUlon AS dx_mm,
                   (d.ulat - o.ulat) * $MmPerUlat AS dy_mm
            FROM g
            JOIN (SELECT * FROM r WHERE rn_a = 1) o USING (user_id, sess_no)
            JOIN (SELECT * FROM r WHERE rn_d = 1) d USING (user_id, sess_no)),
          m AS (
            SELECT *, dx_mm * dx_mm + dy_mm * dy_mm AS d2_mm2,
                   CAST(floor(sqrt(CAST(dx_mm * dx_mm + dy_mm * dy_mm AS DOUBLE))) AS BIGINT) AS dist_mm
            FROM trips)
          SELECT user_id, sess_no, n_events, duration_s,
                 dist_mm // 1000 AS dist_m,
                 CASE WHEN duration_s > 0 THEN dist_mm // duration_s END AS speed_mmps,
                 CAST(duration_s > 0 AND dist_mm * 3 > duration_s * 100000 AS INT) AS is_speeding,
                 CAST(duration_s = 0 AND d2_mm2 > 0 AS INT) AS is_teleport
          FROM m""",
    "q133_hex_bins" -> {
      val steps = hexSteps("lat", "lon")
      val ctes = steps.zipWithIndex.map { case ((n, f), i) =>
        s"s$i AS (SELECT *, $f AS $n FROM ${if (i == 0) "pts" else s"s${i - 1}"})"
      }.mkString(",\n          ")
      s"""WITH pts AS (
            SELECT $LatSql AS lat,
                   $LonSql AS lon,
                   value
            FROM events),
          $ctes
          SELECT hex_q, hex_r, count(*) AS n_trips,
                 round(avg(value), 4) AS avg_value,
                 CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS total_value
          FROM s${steps.size - 1} GROUP BY 1, 2"""
    },
    "q131_pip_zones" ->
      s"""WITH edges(zone_id, x1, y1, x2, y2) AS (VALUES
            ${pipEdges.map { case (z, x1, y1, x2, y2) =>
              s"($z, $x1, $y1, $x2, $y2)" }.mkString(",\n            ")}),
          pts AS (
            SELECT event_id, value,
                   CAST(round((39.9 + (user_id % 37) * 0.01 + value * 1e-4) * 1000000) AS BIGINT) AS ulat,
                   CAST(round((-75.2 + (user_id % 53) * 0.01 - value * 1e-4) * 1000000) AS BIGINT) AS ulon
            FROM events),
          crossings AS (
            SELECT p.event_id, e.zone_id,
                   count(*) AS n_cross, min(p.value) AS value
            FROM pts p CROSS JOIN edges e
            WHERE ${rayCrossSql("ulon", "ulat")}
            GROUP BY p.event_id, e.zone_id)
          SELECT CAST(zone_id AS INTEGER) AS zone_id,
                 count(*) AS n_trips,
                 round(avg(value), 4) AS avg_value,
                 CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS total_value
          FROM crossings WHERE n_cross % 2 = 1
          GROUP BY zone_id""",
    "q119_zorder" ->
      s"""WITH z AS (
            SELECT event_id,
                   $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y
            FROM events)
          SELECT event_id, zone_x, zone_y,
                 ${zTerms("zone_x", "zone_y", 8, "//")} AS zkey
          FROM z""",
    "q116_nearest_zone" ->
      """WITH st AS (SELECT CAST(id AS BIGINT) AS station_id,
                  39850000 + (id % 5) * 50000 AS s_ulat,
                  -75250000 + (id // 5) * 50000 AS s_ulon
           FROM range(25) t(id)),
         ev AS (SELECT event_id,
                  CAST(round((39.9 + (user_id % 37) * 0.01 + value * 1e-4) * 1000000) AS BIGINT) AS ulat,
                  CAST(round((-75.2 + (user_id % 53) * 0.01 - value * 1e-4) * 1000000) AS BIGINT) AS ulon
           FROM events),
         d AS (SELECT ev.event_id, st.station_id,
                  (ev.ulat - st.s_ulat)*(ev.ulat - st.s_ulat)
                  + (ev.ulon - st.s_ulon)*(ev.ulon - st.s_ulon) AS d2,
                  row_number() OVER (PARTITION BY ev.event_id
                    ORDER BY (ev.ulat - st.s_ulat)*(ev.ulat - st.s_ulat)
                           + (ev.ulon - st.s_ulon)*(ev.ulon - st.s_ulon),
                             st.station_id) AS rn
           FROM ev CROSS JOIN st)
         SELECT station_id, count(*) AS n_events,
                min(d2) AS min_d2, max(d2) AS max_d2,
                CAST(sum(d2) AS BIGINT) // count(*) AS avg_d2
         FROM d WHERE rn = 1 GROUP BY station_id""",
    "q53_geo_zones" ->
      s"""WITH pts AS (
            SELECT $LatSql AS lat,
                   $LonSql AS lon,
                   value
            FROM events)
          SELECT CAST(floor((lon - ($Lon0)) / $Cell) AS BIGINT) AS zone_x,
                 CAST(floor((lat - $Lat0) / $Cell) AS BIGINT) AS zone_y,
                 count(*) AS n_trips,
                 round(avg(value), 4) AS avg_value,
                 CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS total_value
          FROM pts GROUP BY 1, 2""",
    "q295_hotspot_persistence" ->
      s"""WITH z AS (
            SELECT $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y,
                   epoch_us(ts) // 86400000000 // 7 AS wk
            FROM events),
          span AS (SELECT CAST(max(wk) - min(wk) + 1 AS BIGINT) AS n_weeks FROM z),
          a AS (SELECT zone_x, zone_y,
                       CAST(count(DISTINCT wk) AS BIGINT) AS weeks_active,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM z GROUP BY 1, 2)
          SELECT zone_x, zone_y, n_events, weeks_active, n_weeks,
                 weeks_active * 10000 // n_weeks AS persistence_bp,
                 weeks_active = n_weeks AS persistent
          FROM a CROSS JOIN span""",
    "q288_od_asymmetry" ->
      s"""WITH $odTripCtes,
          od AS (SELECT origin_x, origin_y, dest_x, dest_y,
                        CAST(count(*) AS BIGINT) AS n
                 FROM trips
                 WHERE NOT (origin_x = dest_x AND origin_y = dest_y)
                 GROUP BY 1, 2, 3, 4),
          d AS (SELECT *, (origin_x < dest_x
                           OR (origin_x = dest_x AND origin_y < dest_y)) AS fwd
                FROM od),
          c AS (SELECT CASE WHEN fwd THEN origin_x ELSE dest_x END AS ax,
                       CASE WHEN fwd THEN origin_y ELSE dest_y END AS ay,
                       CASE WHEN fwd THEN dest_x ELSE origin_x END AS bx,
                       CASE WHEN fwd THEN dest_y ELSE origin_y END AS by,
                       CASE WHEN fwd THEN n ELSE 0 END AS f_ab,
                       CASE WHEN fwd THEN 0 ELSE n END AS f_ba
                FROM d),
          p AS (SELECT ax, ay, bx, by,
                       CAST(sum(f_ab) AS BIGINT) AS flow_ab,
                       CAST(sum(f_ba) AS BIGINT) AS flow_ba
                FROM c GROUP BY 1, 2, 3, 4)
          SELECT ax, ay, bx, by, flow_ab, flow_ba,
                 abs(flow_ab - flow_ba) * 10000 // (flow_ab + flow_ba)
                   AS imbalance_bp,
                 CASE WHEN flow_ab > flow_ba THEN 'ab'
                      WHEN flow_ba > flow_ab THEN 'ba'
                      ELSE 'balanced' END AS net_dir
          FROM p""",
    "q63_od_matrix" ->
      s"""WITH $odTripCtes
          SELECT origin_x, origin_y, dest_x, dest_y,
                 count(*) AS n_trips,
                 abs(dest_x - origin_x) + abs(dest_y - origin_y) AS cell_dist
          FROM trips GROUP BY 1, 2, 3, 4""",
    "q299_zone_gravity" ->
      s"""WITH $odTripCtes,
          od AS (SELECT abs(dest_x - origin_x) + abs(dest_y - origin_y) AS cell_dist,
                        CAST(count(*) AS BIGINT) AS n_trips
                 FROM trips GROUP BY origin_x, origin_y, dest_x, dest_y),
          d AS (SELECT cell_dist, CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(n_trips) AS BIGINT) AS n_trips
                FROM od GROUP BY 1),
          t AS (SELECT CAST(sum(n_trips) AS BIGINT) AS tot FROM d)
          SELECT cell_dist, n_pairs, n_trips,
                 n_trips * 100 // n_pairs AS trips_per_pair_x100,
                 n_trips * 10000 // tot AS share_bp
          FROM d CROSS JOIN t""")

  /** The session-trip OD derivation CTEs (z → trips) — ONE SQL text
    * shared by the q63 matrix and q288's asymmetry fold. Lazy: the
    * oracles map above initializes first and references it. */
  private lazy val odTripCtes: String =
    s"""z AS (
            SELECT user_id, ts, event_id,
                   $ZoneXSql AS zone_x,
                   $ZoneYSql AS zone_y
            FROM events),
          e AS (
            SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM z),
          s AS (
            SELECT user_id, ts, event_id, zone_x, zone_y,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
            FROM e),
          r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM s),
          trips AS (
            SELECT o.user_id, o.sess_no,
                   o.zone_x AS origin_x, o.zone_y AS origin_y,
                   d.zone_x AS dest_x, d.zone_y AS dest_y
            FROM (SELECT * FROM r WHERE rn_a = 1) o
            JOIN (SELECT * FROM r WHERE rn_d = 1) d USING (user_id, sess_no))"""
}
