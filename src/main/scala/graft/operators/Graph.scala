package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over entity graphs derived from the star schema. The
  * scale pattern for iterative graph algorithms here is collapse-then-
  * iterate: one exchange over the fact table builds the WEIGHTED entity
  * graph (bounded by entity cardinality, not fact rows), and the iterations
  * run on that small frame — so a 100 TB fact table pays one aggregation
  * pass, and each PageRank step is a join on a frame that fits wherever
  * the dimension tables fit. (Contrast q56's connected components, which
  * iterates on the full pair graph — right when the graph IS the data.)
  */
object Graph {

  /** q146: trade-flow PageRank — which supplier nations sit at the center
    * of the purchase network. Edges: customer-nation → supplier-nation,
    * weighted by distinct order-line trade pairs; then 3 fixed power
    * iterations with damping 0.85.
    *
    * Engine-exact integer arithmetic throughout: ranks live in micro-units
    * (node starts at 1_000_000), each step is
    * `next(j) = 150000 + 85 · Σ_i (rank(i) · w(i,j) DIV wout(i)) DIV 100`
    * — BIGINT multiply + floor DIV only, so Spark and DuckDB walk
    * bit-identical iterates (the documented floor-PageRank variant: each
    * node's outflow loses ≤ wout µ-units to flooring per step; dangling
    * nodes simply contribute nothing). Fixed iteration count keeps the
    * oracle expressible as a 3-stage CTE chain instead of a recursion.
    *
    * Shape: one lineitem→orders join + (src, dst) aggregate is the only
    * fact-scale work (two broadcast dim joins for the nation keys); the
    * iterate frame is |nations|² at most.
    */
  /** One trade graph per (session, dir) — the build-once seam for the
    * four graph consumers (q146 PageRank, q276 triangles, q300 reach,
    * q306 reciprocity), each of which previously re-ran the fact-scale
    * lineitem⋈orders DISTINCT pass inside its own call (r16 verdict
    * Missing #3: 4 fact passes where 1 would do — at 100 TB the
    * difference is 3 spared full-fact scans per session). Keyed like the
    * cluster-map / k-means / quality-model caches (session identity +
    * path, NOT content): see [[invalidateNationEdgesCache]] for the
    * staleness contract. The memoized frame is the final
    * localCheckpointed ≤ |nations|²-row edge frame, so reuse costs a
    * block read, not a recompute. */
  private val edgesCache =
    new graft.DriverMemo[(Int, String), DataFrame]()

  /** Drop memoized trade graphs — required after the data under a
    * previously scanned directory changes (memo keys on path, not
    * content; same contract as [[Dedup.invalidateClusterCache]]). */
  def invalidateNationEdgesCache(): Unit = edgesCache.clear()

  /** The weighted customer-nation → supplier-nation trade graph — ONE
    * fact-scale pass shared by ALL FIVE graph consumers (q146 PageRank,
    * q276 triangles, q300 BFS reach, q306 reciprocity via the
    * `src, dst, w` projection; q308 routes via [[nationLanes]]'s
    * lag-cost projection), memoized per (session, dir).
    * localCheckpoint: callers reference the frame several times — without
    * the cut, Spark re-runs the fact-scale pass once per reference
    * (measured 3.3 s → 0.9 s at sf0.1); the materialized frame is
    * ≤ |nations|² rows. */
  private[graft] def nationEdges(s: SparkSession, dir: String): DataFrame =
    edgesCache.getOrElseUpdate((System.identityHashCode(s), dir)) {
      nationEdgesUncached(s, dir)
    }

  /** q308's lane-cost view of the SAME memoized pass: per directed
    * (src, dst) nation pair, the mean fulfillment lag in exact BIGINT
    * floor days (Σlag DIV count over ALL order lines — the lag fold and
    * q146's distinct-pair weight ride one fact scan; r17 verdict task #4:
    * q308 previously paid a second lineitem⋈orders pass). Filtering
    * src≠dst after the grouped fold is exact — the filter is on group
    * keys. */
  private[graft] def nationLanes(s: SparkSession, dir: String): DataFrame =
    nationEdges(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        expr("lag_sum DIV lag_cnt").as("cost"))

  /** The uncached single-pass build — split out so specs can A/B the memo
    * and assert frame equality against a fresh computation. One
    * lineitem⋈orders key join + two broadcast dim joins, then ONE
    * grouped fold carrying BOTH aggregate families: `w` = distinct
    * (customer, supplier) trade pairs (each pair maps to exactly one
    * (src, dst) — nation keys are functional on the dims — so the
    * per-group distinct count equals the old distinct-then-count form),
    * and `lag_sum`/`lag_cnt` = Σ/count of per-line fulfillment lag in
    * epoch-floor days over ALL lines (q308's lane-cost numerator/
    * denominator, the q246 lag idiom). The distinct aggregate plans as
    * Spark's standard two-phase distinct-agg — same exchange key
    * (src, dst) the separate distinct pass paid, now amortized across
    * five consumers. */
  private[graft] def nationEdgesUncached(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey").as("src"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey").as("dst"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"),
        (expr("unix_micros(l_shipdate) div 86400000000")
          - expr("unix_micros(o_orderdate) div 86400000000")).as("lag_days"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("src"), col("dst"))
      .agg(count_distinct(struct(col("o_custkey"), col("l_suppkey"))).as("w"),
        sum(col("lag_days")).as("lag_sum"),
        count(lit(1)).as("lag_cnt"))
      .localCheckpoint()
  }

  def q146PagerankNations(s: SparkSession, dir: String): DataFrame =
    pagerankOfEdges(nationEdges(s, dir))
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("rank_micro"))

  /** q146's exact-integer PageRank over ANY weighted (src, dst, w) edge
    * frame — also the per-batch estimator of the s39 maintained-rank
    * sink (the maintained edge table IS the collapsed entity graph, so
    * each re-derivation costs O(entity graph), never a fact pass). */
  private[graft] def pagerankOfEdges(edges: DataFrame): DataFrame = {
    // everything below runs on ≤ |nodes|²-row frames: broadcast-hint
    // every join so no iteration plans an exchange for a 25-row side
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val start = nodes.withColumn("rank_micro", lit(1000000L))
    // 3 power iterations; every arithmetic step is BIGINT with floor DIV
    (1 to 3).foldLeft(start) { (ranks, _) =>
      val contrib = edges
        .join(broadcast(outW), "src")
        .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          expr("rank_micro * w DIV wout").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      nodes.join(broadcast(contrib), Seq("node"), "left")
        .select(col("node"),
          expr("150000 + 85 * coalesce(inflow, 0) DIV 100").as("rank_micro"))
    }
  }

  /** q276: trade-graph TRIANGLE census — degree, triangle count and local
    * clustering coefficient per nation on the UNDIRECTED simple trade
    * graph (q146's edges, self-loops dropped, direction collapsed). Where
    * PageRank ranks centrality, the clustering coefficient says whether a
    * nation's partners trade with EACH OTHER — a high-degree/low-
    * clustering nation is a hub bridging otherwise-disconnected blocs
    * (the classic structural-holes read), and a dense triangle core means
    * trade concentration no pair-level table shows. Triangles are
    * enumerated once via the ordered a<b<c join (each counted exactly
    * once, no /6 correction); clustering published as the integer
    * 2·tri·10000 DIV (deg·(deg−1)), NULL below degree 2.
    *
    * Scale shape: the only fact-scale work is the shared [[nationEdges]]
    * pass; the triangle join runs on the ≤ |nations|²-row undirected
    * frame — collapse-then-iterate, q146's discipline.
    */
  def q276TradeTriangles(s: SparkSession, dir: String): DataFrame = {
    val und = nationEdges(s, dir)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val tri = und.as("e1")
      .join(broadcast(und.as("e2")), col("e1.b") === col("e2.a"))
      .join(broadcast(und.as("e3")),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(broadcast(perNode), Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("degree"), col("n_triangles"),
        expr("""CASE WHEN degree >= 2
                THEN n_triangles * 2 * 10000 DIV (degree * (degree - 1))
                END""").as("clustering_x10000"))
  }

  /** q300: trade REACHABILITY — per nation, how much of the network its
    * exports can reach along directed trade edges and how many hops away
    * it sits: n_reachable (self excluded), eccentricity (max shortest-hop
    * distance over reached nations) and mean hops ×100. PageRank (q146)
    * ranks steady-state centrality and triangles (q276) read local
    * density; this is the PATH view — a nation whose ecc jumps from 1 to
    * 3 lost its direct lanes and now routes through intermediaries. The
    * operator class is new to the repo: an ITERATIVE FIXPOINT (BFS
    * shortest hops via min-merge frontier expansion) whose DuckDB mirror
    * is a `WITH RECURSIVE` CTE — the recursive-query capability of the
    * SQL engines, expressed Spark-side as a driver-bounded loop.
    *
    * Determinism: hops are exact integers; the loop runs until the
    * (pair-count, Σhops) signature is STABLE (min-merge is monotone —
    * pairs only appear, hops only shrink — so stability IS the fixpoint),
    * with a |nations| iteration guard. The oracle's recursion carries the
    * same ≤24-hop bound: a shortest path on a ≤25-node graph is shorter.
    *
    * Scale shape: the fact-scale work is the shared [[nationEdges]] pass;
    * every iteration joins ≤|nations|²-row frames (broadcast both sides),
    * localCheckpointed per step so the plan does not deepen with the
    * iteration count (the q146 collapse-then-iterate discipline, plus the
    * lineage cut an open-ended loop additionally needs).
    */
  def q300NationReach(s: SparkSession, dir: String): DataFrame = {
    val edges = nationEdges(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .localCheckpoint()
    val hop = broadcast(edges
      .withColumnRenamed("src", "mid").withColumnRenamed("dst", "nxt"))
    var reach = edges.withColumn("hops", lit(1L)).localCheckpoint()
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("hops")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(reach)
    var stable = false
    var iter = 0
    while (!stable && iter < 24) {
      iter += 1
      val expanded = reach.join(hop, col("dst") === col("mid"))
        .select(col("src"), col("nxt").as("dst"), (col("hops") + 1).as("hops"))
        .filter(col("src") =!= col("dst"))
      val merged = reach.unionByName(expanded)
        .groupBy(col("src"), col("dst")).agg(min(col("hops")).as("hops"))
        .localCheckpoint()
      val next = signature(merged)
      stable = next == sig
      sig = next
      reach = merged
    }
    reach.groupBy(col("src"))
      .agg(count(lit(1)).as("n_reachable"),
        max(col("hops")).as("ecc_hops"),
        sum(col("hops")).as("sum_hops"))
      .join(broadcast(Tables.nation(s, dir)), col("src") === col("n_nationkey"))
      .select(col("n_name").as("src_nation"), col("n_reachable"),
        col("ecc_hops"),
        expr("sum_hops * 100 DIV n_reachable").as("mean_hops_x100"))
  }

  /** q306: trade RECIPROCITY / degree census per nation — the SYMMETRY
    * view completing the graph block's four lenses (q146 steady-state
    * rank, q276 local density, q300 path reach, this: lane balance):
    * per nation, outbound lanes, inbound lanes, distinct partners,
    * reciprocated partners and their share bp, and the `exporter` /
    * `importer` / `balanced` role by lane counts. A one-way-heavy
    * nation is a structural trade-imbalance flag; a reciprocity drop is
    * lost two-way relationships before volume moves.
    *
    * Scale shape: the only fact-scale work is the shared [[nationEdges]]
    * pass (q146's discipline); everything here folds the ≤ |nations|²
    * lane frame, all joins broadcast. Self-lanes are excluded — a
    * nation trading with itself is not a lane. All counts exact
    * BIGINTs, share is integer DIV.
    */
  def q306TradeReciprocity(s: SparkSession, dir: String): DataFrame =
    reciprocityOfEdges(nationEdges(s, dir))

  /** q306 off ANY weighted (src, dst, w) edge frame — spec'd on a
    * planted A↔B / A→C graph beside the oracled corpus run. */
  private[graft] def reciprocityOfEdges(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .localCheckpoint() // four consumers: out/in/partner folds + semi
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val recip = e.join(broadcast(rev), Seq("src", "dst"), "left_semi")
      .groupBy(col("src").as("nation")).agg(count(lit(1)).as("n_recip"))
    val outD = e.groupBy(col("src").as("nation")).agg(count(lit(1)).as("n_out"))
    val inD = e.groupBy(col("dst").as("nation")).agg(count(lit(1)).as("n_in"))
    val partners = e.select(col("src").as("nation"), col("dst").as("p"))
      .union(e.select(col("dst"), col("src"))).distinct()
      .groupBy(col("nation")).agg(count(lit(1)).as("n_partners"))
    partners.join(broadcast(outD), Seq("nation"), "left")
      .join(broadcast(inD), Seq("nation"), "left")
      .join(broadcast(recip), Seq("nation"), "left")
      .na.fill(0L, Seq("n_out", "n_in", "n_recip"))
      .select(col("nation"), col("n_out"), col("n_in"), col("n_partners"),
        col("n_recip"),
        expr("n_recip * 10000 DIV n_partners").as("recip_bp"))
      .withColumn("role",
        when(col("n_out") > col("n_in"), "exporter")
          .when(col("n_in") > col("n_out"), "importer")
          .otherwise("balanced"))
  }

  /** q308: cheapest bounded-hop trade ROUTES — the WEIGHTED fixpoint
    * completing the graph block's lenses (q146 steady-state rank, q276
    * density, q300 unweighted reach, q306 symmetry; this: min-COST
    * routing): per (src, dst) nation pair reachable in ≤ 4 lanes, the
    * direct lane's mean fulfillment lag, the cheapest ≤4-lane route's
    * total lag, its hop count, and the reroute saving bp — "shipping
    * through an intermediary nation beats the direct lane by X%" is the
    * logistics read no unweighted view can give. The operator class is
    * new: a WEIGHTED walk-DP relaxation (Bellman–Ford over bounded
    * hops) whose DuckDB mirror is a `WITH RECURSIVE` CTE accumulating
    * (cost, hops) state — q300's recursion carried reachability only.
    *
    * CLOSED-FORM bound contract: routes use at most 4 lanes (3
    * transshipments — the realistic logistics cap, and the bound that
    * keeps the oracle's walk enumeration finite); with non-negative
    * lane costs the optimum over ≤4 lanes is exact whenever the true
    * optimum uses ≤4 (spec-pinned: a cheaper 5-lane chain is NOT taken).
    * Min-cost composes over walks (optimal substructure), so the DP
    * relaxes min-cost-per-(src,dst) frames — it never enumerates walks;
    * the oracle's recursion enumerates deduped (src,dst,cost,hops)
    * states, bounded by the ≤|nations|² pair grid × the integer cost
    * domain × 4. Walks never re-enter their origin (the recursion's
    * arrival guard, mirrored in the DP filter); ties at the best cost
    * resolve to the FEWEST hops, exactly on both engines.
    *
    * Exactness: per-line lag = epoch-day(ship) − epoch-day(order) (the
    * q246 idiom); lane cost = Σlag DIV count (exact BIGINT floor);
    * route costs are BIGINT sums; saving is an integer bp DIV, NULL
    * when no direct lane exists (nothing to save against) or the
    * direct lane is 0-cost.
    *
    * Shape: the fact-scale work is the SHARED [[nationEdges]] pass (the
    * lag fold rides the same scan as q146's weights — r17 task #4: one
    * fact pass for the whole graph block); the DP is 3 broadcast-join
    * relaxations over ≤|nations|²-row checkpointed frames plus one
    * partitioned window on the same grid.
    */
  def q308TradeRoutes(s: SparkSession, dir: String): DataFrame = {
    // ≤|nations|² rows off the memoized checkpointed pass; its own
    // localCheckpoint so the 5 consumers below (3 relaxations + direct
    // join + h=1 seed) re-read a materialized frame, not the projection
    val lanes = nationLanes(s, dir).localCheckpoint()
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    tradeRoutesOfLanes(lanes)
      .join(broadcast(n.withColumnRenamed("n_name", "src_nation")),
        col("src") === col("n_nationkey")).drop("n_nationkey")
      .join(broadcast(n.withColumnRenamed("n_name", "dst_nation")),
        col("dst") === col("n_nationkey"))
      .select(col("src_nation"), col("dst_nation"), col("direct_cost"),
        col("best_cost"), col("best_hops"), col("saving_bp"))
  }

  /** q308 off ANY (src, dst, cost) lane frame — spec'd on planted
    * reroute/bound graphs beside the oracled corpus run. */
  private[graft] def tradeRoutesOfLanes(lanes: DataFrame): DataFrame = {
    // min-cost-per-(src,dst) over walks of EXACTLY h lanes, h = 1..4 —
    // optimal substructure lets each step relax the previous frame
    // instead of enumerating walks; localCheckpoint keeps the plan flat
    // every union branch is materialized (the frames are ≤ |nations|²
    // rows) and RE-WRAPPED with fresh attributes: localCheckpoint alone
    // keeps the origin plan's attribute ids AND constraints, and the
    // 4-branch Union's constraint rewrite trips on ids shared with the
    // lanes frame joined again below (AttributeMap key-not-found)
    def fresh(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
    var frontier = fresh(lanes.withColumn("hops", lit(1L)))
    var best = frontier
    for (h <- 2 to 4) {
      frontier = fresh(frontier.as("r")
        .join(broadcast(lanes.as("l")), col("r.dst") === col("l.src"))
        .filter(col("l.dst") =!= col("r.src")) // never re-enter the origin
        .groupBy(col("r.src").as("src"), col("l.dst").as("dst"))
        .agg(min(col("r.cost") + col("l.cost")).as("cost"))
        .withColumn("hops", lit(h.toLong)))
      best = best.unionByName(frontier)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"), col("dst"))
      .orderBy(col("cost").asc, col("hops").asc)
    best.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(broadcast(lanes.select(col("src"), col("dst"),
        col("cost").as("direct_cost"))), Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), col("direct_cost"),
        col("cost").as("best_cost"), col("hops").as("best_hops"),
        expr("""CASE WHEN direct_cost > 0
                THEN (direct_cost - cost) * 10000 DIV direct_cost
                END""").as("saving_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q308_trade_routes"  -> (q308TradeRoutes _),
    "q306_trade_reciprocity" -> (q306TradeReciprocity _),
    "q146_pagerank_nations" -> (q146PagerankNations _),
    "q300_nation_reach" -> (q300NationReach _),
    "q276_trade_triangles" -> (q276TradeTriangles _))

  val oracles: Map[String, String] = Map(
    "q308_trade_routes" ->
      """WITH RECURSIVE lag AS (
           SELECT o_custkey, l_suppkey,
                  (epoch_us(l_shipdate) // 86400000000)
                    - (epoch_us(o_orderdate) // 86400000000) AS lag_days
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         lanes AS (
           SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                  CAST(sum(lag_days) AS BIGINT) // count(*) AS cost
           FROM lag
           JOIN customer c ON o_custkey = c_custkey
           JOIN supplier s ON l_suppkey = s_suppkey
           WHERE c.c_nationkey <> s.s_nationkey
           GROUP BY 1, 2),
         routes(src, dst, cost, hops) AS (
           SELECT src, dst, cost, CAST(1 AS BIGINT) AS hops FROM lanes
           UNION
           SELECT r.src, l.dst, r.cost + l.cost, r.hops + 1
           FROM routes r JOIN lanes l ON r.dst = l.src
           WHERE l.dst <> r.src AND r.hops < 4),
         b AS (SELECT src, dst, min(cost) AS best_cost
               FROM routes GROUP BY 1, 2),
         bh AS (SELECT r.src, r.dst, b.best_cost,
                       CAST(min(r.hops) AS BIGINT) AS best_hops
                FROM routes r
                JOIN b ON r.src = b.src AND r.dst = b.dst
                      AND r.cost = b.best_cost
                GROUP BY 1, 2, 3)
         SELECT ns.n_name AS src_nation, nd.n_name AS dst_nation,
                d.cost AS direct_cost, bh.best_cost, bh.best_hops,
                CASE WHEN d.cost > 0
                     THEN (d.cost - bh.best_cost) * 10000 // d.cost
                END AS saving_bp
         FROM bh
         LEFT JOIN lanes d ON bh.src = d.src AND bh.dst = d.dst
         JOIN nation ns ON bh.src = ns.n_nationkey
         JOIN nation nd ON bh.dst = nd.n_nationkey""",
    "q306_trade_reciprocity" ->
      """WITH pairs AS (
           SELECT DISTINCT o_custkey, l_suppkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (
           SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
           FROM pairs
           JOIN customer c ON o_custkey = c_custkey
           JOIN supplier s ON l_suppkey = s_suppkey
           WHERE c.c_nationkey <> s.s_nationkey),
         r AS (
           SELECT e.src AS nation, CAST(count(*) AS BIGINT) AS n_recip
           FROM e
           WHERE EXISTS (SELECT 1 FROM e e2
                         WHERE e2.src = e.dst AND e2.dst = e.src)
           GROUP BY 1),
         o AS (SELECT src AS nation, CAST(count(*) AS BIGINT) AS n_out
               FROM e GROUP BY 1),
         i AS (SELECT dst AS nation, CAST(count(*) AS BIGINT) AS n_in
               FROM e GROUP BY 1),
         p AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_partners
               FROM (SELECT DISTINCT src AS nation, dst AS pp FROM e
                     UNION SELECT DISTINCT dst, src FROM e)
               GROUP BY 1)
         SELECT p.nation, COALESCE(o.n_out, 0) AS n_out,
                COALESCE(i.n_in, 0) AS n_in, p.n_partners,
                COALESCE(r.n_recip, 0) AS n_recip,
                COALESCE(r.n_recip, 0) * 10000 // p.n_partners AS recip_bp,
                CASE WHEN COALESCE(o.n_out, 0) > COALESCE(i.n_in, 0)
                       THEN 'exporter'
                     WHEN COALESCE(i.n_in, 0) > COALESCE(o.n_out, 0)
                       THEN 'importer'
                     ELSE 'balanced' END AS role
         FROM p LEFT JOIN o USING (nation) LEFT JOIN i USING (nation)
                LEFT JOIN r USING (nation)""",
    "q300_nation_reach" ->
      """WITH RECURSIVE pairs AS (
           SELECT DISTINCT o_custkey, l_suppkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (
           SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
           FROM pairs
           JOIN customer c ON o_custkey = c_custkey
           JOIN supplier s ON l_suppkey = s_suppkey
           WHERE c.c_nationkey <> s.s_nationkey),
         walk(src, dst, hops) AS (
           SELECT src, dst, CAST(1 AS BIGINT) FROM e
           UNION
           SELECT w.src, e.dst, w.hops + 1
           FROM walk w JOIN e ON w.dst = e.src
           WHERE w.src <> e.dst AND w.hops < 24),
         sp AS (
           SELECT src, dst, min(hops) AS hops FROM walk GROUP BY 1, 2)
         SELECT n_name AS src_nation,
                CAST(count(*) AS BIGINT) AS n_reachable,
                CAST(max(hops) AS BIGINT) AS ecc_hops,
                CAST(sum(hops) AS BIGINT) * 100 // count(*) AS mean_hops_x100
         FROM sp JOIN nation ON src = n_nationkey
         GROUP BY 1""",
    "q276_trade_triangles" ->
      """WITH pairs AS (
           SELECT DISTINCT o_custkey, l_suppkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e0 AS (
           SELECT c.c_nationkey AS src, s.s_nationkey AS dst
           FROM pairs
           JOIN customer c ON o_custkey = c_custkey
           JOIN supplier s ON l_suppkey = s_suppkey),
         und AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM e0 WHERE src <> dst),
         tri AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM und e1
           JOIN und e2 ON e1.b = e2.a
           JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
         pn AS (
           SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
           FROM (SELECT x AS node FROM tri
                 UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri)
           GROUP BY node),
         deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS degree
           FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
           GROUP BY node)
         SELECT n_name, degree,
                COALESCE(n_triangles, 0) AS n_triangles,
                CASE WHEN degree >= 2
                     THEN COALESCE(n_triangles, 0) * 2 * 10000
                          // (degree * (degree - 1))
                END AS clustering_x10000
         FROM deg
         LEFT JOIN pn USING (node)
         JOIN nation ON node = n_nationkey""",
    "q146_pagerank_nations" ->
      """WITH pairs AS (
           SELECT DISTINCT o_custkey, l_suppkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (
           SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                  CAST(count(*) AS BIGINT) AS w
           FROM pairs
           JOIN customer c ON o_custkey = c.c_custkey
           JOIN supplier s ON l_suppkey = s.s_suppkey
           GROUP BY 1, 2),
         outw AS (
           SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src),
         nodes AS (
           SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
         r1 AS (
           SELECT n.node,
                  150000 + 85 * coalesce(CAST(sum(r.rank_micro * e.w // o.wout) AS BIGINT), 0) // 100
                    AS rank_micro
           FROM nodes n
           LEFT JOIN edges e ON e.dst = n.node
           LEFT JOIN outw o ON o.src = e.src
           LEFT JOIN r0 r ON r.node = e.src
           GROUP BY n.node),
         r2 AS (
           SELECT n.node,
                  150000 + 85 * coalesce(CAST(sum(r.rank_micro * e.w // o.wout) AS BIGINT), 0) // 100
                    AS rank_micro
           FROM nodes n
           LEFT JOIN edges e ON e.dst = n.node
           LEFT JOIN outw o ON o.src = e.src
           LEFT JOIN r1 r ON r.node = e.src
           GROUP BY n.node),
         r3 AS (
           SELECT n.node,
                  150000 + 85 * coalesce(CAST(sum(r.rank_micro * e.w // o.wout) AS BIGINT), 0) // 100
                    AS rank_micro
           FROM nodes n
           LEFT JOIN edges e ON e.dst = n.node
           LEFT JOIN outw o ON o.src = e.src
           LEFT JOIN r2 r ON r.node = e.src
           GROUP BY n.node)
         SELECT n_name, rank_micro
         FROM r3 JOIN nation ON node = n_nationkey""")
}
