package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics beyond connected components (q76's label
  * propagation): PageRank over the customer–supplier interaction graph.
  *
  * The portability problem PageRank poses is FLOATING-POINT DRIFT: the
  * textbook iteration sums `rank/outdegree` doubles over each node's
  * in-edges, and FP addition is order-dependent, so two engines (or two
  * shuffle layouts of the same engine) disagree in the last bits and the
  * top-k ordering becomes unstable exactly at the ties that matter. The
  * declared form is therefore FIXED-POINT: ranks are integers scaled by
  * 10¹², per-edge contributions use integer division (truncation —
  * identical in Spark's `DIV` and DuckDB's `//` for non-negative values),
  * and the damping update `0.15·S + 0.85·Σ` becomes
  * `(15·S) DIV 100 + (85·Σ) DIV 100` — every intermediate is an exact
  * long, so three iterations produce bit-identical ranks on any engine at
  * any parallelism. (Magnitudes: Σ ≤ N·S = N·10¹²; ×85 stays under 2⁶³
  * up to N ≈ 10⁵ nodes — scale S down, or promote to decimal(38,0) /
  * HUGEINT, for bigger graphs: same op tree, same exactness.)
  *
  * Scale shape: each iteration is one join of the edge list with the
  * current |V|-row rank table (pre-divided per source — the rank/deg
  * table, NOT per edge) and one sum-by-destination — the standard
  * edge-partitioned PageRank plan, with the bounded iteration count fixed
  * in the PLAN (unrolled), not driver-looped. The edge list is built once
  * and pinned (lazy localCheckpoint) because all three iterations and the
  * degree table read it.
  */
object Graph {

  private val Scale = 1000000000000L // 1e12 fixed-point

  /** 3-iteration fixed-point PageRank over the undirected bipartite
    * customer↔supplier graph (an edge per distinct (customer, supplier)
    * trade pair via orders ⋈ lineitem). Output: top-20 nodes by final
    * rank, total-ordered (rank desc, node asc) — exact integers, so the
    * ranking is reproducible to the last row. */
  def pageRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst"))
      .distinct()
    val edges = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
      .localCheckpoint(eager = false) // read by deg + all 3 iterations
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
    val nodes = edges.select($"src".as("node")).distinct()
    val r0 = nodes.select($"node", lit(Scale).as("r"))
    def step(rk: DataFrame): DataFrame = {
      val perSrc = rk.join(deg, rk("node") === deg("src"))
        .select($"node", expr("r div d").as("c"))
      val contrib = edges.join(perSrc, edges("src") === perSrc("node"))
        .groupBy($"dst").agg(sum($"c").as("in_sum"))
      nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select($"node",
          (lit(15L * Scale / 100L) +
            expr("85 * coalesce(in_sum, 0L) div 100")).as("r"))
    }
    val r3 = step(step(step(r0)))
    r3.orderBy($"r".desc, $"node".asc)
      .limit(20)
      .select($"node", $"r".as("pr"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_pagerank_fixed_point" -> pageRank)

  val oracles: Map[String, String] = Map(
    "q197_pagerank_fixed_point" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), e AS (
        |  SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0
        |), deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS s
        |       FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
        |       GROUP BY 1),
        |r1 AS (SELECT n.node,
        |              CAST(150000000000 + (85 * coalesce(c1.s, 0)) // 100 AS BIGINT) AS r
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS s
        |       FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
        |       GROUP BY 1),
        |r2 AS (SELECT n.node,
        |              CAST(150000000000 + (85 * coalesce(c2.s, 0)) // 100 AS BIGINT) AS r
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS s
        |       FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
        |       GROUP BY 1),
        |r3 AS (SELECT n.node,
        |              CAST(150000000000 + (85 * coalesce(c3.s, 0)) // 100 AS BIGINT) AS r
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, r AS pr FROM r3
        |ORDER BY pr DESC, node ASC LIMIT 20""".stripMargin)
}
