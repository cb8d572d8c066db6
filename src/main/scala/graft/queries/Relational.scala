package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Relational operator surface (SURVEY.md §2.B): joins, aggregations,
  * windows, sorts/limits/set-ops — declared as named query builders with
  * DuckDB oracle SQL.
  *
  * Oracle-parity rules (SURVEY.md §5.3): every query ends in a total ORDER
  * BY; double-typed measures are cast to DECIMAL per-row *before* SUM so the
  * aggregate is exact and independent of accumulation order; result columns
  * aliased identically in Spark and SQL.
  *
  * The flagship generalizes the reference's analytical essence — "average
  * price per neighborhood" (/root/reference/download_lambda.py:99-103 price +
  * location extraction) — to "revenue per nation" over the TPC-H-ish
  * fixtures.
  */
object Relational {

  /** Oracle-portable money arithmetic: Spark and DuckDB round double→decimal
    * differently (shortest-string HALF_UP vs exact-binary), so any per-row
    * decimal cast of a double diverges. Instead convert to exact integer
    * cents with pure IEEE ops — `floor(x*100 + 0.5)` is bit-identical in
    * both engines on identical input doubles — and SUM as BIGINT, which is
    * exact and accumulation-order-independent (safe under any shuffle /
    * partial-agg schedule at any scale).
    */
  def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(LongType)

  /** SQL twin of [[cents]] for the DuckDB oracle. */
  def centsSql(expr: String): String =
    s"CAST(floor(($expr) * 100.0 + 0.5) AS BIGINT)"

  /** Flagship: revenue per nation (lineitem ⋈ orders ⋈ customer ⋈ nation).
    * Two shuffled fact joins + one broadcast dim join + hash agg + sort.
    */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("revenue_cents"),
        count(lit(1)).as("n_rows"))
      .orderBy($"n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_revenue_by_nation" -> revenueByNation
  )

  val oracles: Map[String, String] = Map(
    "q01_revenue_by_nation" ->
      s"""SELECT n_name,
        |       CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_rows
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
  )
}
