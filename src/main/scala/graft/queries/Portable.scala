package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Formulation helpers that make declared queries *bit-deterministic* across
  * Spark and the DuckDB oracle, at any parallelism.
  *
  * Ground rules (verified empirically in round 1):
  *   - Never cast a per-row double to decimal: Spark rounds via the shortest
  *     decimal string (HALF_UP), DuckDB via the exact binary value — they
  *     disagree at the last digit on ~10% of rows.
  *   - Never SUM/AVG raw doubles whose values aren't integer-valued: FP
  *     addition isn't associative, so the result depends on partial-agg /
  *     shuffle order — unacceptable for a hash-compared oracle *and* for
  *     reproducible results on a 1000-executor cluster.
  *   - `floor`, `*`, `+` on doubles are pure IEEE ops: bit-identical in both
  *     engines on identical inputs. Integer arithmetic is exact.
  *
  * So: convert money to integer cents per row, aggregate integers (exact,
  * order-independent), and derive ratios with an op tree replicated exactly
  * in the oracle SQL.
  */
object Portable {

  /** Money double → exact integer cents; bit-deterministic per row. */
  def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(LongType)

  /** SQL twin of [[cents]] (keep the op tree identical, incl. parens). */
  def centsSql(expr: String): String =
    s"CAST(floor(($expr) * 100.0 + 0.5) AS BIGINT)"

  /** Exact long division rendered as double: num/den must be integral
    * columns computed exactly; both engines then do one identical FP divide.
    */
  def ratio(num: Column, den: Column): Column =
    num.cast(DoubleType) / den.cast(DoubleType)

  /** Self-parenthesizing: safe to interpolate into any enclosing expression
    * (a bare `a / b` embedded after `*` would parse left-associatively as
    * `(x*a)/b` — a different IEEE rounding than `x*(a/b)`).
    */
  def ratioSql(num: String, den: String): String =
    s"(CAST($num AS DOUBLE) / CAST($den AS DOUBLE))"

  /** Sum of an integer-valued double column (e.g. l_quantity): exact in FP,
    * order-independent; surfaced as BIGINT on both sides.
    */
  def sumIntValued(c: Column): Column = sum(c).cast(LongType)

  def sumIntValuedSql(expr: String): String =
    s"CAST(sum($expr) AS BIGINT)"

  /** DuckDB sum(BIGINT) returns HUGEINT; pin both sides to BIGINT. */
  def sumLongSql(expr: String): String =
    s"CAST(sum($expr) AS BIGINT)"
}
