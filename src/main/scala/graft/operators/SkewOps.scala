package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4.2 scale stance).
  *
  * First line of defense at runtime is AQE's skew-join splitting (on by
  * default, config not code). These operators are for the cases AQE can't
  * fix: a hot key in a shuffled aggregation's reduce side, or a sort-merge
  * join whose skewed partition must be split *before* the shuffle because
  * the per-key state itself (not just the partition file) is too large.
  *
  * Pattern: scatter the skewed side's rows uniformly over `salt` synthetic
  * sub-keys, replicate the other (small) side to every sub-key, join/agg on
  * (key, salt), then drop/merge the salt. Row multiset is provably unchanged
  * — SkewOpsSpec asserts equivalence against the unsalted plan.
  */
object SkewOps {

  private val SaltCol = "__graft_salt"

  /** Uniform scatter value in [0, salt).
    *
    * Default (content mode): hash of the row's CONTENT — never rand(): a
    * nondeterministic scatter re-partitions differently when a lost map
    * task is recomputed, double-counting or dropping rows on reducers that
    * already fetched (the SPARK-23207 failure class). Retry-safe against
    * ANY input. PRECONDITION: the hot key's rows must differ somewhere
    * outside the key — byte-identical rows (replayed events, default-valued
    * records) all hash alike and collapse into ONE salt bucket, silently
    * degenerating to the unsalted plan (SkewOpsSpec documents this case).
    *
    * Positional mode: hash of `monotonically_increasing_id()` (partition id
    * << 33 | row offset) — spreads even byte-identical rows. Retry-safe iff
    * a recomputed input partition reproduces the same rows in the same
    * order, which holds for deterministic file/table scans but NOT for a
    * direct shuffle output (fetch order varies across retries). Callers
    * choose per the input's provenance; content mode stays the default
    * because it is safe unconditionally. */
  private def scatter(df: DataFrame, salt: Int, positional: Boolean): Column =
    if (positional) pmod(hash(monotonically_increasing_id()), lit(salt))
    else pmod(hash(df.columns.map(col): _*), lit(salt))

  /** Inner equi-join where `large` is skewed on `key`: large rows scatter
    * over `salt` sub-keys; `small` replicates `salt`× (explode of a
    * sequence — cheap when small is broadcast-sized or modest). The hot
    * key's rows now land on `salt` reducers instead of one. */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String, salt: Int,
      positionalScatter: Boolean = false): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = large.withColumn(SaltCol, scatter(large, salt, positionalScatter))
    val s = small.withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase salted aggregation: count + long-sums per key. Phase 1
    * aggregates (key, salt) — the hot key's rows split over `salt` partial
    * groups; phase 2 merges the partials per key. Exact for the
    * commutative/associative measures exposed here. */
  def saltedSumCount(
      df: DataFrame, key: String, sumCol: String, salt: Int,
      positionalScatter: Boolean = false): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn(SaltCol, scatter(df, salt, positionalScatter))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as(s"sum_$sumCol"))
  }
}
