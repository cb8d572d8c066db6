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

  /** Uniform scatter value in [0, salt), derived from the row's CONTENT —
    * never from monotonically_increasing_id or rand: a nondeterministic
    * scatter re-partitions differently when a lost map task is recomputed,
    * double-counting or dropping rows on the reducers that already fetched
    * (the SPARK-23207 failure class). Hashing every column keeps the hot
    * key's rows spread as long as they differ anywhere outside the key. */
  private def scatter(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salt))

  /** Inner equi-join where `large` is skewed on `key`: large rows scatter
    * over `salt` sub-keys; `small` replicates `salt`× (explode of a
    * sequence — cheap when small is broadcast-sized or modest). The hot
    * key's rows now land on `salt` reducers instead of one. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = large.withColumn(SaltCol, scatter(large, salt))
    val s = small.withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase salted aggregation: count + long-sums per key. Phase 1
    * aggregates (key, salt) — the hot key's rows split over `salt` partial
    * groups; phase 2 merges the partials per key. Exact for the
    * commutative/associative measures exposed here. */
  def saltedSumCount(df: DataFrame, key: String, sumCol: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn(SaltCol, scatter(df, salt))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as(s"sum_$sumCol"))
  }
}
