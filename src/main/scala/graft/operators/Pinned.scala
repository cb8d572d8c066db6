package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Pin an immutable relation hash-partitioned on the keys its consumers
  * iterate against — the cluster contract for iterative algorithms:
  * partition the big relation ONCE, then every join/agg keyed on those
  * columns reads it exchange-free.
  *
  * Why this needs its own helper: `df.repartition(k).localCheckpoint()`
  * does NOT deliver that contract under AQE. `Dataset.checkpoint` copies
  * `executedPlan.outputPartitioning` into the pinned `LogicalRDD`, but
  * with adaptive execution the executed plan is an
  * `AdaptiveSparkPlanExec`, whose statically-known partitioning is
  * unknown (the final plan doesn't exist until runtime) — so the pin
  * records UnknownPartitioning and EVERY downstream consumer plans its
  * own redundant Exchange over the checkpointed rows (observed: 4 extra
  * src-exchanges in q197's plan; the same holds for `persist`, since
  * Spark 4 lets AQE re-plan cached relations too). The fix is to compile
  * just the pin's subplan with AQE off: the subplan is a single static
  * shuffle that adaptive re-planning couldn't improve anyway, and the
  * resulting `LogicalRDD` then carries `hashpartitioning(keys, N)` that
  * all consumers (and `newInstance` self-join copies, which rewrite the
  * partitioning expressions along with the output) can reuse.
  * Downstream consumers still get full AQE.
  */
object Pinned {

  /** Lazy localCheckpoint of `df` hash-partitioned on `keys`, with the
    * partitioning preserved in the pinned plan (see class doc). Lazy so
    * plan-only consumers (explain audits, plan-assertion specs) never pay
    * a materialization; the first action pins one copy for all readers.
    *
    * Concurrency: the AQE toggle is SESSION-GLOBAL for the duration of
    * this (purely plan-side, sub-millisecond) call — a query compiled
    * CONCURRENTLY on the same SparkSession during that window would
    * silently compile without AQE. Verify/Bench compile queries
    * sequentially, so this is safe today; a parallel harness must either
    * serialize calls to this helper or hand it a cloned session
    * (`spark.newSession()` shares the RDD state but scopes the conf).
    */
  def partitionedCheckpoint(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try df.repartition(keys: _*).localCheckpoint(eager = false)
    finally spark.conf.set(aqe, prev)
  }

  /** Lazy localCheckpoint that preserves the partitioning `df`'s plan
    * ALREADY ends in — for frames whose last operator is a keyed
    * aggregation/shuffle on exactly the keys consumers want (e.g. a
    * `groupBy(src)` adjacency build): [[partitionedCheckpoint]] would
    * append a REDUNDANT exchange (an explicit repartition over an
    * identically-partitioned child is not removed statically), while
    * compiling the subplan AQE-off and checkpointing directly records
    * the aggregation's own hashpartitioning in the LogicalRDD. The
    * caller owns the precondition that the plan tail is the keyed
    * exchange it wants to pin — and this helper VERIFIES it: a plan
    * ending in a projection/filter that drops the partitioning would
    * silently record UnknownPartitioning and re-shuffle at every
    * consumer (the exact regression [[partitionedCheckpoint]] exists
    * to prevent), so that misuse fails loudly at compile time here
    * instead of surfacing as a perf cliff in a bench. */
  def checkpointAsIs(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try {
      val part = df.queryExecution.executedPlan.outputPartitioning
      require(
        part.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning],
        s"checkpointAsIs precondition violated: plan tail must carry a " +
          s"HashPartitioning for consumers to reuse, got $part — " +
          s"use partitionedCheckpoint(df, keys*) instead")
      df.localCheckpoint(eager = false)
    } finally spark.conf.set(aqe, prev)
  }
}
