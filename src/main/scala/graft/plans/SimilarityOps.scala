package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy + builder API for the [[CosineTopK]] operator.
  * Injected by [[graft.functions.GraftExtensions]]; without the strategy a
  * CosineTopK node would have no physical plan, so [[cosineTopK]] is the
  * only constructor and the extension is required (Verify/Bench/test
  * sessions all install it).
  */
object CosineTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: CosineTopK =>
      CosineTopKExec(n.k, planLater(n.queries), planLater(n.candidates), n.output) :: Nil
    case _ => Nil
  }
}

object SimilarityOps {

  /** Exact cosine top-k of `candidates` per row of the bounded `queries`
    * frame. `queries` must be (id, vector) and small enough to broadcast —
    * the same assumption the composed `broadcast(q).join(...)` form makes;
    * `candidates` is (id, vector) at any scale. Output: (qid, rn, vid,
    * cos), rn = 1..k ordered by cos desc, vid asc, self-pairs excluded. */
  def cosineTopK(
      queries: DataFrame, qId: Column, qVec: Column,
      candidates: DataFrame, cId: Column, cVec: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = queries.sparkSession
    // Sessions built with GraftExtensions already have the strategy via
    // injectPlannerStrategy; for any other session, install it through the
    // public experimental hook so the node always has a physical plan.
    // (A duplicate registration is harmless: the strategy only matches
    // CosineTopK and the planner takes the first produced plan. The
    // check-then-append is synchronized because extraStrategies is a plain
    // var — two threads racing the read-modify-write could lose an append
    // and fail planning with "No plan for CosineTopK".)
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ CosineTopKStrategy
    }
    val q = queries.select(qId.cast("long").as("qid"), qVec.as("qe"))
    val c = candidates.select(cId.cast("long").as("vid"), cVec.as("ve"))
    org.apache.spark.sql.classic.GraftPlanBridgeImpl.ofRows(spark,
      CosineTopK(q.queryExecution.analyzed, c.queryExecution.analyzed, k))
  }
}
