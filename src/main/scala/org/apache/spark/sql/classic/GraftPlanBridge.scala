package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to construct a DataFrame from a custom LogicalPlan.
  * `Dataset.ofRows` is `private[sql]`, so library code that introduces its
  * own plan nodes (graft.plans.CosineTopK) needs this one-liner inside the
  * Spark package — the standard technique for third-party plan extensions.
  */
object GraftPlanBridgeImpl {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
