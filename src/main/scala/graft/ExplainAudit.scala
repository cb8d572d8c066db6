package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit surface: execute the named declared queries (all of them by
  * default) and print each final physical plan — post-execution, so what
  * prints is the AQE-final plan, not the initial sketch. Plans drift with
  * parallelism (AQE coalescing at 32 cores differs from 4), so audits run
  * at the driver's CPU count:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.ExplainAudit q43_dedup_ngram_jaccard"
  *
  * docs/PLANS.md holds the checked-in audit notes.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxToStringFields", 200)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("sweep")) { sweep(spark, sfDir); spark.stop(); return }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      println(s"\n==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }

  /** `runMain graft.ExplainAudit sweep` — plan-hygiene sweep over every
    * declared query: compile (not execute) each plan and report every
    * window with NO partition keys, i.e. the shape that plans
    * `Exchange SinglePartition` and funnels its whole input through one
    * task. For each hit, print what the window actually runs over: the
    * grouping keys of the first aggregate below it (a bounded table —
    * e.g. the two-pass pid offsets, a month lattice, a ≤k bucket) or
    * `RAW INPUT` (an un-collapsed relation — a scale bug; the round-9
    * q213 class can never silently re-enter). The checked-in sweep
    * output with the per-hit bounded/unbounded adjudication lives in
    * docs/PLANS.md.
    */
  private def sweep(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.LimitExec
    def basisBelow(p: SparkPlan): String = p match {
      case a: BaseAggregateExec =>
        if (a.groupingExpressions.isEmpty) "agg keys=[] (1 row)"
        else s"agg keys=[${a.groupingExpressions.map(_.name).mkString(",")}]"
      case l: LimitExec => s"limit(${l.nodeName})"
      case leaf if leaf.children.isEmpty => "RAW INPUT"
      case other =>
        val kids = other.children.map(basisBelow)
        kids.find(_ == "RAW INPUT").getOrElse(kids.headOption.getOrElse("RAW INPUT"))
    }
    var hits = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.foreach { w =>
          hits += 1
          val head = w.windowExpression.map(_.name).mkString(",")
          println(s"SWEEP $n: global window [$head] over ${basisBelow(w.child)}")
        }
      } catch {
        case e: Throwable => println(s"SWEEP $n: PLAN ERROR ${e.getMessage}")
      }
    }
    println(s"SWEEP done: $hits global-window site(s) across " +
      s"${SparkEntry.queries.size} queries")
  }
}
