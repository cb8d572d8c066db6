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
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      println(s"\n==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
