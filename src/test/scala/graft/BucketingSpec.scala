package graft

import graft.operators.Bucketing

/** Co-bucketed join must plan with zero shuffle exchanges — the write-time
  * co-location contract that matters at fact⋈fact scale.
  */
class BucketingSpec extends SparkSpec {

  test("co-bucketed fact tables join with no hash-partition exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sfDir), "b_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(Tables.lineitem(spark, sfDir), "b_lineitem", "l_orderkey", 4)
      val joined = Bucketing.cobucketedJoin(
        spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      // and it still computes the right thing
      val expected = Tables.lineitem(spark, sfDir).join(
        Tables.orders(spark, sfDir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("clustered write produces disjoint per-file key ranges (min/max skipping layout)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString + "/orders"
    Bucketing.writeClustered(Tables.orders(spark, sfDir), dir, "o_orderkey", 4)
    // Per-file [min, max] ranges must not overlap — that's the property
    // parquet footer skipping prunes on for any range predicate.
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"file ranges overlap: $ranges")
      case _ =>
    }
    // and nothing was lost in the relayout
    assert(spark.read.parquet(dir).count() ===
      Tables.orders(spark, sfDir).count())
  }
}
