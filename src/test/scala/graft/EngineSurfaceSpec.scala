package graft

import org.apache.spark.sql.functions._

/** Engine-surface contracts that have no DuckDB oracle: caching reuse and
  * optimizer hints. Both are 100 TB levers — a cached hot dim saves a
  * rescan per query, and hints are the operator's override when the
  * optimizer's stats are wrong (the classic case: a filtered build side
  * the planner sizes by table, not by selectivity).
  */
class EngineSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("cache(): second use scans InMemoryTableScan, results identical, unpersist restores") {
    val df = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val before = df.orderBy($"o_orderpriority").collect()
    df.cache()
    try {
      df.count() // materialize
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"cached frame must read from the cache:\n$plan")
      val after = df.orderBy($"o_orderpriority").collect()
      assert(after.sameElements(before), "cache changed results")
    } finally df.unpersist(blocking = true)
    // queryExecution is memoized per frame — probe with a fresh identical one
    val fresh = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    fresh.count()
    assert(!fresh.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "unpersist must drop the cache")
  }

  test("BROADCAST hint forces a broadcast join when the threshold would forbid it") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir).createOrReplaceTempView("hint_orders")
      Tables.customer(spark, sfDir).createOrReplaceTempView("hint_customer")
      val noHint = spark.sql(
        """SELECT count(*) FROM hint_orders o JOIN hint_customer c
          |ON o.o_custkey = c.c_custkey""".stripMargin)
      assert(!noHint.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "threshold -1 must disable auto-broadcast (test precondition)")
      val hinted = spark.sql(
        """SELECT /*+ BROADCAST(c) */ count(*) FROM hint_orders o
          |JOIN hint_customer c ON o.o_custkey = c.c_custkey""".stripMargin)
      val p = hinted.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"hint ignored:\n$p")
      assert(hinted.collect().head.getLong(0) === noHint.collect().head.getLong(0),
        "hint changed the result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("df.stat surface: approxQuantile within its error contract, freqItems a superset, crosstab sums to n") {
    val o = Tables.orders(spark, sfDir)
      .withColumn("pc", expr("CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)"))
    val n = o.count()
    // approxQuantile: relativeError 0.01 → rank within ±n/100 of exact
    val Array(approxMed) = o.stat.approxQuantile("pc", Array(0.5), 0.01)
    val below = o.filter($"pc" <= approxMed).count()
    assert(math.abs(below - n / 2.0) <= n / 100.0 + 1,
      s"approx median rank off: $below of $n below $approxMed")
    // freqItems(support s) must contain every value with freq > s·n
    val freq = o.stat.freqItems(Array("o_orderpriority"), 0.3)
      .head.getSeq[String](0).toSet
    val trueHeavy = o.groupBy($"o_orderpriority").count()
      .filter($"count" > n * 0.3).collect().map(_.getString(0)).toSet
    assert(trueHeavy.subsetOf(freq), s"freqItems missed $trueHeavy vs $freq")
    // crosstab: cell counts sum to the table size
    val ct = o.stat.crosstab("o_orderpriority", "o_orderstatus")
    val cellSum = ct.collect().map(r =>
      (1 until r.length).map(i => r.getLong(i)).sum).sum
    assert(cellSum === n, s"crosstab cells sum $cellSum != $n")
  }

  test("binaryFile source: opaque bytes + metadata columns, glob-filtered") {
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("a.bin", Array[Byte](1, 2, 3))
    put("b.bin", Array[Byte](4, 5))
    put("skip.txt", Array[Byte](9))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.toString)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).sortBy(_._1)
    assert(rows.toSeq === Seq(
      ("a.bin", 3L, Seq[Byte](1, 2, 3)),
      ("b.bin", 2L, Seq[Byte](4, 5))),
      "binaryFile must surface exact bytes + metadata and respect the glob")
  }

  test("REPARTITION hint lands the requested partitioning") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("hint_orders")
    val df = spark.sql("SELECT /*+ REPARTITION(7) */ o_orderkey FROM hint_orders")
    assert(df.rdd.getNumPartitions === 7)
  }
}
