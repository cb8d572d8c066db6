package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TwoPass

/** TwoPass (the scalable global/grouped rank) must be value-identical to
  * the single-partition-window definitions it replaces — on fixture data
  * and on adversarial sizes (n < k, k | n, k ∤ n, ties, empty). */
class TwoPassSpec extends SparkSpec {

  import spark.implicits._

  private def spend = graft.Tables.orders(spark, sfDir)
    .groupBy($"o_custkey")
    .agg(sum(graft.queries.Portable.cents($"o_totalprice")).as("spend"))

  test("rankWithCount matches global row_number + count") {
    val two = TwoPass.rankWithCount(spend, "rn", "n", $"spend".desc, $"o_custkey".asc)
      .select($"o_custkey", $"rn", $"n")
    val w = Window.orderBy($"spend".desc, $"o_custkey".asc)
    val ref = spend
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .select($"o_custkey", $"rn", $"n")
    assert(two.exceptAll(ref).isEmpty && ref.exceptAll(two).isEmpty)
  }

  test("ntileFromRank matches SQL NTILE for every (n, k) shape") {
    // n spans n<k, k|n, k∤n, n=k, n=1; values carry heavy ties.
    for (n <- Seq(1, 3, 4, 5, 10, 17, 23); k <- Seq(2, 5, 10)) {
      val df = (1 to n).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "v")
      val w = Window.orderBy($"v".asc, $"id".asc)
      val ref = df.withColumn("t", ntile(k).over(w).cast("long"))
        .select($"id", $"t")
      val got = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("t", TwoPass.ntileFromRank($"rn", lit(n.toLong), k))
        .select($"id", $"t")
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("two-pass ntile over fixture spend matches the window ntile") {
    val two = TwoPass.rankWithCount(spend, "rn", "n", $"spend".desc, $"o_custkey".asc)
      .withColumn("decile", TwoPass.ntileFromRank($"rn", $"n", 10))
      .select($"o_custkey", $"decile")
    val ref = spend.withColumn("decile",
        ntile(10).over(Window.orderBy($"spend".desc, $"o_custkey".asc)).cast("long"))
      .select($"o_custkey", $"decile")
    assert(two.exceptAll(ref).isEmpty && ref.exceptAll(two).isEmpty)
  }

  test("rankAndRunningSum matches the global cumulative window") {
    val w = Window.orderBy($"spend".desc, $"o_custkey".asc)
    val two = TwoPass.rankAndRunningSum(spend, "rn", "n", "cum", $"spend",
        $"spend".desc, $"o_custkey".asc)
      .select($"o_custkey", $"rn", $"cum")
    val ref = spend
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"spend").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"o_custkey", $"rn", $"cum")
    assert(two.exceptAll(ref).isEmpty && ref.exceptAll(two).isEmpty)
  }

  test("groupedRankWithCount matches per-group row_number + count (with ties)") {
    val o = graft.Tables.orders(spark, sfDir)
      .select($"o_orderpriority".as("prio"),
        graft.queries.Portable.cents($"o_totalprice").as("pc"))
    val two = TwoPass.groupedRankWithCount(o, Seq("prio"), "rn", "cnt", $"pc".asc)
    val ref = o
      .withColumn("rn", row_number().over(
        Window.partitionBy($"prio").orderBy($"pc".asc)).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"prio")))
    // pc ties make rn assignment order-dependent; compare the
    // tie-insensitive projection (value at each rank position + counts).
    val a = two.select($"prio", $"rn", $"pc", $"cnt")
    val b = ref.select($"prio", $"rn", $"pc", $"cnt")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("groupedRankAndRunningSum matches the per-group cumulative window") {
    val o = graft.Tables.orders(spark, sfDir)
      .select($"o_orderpriority".as("prio"), $"o_orderkey",
        graft.queries.Portable.cents($"o_totalprice").as("pc"))
    val two = TwoPass.groupedRankAndRunningSum(o, Seq("prio"),
        "rn", "cnt", "cum", $"pc", $"pc".asc, $"o_orderkey".asc)
      .select($"prio", $"o_orderkey", $"rn", $"cnt", $"cum")
    val w = Window.partitionBy($"prio").orderBy($"pc".asc, $"o_orderkey".asc)
    val ref = o
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"prio")))
      .withColumn("cum", sum($"pc").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"prio", $"o_orderkey", $"rn", $"cnt", $"cum")
    assert(two.exceptAll(ref).isEmpty && ref.exceptAll(two).isEmpty)
  }

  test("two-pass plans contain no data-sized single-partition exchange") {
    val two = TwoPass.rankWithCount(spend, "rn", "n", $"spend".desc, $"o_custkey".asc)
    two.collect()
    val plan = two.queryExecution.executedPlan.toString
    // The only SinglePartition exchange allowed is the one feeding the
    // ≤ numParts-row offsets window (below a Scan ExistingRDD → groupBy
    // collapse), never directly over the checkpointed data windows. The
    // data-sized window must be keyed on the pid.
    assert(plan.contains("__tp_pid"), s"two-pass marker missing:\n$plan")
    val winOnData = "Window \\[row_number".r.findAllIn(plan).toSeq
    assert(winOnData.nonEmpty)
    assert(plan.contains("hashpartitioning(__tp_pid"),
      s"per-partition rank window is not pid-keyed:\n$plan")
  }

  test("empty input yields empty output (no null offsets)") {
    val empty = spend.filter(lit(false))
    assert(TwoPass.rankWithCount(empty, "rn", "n", $"spend".desc).count() === 0L)
    assert(TwoPass.groupedRankWithCount(empty, Seq("o_custkey"), "rn", "cnt",
      $"spend".asc).count() === 0L)
  }
}
