package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Salting must never change results — only the shuffle layout. Each spec
  * compares the salted plan's output multiset to the unsalted one on a
  * deliberately skewed dataset (90% of rows share one key).
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (1 to 1000).map { i =>
    val key = if (i % 10 == 0) i.toString else "HOT"
    (key, i.toLong)
  }.toDF("k", "v")

  private lazy val dim = Seq(("HOT", "hot-dim"), ("10", "ten"), ("20", "twenty"))
    .toDF("k", "label")

  test("saltedJoin equals plain inner join (multiset)") {
    val plain = skewed.join(dim, "k").select($"k", $"v", $"label")
    val salted = SkewOps.saltedJoin(skewed, dim, "k", salt = 8)
      .select($"k", $"v", $"label")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  // 900 hot rows that are BYTE-IDENTICAL — the documented degenerate input
  // for content-hash scatter (replayed events / default-valued records)
  private lazy val identicalHot = (1 to 1000).map { i =>
    if (i % 10 == 0) (s"COLD$i", i.toLong) else ("HOT", 1L)
  }.toDF("k", "v")

  test("content scatter degenerates on byte-identical hot rows (documented precondition)") {
    // every identical row hashes alike: the hot key collapses to ONE salt
    // bucket and the mitigation silently becomes the unsalted plan
    val buckets = identicalHot.filter($"k" === "HOT")
      .withColumn("s", pmod(hash($"k", $"v"), lit(8)))
      .select($"s").distinct().count()
    assert(buckets === 1)
  }

  test("positional scatter spreads byte-identical hot rows and keeps results exact") {
    // the positional hash does spread identical rows...
    val buckets = identicalHot.filter($"k" === "HOT")
      .withColumn("s", pmod(hash(monotonically_increasing_id()), lit(8)))
      .select($"s").distinct().count()
    assert(buckets > 1, "positional scatter must split the identical hot rows")
    // ...and both salted operators still return exactly the unsalted result
    val plainAgg = identicalHot.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))
    val saltedAgg = SkewOps.saltedSumCount(identicalHot, "k", "v", salt = 8,
      positionalScatter = true)
    assert(saltedAgg.exceptAll(plainAgg).isEmpty && plainAgg.exceptAll(saltedAgg).isEmpty)
    val plainJoin = identicalHot.join(dim, "k").select($"k", $"v", $"label")
    val saltedJoin = SkewOps.saltedJoin(identicalHot, dim, "k", salt = 8,
      positionalScatter = true).select($"k", $"v", $"label")
    assert(saltedJoin.count() === plainJoin.count())
    assert(saltedJoin.exceptAll(plainJoin).isEmpty && plainJoin.exceptAll(saltedJoin).isEmpty)
  }

  test("saltedSumCount equals plain groupBy sum/count") {
    val plain = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))
    val salted = SkewOps.saltedSumCount(skewed, "k", "v", salt = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key really was split: phase-1 groups exceed distinct keys
    val phase1Groups = skewed
      .withColumn("s", pmod(hash($"k", $"v"), lit(8)))
      .select($"k", $"s").distinct().count()
    assert(phase1Groups > skewed.select($"k").distinct().count())
  }

  test("q205 autotuned salt derives from the measured hot-key magnitude " +
      "and the salted result equals the plain join") {
    val res = graft.queries.Relational.saltedJoinAutotuned(spark, sfDir)
    val rows = res.collect()
    // Re-derive the expected fan-out from the fixture directly.
    val hot = Tables.lineitem(spark, sfDir)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("cnt"))
      .agg(max($"cnt")).collect()(0).getLong(0)
    val bucket = 63 - java.lang.Long.numberOfLeadingZeros(hot)
    val expectSalt = math.min(32, math.max(1, 1 << math.max(0, bucket - 6)))
    assert(rows.forall(_.getAs[Int]("salt_lanes") == expectSalt),
      s"salt_lanes must equal the data-derived fan-out $expectSalt")
    // And the salted join's aggregate equals the plain unsalted plan.
    val plain = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey", graft.queries.Portable.cents($"l_extendedprice").as("pc"))
      .join(Tables.supplier(spark, sfDir)
        .select($"s_suppkey".as("l_suppkey"), $"s_nationkey"), "l_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), sum($"pc").as("sum_cents"))
    val got = res.drop("salt_lanes")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }
}
