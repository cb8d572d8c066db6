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
}
