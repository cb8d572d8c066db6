package graft

import graft.operators.Bucketing
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, sum, when}

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

  test("z-ordered write prunes files on BOTH keys; single-key clustering only on one") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, sfDir)
    val files = 16
    Bucketing.writeZOrdered(li, s"$base/z", "l_orderkey", "l_partkey", files)
    Bucketing.writeClustered(li, s"$base/r", "l_orderkey", files)

    // Per-file bounding boxes over both keys.
    def boxes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("loA"), max("l_orderkey").as("hiA"),
        min("l_partkey").as("loB"), max("l_partkey").as("hiB"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (zb, rb) = (boxes(s"$base/z"), boxes(s"$base/r"))
    assert(zb.length === files && rb.length === files)

    // A quarter-range predicate on the SECOND key: min/max skipping keeps
    // only files whose box intersects it.
    val Row(loB: Long, hiB: Long) =
      li.agg(min("l_partkey"), max("l_partkey")).collect()(0)
    val bHi = loB + (hiB - loB) / 4
    def surviving(bs: Array[(Long, Long, Long, Long)]) =
      bs.count { case (_, _, lo, hi) => lo <= bHi && hi >= loB }
    // Single-key clustering on A cannot skip anything on B...
    assert(surviving(rb) === files, "range layout unexpectedly pruned on B")
    // ...z-order must skip a clear majority-adjacent share for a quarter
    // range. Threshold 10/16, not 8/16: RangePartitioner SAMPLES its
    // bounds with a run-dependent seed, so file boxes jitter by one file
    // across runs (observed 8↔9) — the discriminating claim vs the
    // single-key layout (16/16 survive) is unaffected.
    assert(surviving(zb) <= files * 5 / 8,
      s"z-order pruned too little on B: ${surviving(zb)} of $files files survive")

    // And it still skips on the FIRST key too (quarter range on A).
    val Row(loA: Long, hiA: Long) =
      li.agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
    val aHi = loA + (hiA - loA) / 4
    val zSurviveA = zb.count { case (lo, hi, _, _) => lo <= aHi && hi >= loA }
    assert(zSurviveA <= files / 2,
      s"z-order pruned too little on A: $zSurviveA of $files files survive")

    // Lossless relayout: same multiset (count + exact key sums).
    val orig = li.agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey")).collect()(0)
    val rela = spark.read.parquet(s"$base/z")
      .agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey")).collect()(0)
    assert(orig === rela)
  }

  test("observed write reports row/null/total metrics from the write pass itself") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("observed").toString
    val o = Tables.orders(spark, sfDir)
    val metrics = Bucketing.writeObserved(o, s"$base/out", "o_custkey", "o_totalprice")
    // the metrics must agree with an independent read of what was written
    val written = spark.read.parquet(s"$base/out")
    val expected = written.agg(
      count(lit(1)),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)),
      sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))).head()
    assert(metrics("n_rows") === expected.getLong(0))
    assert(metrics("n_null_keys") === expected.getLong(1))
    assert(metrics("total_cents") === expected.getLong(2))
    assert(metrics("n_rows").asInstanceOf[Long] > 0)
  }

  test("compaction rewrites many small files into byte-targeted few, losslessly") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    // Simulate a streaming sink's debris: 64 tiny files.
    Tables.lineitem(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(s"$base/small")
    val smallFiles = new java.io.File(s"$base/small")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(smallFiles === 64)

    val nOut = Bucketing.compact(spark, s"$base/small", s"$base/big", 8L << 20)
    val bigFiles = new java.io.File(s"$base/big")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(bigFiles === nOut && nOut < 8,
      s"expected few byte-targeted files, got $bigFiles (nOut=$nOut)")

    // Lossless: identical multiset under exact aggregates.
    def sig(dir: String) = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey"),
        sum(graft.queries.Portable.cents(col("l_extendedprice")))).collect()(0)
    assert(sig(s"$base/small") === sig(s"$base/big"))
  }

  test("q206 zorder skipping proof: z-order prunes files on EITHER key, " +
      "range only on its own, linear on neither") {
    val res = graft.queries.Sources.zorderSkippingProof(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("pred")) ->
        (r.getAs[Long]("files_scanned"), r.getAs[Long]("files_total")))
      .toMap
    def scanned(l: String, p: String) = res((l, p))._1
    def total(l: String, p: String) = res((l, p))._2
    // linear: every file spans the whole key plane — nothing skips
    assert(scanned("linear", "partkey_band") == total("linear", "partkey_band"))
    assert(scanned("linear", "suppkey_band") == total("linear", "suppkey_band"))
    // range-on-partkey: near-perfect on partkey, useless on suppkey
    assert(scanned("range", "partkey_band") <= 2)
    assert(scanned("range", "suppkey_band") == total("range", "suppkey_band"))
    // zorder: substantial pruning on BOTH predicates
    assert(scanned("zorder", "partkey_band") <= total("zorder", "partkey_band") / 2)
    assert(scanned("zorder", "suppkey_band") <= total("zorder", "suppkey_band") / 2)
  }

  test("q206 layouts are one physical parquet file per fid directory " +
      "(fid identity == file identity)") {
    // zorderSkippingProof above staged the layouts for this sfDir/JVM.
    graft.queries.Sources.zorderSkippingProof(spark, sfDir).collect()
    val root = s"/tmp/graft_stage/${ProcessHandle.current.pid}/" +
      s"${new java.io.File(sfDir).getName}/li_layouts"
    for (layout <- Seq("linear", "range", "zorder")) {
      val dirs = new java.io.File(s"$root/$layout").listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("fid="))
      assert(dirs.nonEmpty, s"$layout: no fid partition dirs")
      for (d <- dirs) {
        val files = d.listFiles.count(_.getName.endsWith(".parquet"))
        assert(files == 1, s"$layout/${d.getName}: expected 1 file, got $files")
      }
      // _metadata agrees: distinct physical files == distinct fids
      val m = spark.read.parquet(s"$root/$layout")
        .select(col("fid"), col("_metadata.file_path").as("fp"))
        .agg(countDistinct(col("fid")).as("nf"), countDistinct(col("fp")).as("np"))
        .collect()(0)
      assert(m.getLong(0) === m.getLong(1),
        s"$layout: fids ${m.getLong(0)} != files ${m.getLong(1)}")
    }
  }

  test("q231 observed write: metrics equal a direct recount of the fixture") {
    val res = graft.queries.Sources.observedWrite(spark, sfDir).collect()
    assert(res.length == 1)
    val r = res(0)
    val exp = graft.Tables.orders(spark, sfDir)
      .agg(count(lit(1)),
        sum(when(col("o_orderkey") % 97 === 0, 1L).otherwise(0L)),
        sum(graft.queries.Portable.cents(col("o_totalprice"))))
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === exp.getLong(0))
    assert(r.getAs[Long]("n_null_keys") === exp.getLong(1))
    assert(r.getAs[Long]("total_cents") === exp.getLong(2))
    assert(r.getAs[Long]("n_null_keys") > 0,
      "fixture must exercise the null-counting path")
  }

  test("q232 AQE skew split fires and the census is join-complete") {
    val rows = graft.queries.Sources.aqeSkewSplitProof(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Boolean]("skew_split_fired")),
      "AQE did not split the hot partition")
    val byHot = rows.map(r =>
      r.getAs[Boolean]("is_hot") -> r.getAs[Long]("n_rows")).toMap
    // 90% of keys collapse onto the hot key; both groups must be present
    assert(byHot.keySet == Set(true, false))
    assert(byHot(true) > byHot(false) * 2,
      s"hot group should dominate: $byHot")
    // conf overrides must not leak into the shared session
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }
}
