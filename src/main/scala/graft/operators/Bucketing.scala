package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the write-time answer to repeated
  * shuffle joins (SURVEY.md §2.B scan/sink rows; prompt's "co-located
  * joins via bucketing").
  *
  * Writing both fact tables bucketed+sorted on the join key means every
  * subsequent equi-join on that key is *exchange-free*: each task zips
  * bucket i with bucket i — at 100 TB that removes the single largest
  * network cost of a fact⋈fact join, paid once at ingest instead of per
  * query. BucketingSpec asserts the join plan contains no hash-partition
  * Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Exchange-free equi-join of two co-bucketed tables on their bucket
    * keys (requires equal bucket counts; Spark's bucketing rules line the
    * buckets up one-to-one). */
  def cobucketedJoin(
      spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right), col(leftKey) === col(rightKey))
  }

  /** Clustered write — range-repartition on the cluster key and sort each
    * partition before writing, so every output file covers a narrow,
    * non-overlapping key range. Parquet stores per-column min/max in the
    * footer, so a later `WHERE key BETWEEN …` scan skips every file whose
    * range misses — the data-layout half of pruning (partition dirs handle
    * the coarse grain, clustering handles the fine grain). At 100 TB this
    * is the difference between touching terabytes and touching the few
    * files that matter; the write cost is one range exchange, paid once at
    * ingest. `files` controls layout granularity: more files = finer
    * skipping but more footer/open overhead. */
  def writeClustered(df: DataFrame, dir: String, key: String, files: Int): Unit =
    df.repartitionByRange(files, df(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(dir)

  /** Z-order (Morton-curve) clustered write — the TWO-dimensional form of
    * [[writeClustered]]. Range clustering on one key gives perfect file
    * skipping on that key and none on any other: every file spans the full
    * range of the second column. Interleaving the bits of both keys into
    * one Morton code and range-clustering on THAT makes each file cover a
    * small rectangle of the (a, b) plane, so parquet min/max footers prune
    * files for predicates on EITHER key (or both) — the layout trick behind
    * Delta/Iceberg `OPTIMIZE ZORDER`, here as one range exchange at write
    * time, linear at any scale.
    *
    * Keys are first normalized to 16-bit grid cells against their global
    * min/max (one 1-row aggregate, attached by broadcast — no driver
    * collect), then interleaved with a fold of codegen'd shift/or ops:
    * z = Σ_i bitA_i·2^(2i+1) + bitB_i·2^(2i). The normalization divide is
    * (k−min)·65535/(max−min) in integer math — exact for key spans below
    * 2^47, the documented precondition. */
  def writeZOrdered(
      df: DataFrame, dir: String, keyA: String, keyB: String, files: Int): Unit = {
    import org.apache.spark.sql.functions._
    val ext = df.agg(
      min(col(keyA)).as("_loA"), max(col(keyA)).as("_hiA"),
      min(col(keyB)).as("_loB"), max(col(keyB)).as("_hiB"))
    val withZ = df.join(broadcast(ext))
      .withColumn("_ca", when(col("_hiA") === col("_loA"), lit(0L))
        .otherwise(expr(s"(($keyA - _loA) * 65535L) div (_hiA - _loA)")))
      .withColumn("_cb", when(col("_hiB") === col("_loB"), lit(0L))
        .otherwise(expr(s"(($keyB - _loB) * 65535L) div (_hiB - _loB)")))
      .withColumn("_z", mortonInterleave(col("_ca"), col("_cb")))
    withZ
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_loA", "_hiA", "_loB", "_hiB", "_ca", "_cb", "_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Morton (Z-curve) bit interleave of two 16-bit grid cells:
    * z = Σ_i cellA_i·2^(2i+1) + cellB_i·2^(2i) — a 32-bit code whose prefix
    * bits alternate between the two keys, so any fixed-length prefix pins a
    * rectangle of the (a, b) plane. Pure codegen'd shift/and/or ops; exact
    * and engine-portable (the q206 oracle replays the identical fold in
    * integer SQL). Inputs must already be normalized to [0, 65535]. */
  def mortonInterleave(
      cellA: org.apache.spark.sql.Column,
      cellB: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(cellA, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(cellB, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** Write with observed metrics — pipeline observability on the SAME
    * pass as the write: `Observation` attaches aggregate expressions to
    * the plan, the action computes them as accumulator-style side output,
    * and the caller gets (row count, null-key count, exact cents total)
    * without a second scan. At 100 TB a separate validation query re-reads
    * the table; this is free. The returned map is the write's health
    * check: a pipeline asserts on it (nonzero rows, zero null keys,
    * expected totals) before publishing the output path downstream. */
  def writeObserved(
      df: DataFrame, dir: String, keyCol: String, centsCol: String): Map[String, Any] = {
    import org.apache.spark.sql.functions._
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(floor(col(centsCol) * lit(100.0) + lit(0.5)).cast("long")).as("total_cents"))
      .write.mode("overwrite").parquet(dir)
    obs.get
  }

  /** Small-file compaction — the maintenance pass every streaming or
    * incremental sink needs: micro-batch writes accrete thousands of tiny
    * files, and at 100 TB the per-file open/footer/list overhead (and the
    * driver-side listing memory) comes to dominate scan cost long before
    * data volume does. Rewrites `inDir` into ceil(totalBytes/targetBytes)
    * files via a round-robin exchange — one shuffle of the data, paid once,
    * after which every scan of the table touches O(size/target) files
    * instead of O(batches). Returns the output file count. Sizing uses the
    * filesystem's own byte totals (compressed parquet size), not row
    * counts, so skew in row width can't produce oversized files. */
  def compact(
      spark: SparkSession, inDir: String, outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1L) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    nOut
  }
}
