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
}
