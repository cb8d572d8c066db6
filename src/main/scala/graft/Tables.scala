package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md §B).
  *
  * Each driver fixture is a single parquet file under the scale-factor dir.
  * Always loaded with the parquet-embedded schema (explicit, not inferred at
  * read time — parquet files carry their own StructType), so filters and
  * column pruning push down to the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") readEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long (legacy conf) and convert
    * with *integer* division to micros — the values carry no sub-µs
    * component, and int64 nanos exceed 2^53 so a double roundtrip would
    * corrupt them.
    *
    * `nanosAsLong` is a SESSION-level conf: the parquet→catalyst schema
    * conversion happens per file at execution time, so it cannot be scoped
    * to this one read (a save/restore around the lazy DataFrame would be
    * unset again by action time). Every graft session builder
    * (Verify/Bench/ExplainAudit/Demo/TestSpark) pre-sets it; the set below
    * is kept so the loader also works on a caller-supplied session, at the
    * documented cost that any other TIMESTAMP(NANOS) read in that session
    * then resolves as LONG too.
    */
  private def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
