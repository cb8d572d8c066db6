package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Structured Streaming surface (SURVEY.md §2.B streaming): the reference's
  * event-driven micro-batch model (S3 `ObjectCreated` → Lambda,
  * `zappa_settings.json:28-36`) re-expressed as checkpointed file streams —
  * which upgrades the reference's at-least-once delivery to exactly-once
  * per file.
  *
  * Every windowed transform is a plain `DataFrame => DataFrame`, applied
  * identically to a batch frame or a stream: the batch run IS the oracle
  * (streaming results are validated by batch equivalence in StreamsSpec,
  * not DuckDB — each transform is run once as a checkpointed stream and
  * once as a batch frame over the same files, and the outputs compared).
  *
  * Scale: streaming aggs shuffle by (window, key); watermarks bound state
  * size — without them, 100 TB of history accumulates in the state store.
  */
object Streams {

  case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Tumbling 1-hour counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** TWO chained stateful aggregations — hourly counts re-aggregated to
    * a daily (max hourly burst, total) profile via window-of-window
    * (Spark 3.4+ multi-stateful support). In streaming this runs as two
    * state stores in APPEND mode behind one watermark; the same
    * DataFrame function executes on a batch frame for the q272 oracle
    * gate and the StreamsSpec equivalence test — incremental two-level
    * rollups (q177's family) without a foreachBatch escape hatch. */
  def twoLevelDailyMax(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(max("n").as("max_hourly"), sum("n").as("total"))
      .select(col("window.start").as("day"), col("event_type"),
        col("max_hourly"), col("total"))

  /** Sliding 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Session windows per user with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"), col("user_id"), col("n"))

  /** Stream-stream inner join: each click joined to the SAME user's views
    * in the following 30 minutes. The time-range predicate plus watermarks
    * on BOTH sides are what make this runnable as a stream: the range
    * bounds how long a buffered click can still find matching views, and
    * the watermark bounds how late either side may arrive — together they
    * let the join state evict rows older than (watermark − range), so
    * state size tracks the in-flight horizon, not stream history. The
    * batch form (watermarks are no-ops on batch frames) is the oracle
    * twin, declared as q77. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame, delay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", delay) else df
    wm(clicks).alias("c")
      .join(wm(views).alias("v"), expr(
        "c.user_id = v.user_id AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTES"))
      .select(
        col("c.event_id").as("click_id"), col("v.event_id").as("view_id"),
        col("c.user_id").as("user_id"),
        unix_timestamp(col("c.ts")).as("click_s"),
        unix_timestamp(col("v.ts")).as("view_s"))
  }

  /** LEFT OUTER form of [[clickViewJoin]] — clicks that never find a view
    * must still be reported (the drop-off signal). On a stream this is the
    * semantically hardest join mode: an unmatched click can only be
    * emitted once the engine KNOWS no match can still arrive, i.e. when
    * the watermark passes the end of the click's 30-minute interval — so
    * outer results trail the watermark by the interval length, and the
    * same state-eviction bound that caps memory also defines result
    * latency. Null-safe output: view columns surface as -1 sentinels so
    * the downstream schema stays non-null. Batch twin declared as q112
    * (watermarks are no-ops on batch frames; LEFT JOIN gives identical
    * rows), streaming path spec-covered with a watermark-advancing feed. */
  def clickViewJoinOuter(clicks: DataFrame, views: DataFrame, delay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", delay) else df
    wm(clicks).alias("c")
      .join(wm(views).alias("v"), expr(
        "c.user_id = v.user_id AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTES"),
        "leftOuter")
      .select(
        col("c.event_id").as("click_id"),
        coalesce(col("v.event_id"), lit(-1L)).as("view_id"),
        col("c.user_id").as("user_id"),
        unix_timestamp(col("c.ts")).as("click_s"),
        coalesce(unix_timestamp(col("v.ts")), lit(-1L)).as("view_s"))
  }

  /** FULL OUTER form of [[clickViewJoin]] — completes the stream-stream
    * join-mode family (inner q77, left q112): clicks that never find a
    * view AND views no click ever claimed both surface, each once the
    * watermark proves no match can still arrive. State/latency bounds are
    * the left-outer ones applied symmetrically: each side's buffered rows
    * evict at (watermark − its interval slack), and outer results trail
    * the watermark by the interval length. Sentinels keep both halves of
    * the schema non-null. Batch twin = FULL JOIN, declared as q138. */
  def clickViewJoinFull(clicks: DataFrame, views: DataFrame, delay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", delay) else df
    wm(clicks).alias("c")
      .join(wm(views).alias("v"), expr(
        "c.user_id = v.user_id AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTES"),
        "fullOuter")
      .select(
        coalesce(col("c.event_id"), lit(-1L)).as("click_id"),
        coalesce(col("v.event_id"), lit(-1L)).as("view_id"),
        coalesce(col("c.user_id"), col("v.user_id")).as("user_id"),
        coalesce(unix_timestamp(col("c.ts")), lit(-1L)).as("click_s"),
        coalesce(unix_timestamp(col("v.ts")), lit(-1L)).as("view_s"))
  }

  /** RIGHT OUTER form of [[clickViewJoin]] — "which views were never
    * claimed by a click?" (the inventory-of-unattributed-impressions
    * question). Symmetric to [[clickViewJoinOuter]] with the roles
    * swapped: an unmatched VIEW emits once the watermark proves no click
    * interval can still claim it; click columns surface as -1 sentinels.
    * Declared batch twin = RIGHT JOIN (q159). */
  def clickViewJoinRight(clicks: DataFrame, views: DataFrame, delay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", delay) else df
    wm(clicks).alias("c")
      .join(wm(views).alias("v"), expr(
        "c.user_id = v.user_id AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTES"),
        "rightOuter")
      .select(
        coalesce(col("c.event_id"), lit(-1L)).as("click_id"),
        col("v.event_id").as("view_id"),
        col("v.user_id").as("user_id"),
        coalesce(unix_timestamp(col("c.ts")), lit(-1L)).as("click_s"),
        unix_timestamp(col("v.ts")).as("view_s"))
  }

  /** LEFT SEMI form of [[clickViewJoin]] — "which clicks converted?"
    * without duplicating a click per matching view (the inner join q77
    * explodes a click × its views; the question most funnels ask is
    * per-click, so semi is the right cardinality). On a stream, semi is
    * cheaper than inner in OUTPUT but not in state: the left side still
    * buffers until the watermark closes its interval, because a match may
    * yet arrive — but each click emits at most ONCE, immediately on its
    * first match (no dedup pass downstream, no match-count skew in the
    * output volume). Emits only click-side columns by definition. Batch
    * twin = LEFT SEMI JOIN, declared as q145; streaming path
    * spec-covered. */
  def clickViewJoinSemi(clicks: DataFrame, views: DataFrame, delay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", delay) else df
    wm(clicks).alias("c")
      .join(wm(views).alias("v"), expr(
        "c.user_id = v.user_id AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTES"),
        "leftSemi")
      .select(
        col("event_id").as("click_id"),
        col("user_id").as("user_id"),
        unix_timestamp(col("ts")).as("click_s"))
  }

  /** Stream-static enrichment join — each streaming event joined to a
    * STATIC dimension frame (user → segment), the lookup-enrichment shape
    * most streaming pipelines start with. Unlike stream-stream (above),
    * this join is STATELESS: the static side is (re)read and broadcast per
    * micro-batch, nothing buffers, no watermark is required, and left
    * semantics are exact — so at any scale the cost is one broadcast of
    * the dim per batch, never join state. Works identically on a batch
    * frame, which is the spec's oracle twin. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"),
        coalesce(col("segment"), lit("unknown")).as("segment"))

  /** Watermarked stream variant of a windowed transform: watermark bounds
    * state and drops events later than `delay` behind the max seen ts. */
  def withWatermarked(events: DataFrame, delay: String)(f: DataFrame => DataFrame): DataFrame =
    f(events.withWatermark("ts", delay))

  /** Streaming dedup by event_id within the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`): with the
    * plain form, state for a key is never evicted unless the event-time
    * column is itself part of the dedup keys, so a long-lived stream grows
    * state without bound. The within-watermark form expires each key once
    * the watermark passes its event time — state is bounded by the number
    * of distinct ids seen per `delay` horizon, which is what a 100 TB
    * stream needs. Batch frames reject the within-watermark form
    * (UnsupportedOperationChecker), so the batch twin — which has no state
    * to bound — is plain dropDuplicates; the batch-equivalence spec ties
    * the two together. */
  def dedupEvents(events: DataFrame, delay: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing: per-user running totals via
    * flatMapGroupsWithState (update mode). State is one small record per
    * user — bounded by key cardinality, not input size. NoTimeout keeps
    * every key forever, which is fine for a bounded/catch-up run but grows
    * state with lifetime key cardinality on a long-lived stream — that
    * deployment should use [[userTotalsExpiring]] (event-time TTL). */
  def userTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          Iterator(next)
      }
  }

  /** [[userTotals]] with BOUNDED state: a key idle for `ttlMs` of event
    * time past its last event is evicted, so state size tracks the number
    * of ACTIVE users per TTL horizon instead of lifetime key cardinality —
    * the difference between a state store that plateaus and one that grows
    * forever on a 100 TB stream (same class of fix as
    * [[dedupEvents]]'s dropDuplicatesWithinWatermark).
    *
    * Event-time timeout, not processing-time: eviction is driven by the
    * watermark (set here from `delay`), which makes expiry deterministic
    * for replay/backfill and for the batch-equivalence test harness — a
    * wall-clock TTL would evict a different set of keys on every rerun of
    * the same data. A key's timeout re-arms at (its latest event SEEN SO
    * FAR + ttlMs) — the max event ts is carried in state, so a later batch
    * containing only older (late-but-admitted) events can never pull the
    * timeout EARLIER and evict a key before its documented TTL horizon;
    * the timed-out callback removes state and emits nothing, so a user
    * returning after expiry restarts from zero (asserted in StreamsSpec). */
  def userTotalsExpiring(
      events: Dataset[Event],
      ttlMs: Long = 30L * 60 * 1000,
      delay: String = "10 minutes"): Dataset[UserTotal] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      // state = (running total, max event ts ever seen for this key):
      // the high-water mark must survive batches, not be recomputed per
      // batch, or late-data batches would re-arm the timeout backwards
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[(UserTotal, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (prev, prevMaxTs) =
              state.getOption.getOrElse((UserTotal(uid, 0L, 0.0), Long.MinValue))
            var n = prev.n_events
            var tot = prev.total_value
            var maxTs = prevMaxTs
            it.foreach { e =>
              n += 1; tot += e.value
              if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
            }
            val next = UserTotal(uid, n, tot)
            state.update((next, maxTs))
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + ttlMs)
            Iterator(next)
          }
      }
  }

  /** The same per-user running totals on the `transformWithState` API
    * (Spark 4's successor to flatMapGroupsWithState): typed named state
    * via the processor handle, timer/TTL support when needed, and state
    * schema evolution — the API a long-lived 100 TB stream should be on.
    * Requires the RocksDB state-store provider (see StreamsSpec).
    *
    * `ttl` bounds state: with `TTLConfig(duration)` (and processing-time
    * mode) a value not updated within the duration stops being returned
    * and is purged by the store — the transformWithState twin of
    * [[userTotalsExpiring]]'s event-time timeout. TTLConfig.NONE keeps
    * state forever (catch-up/bounded runs only). */
  class UserTotalProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Event, UserTotal] {
    @transient private var state: ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotal](
        "totals", Encoders.product[UserTotal], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[Event], timers: TimerValues): Iterator[UserTotal] = {
      val prev = if (state.exists()) state.get() else UserTotal(key, 0L, 0.0)
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserTotal(key, n, tot)
      state.update(next)
      Iterator(next)
    }
  }

  /** Per-user running totals via transformWithState (update mode). Pass
    * `ttl` to bound state: the long-lived-stream deployment should —
    * a key idle longer than the TTL reads back as absent and is purged,
    * so a returning user restarts from zero (asserted in StreamsSpec). */
  def userTotalsTws(
      events: Dataset[Event],
      ttl: Option[java.time.Duration] = None): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new UserTotalProcessor(ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  /** foreachBatch sink: the escape hatch for sinks Structured Streaming
    * doesn't provide natively (JDBC, upserts, multi-sink fan-out). Each
    * micro-batch arrives as an ordinary DataFrame with its batch id —
    * exactly-once when the batch write is idempotent on (path, batchId).
    * This is also how streaming results get materialized for the batch
    * oracle compare. */
  def foreachBatchIngest(
      spark: SparkSession,
      inDir: String,
      checkpointDir: String,
      onBatch: (DataFrame, Long) => Unit,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    // Explicit schema lets the stream start on a not-yet-populated dir;
    // inference requires at least one file to exist already.
    val st = schema.getOrElse(spark.read.parquet(inDir).schema)
    val q = spark.readStream.schema(st).parquet(inDir)
      .writeStream
      .foreachBatch(onBatch)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Incremental per-key rollup maintenance — the streaming form of a
    * materialized aggregate: each micro-batch reduces to per-key PARTIALS
    * (count + exact cents sum) written to `outDir/batch=<id>`, and the
    * readable rollup is one fold over the partial files
    * ([[rollupView]]). Two properties make this the 100 TB shape:
    *
    *   - EXACTLY-ONCE on a plain parquet sink: the write is
    *     overwrite-by-batchId, so when the engine replays a micro-batch
    *     after a failure (same checkpoint), the partial is rewritten
    *     byte-identical instead of double-counted. (Idempotence is tied
    *     to the checkpoint's batch numbering — deleting the checkpoint
    *     and re-feeding WILL renumber batches; the checkpoint is part of
    *     the table.)
    *   - NO stream state: aggregation state lives in the table itself,
    *     not a state store — no watermark, no TTL, no growth with key
    *     cardinality in the engine. The partial files accrete instead,
    *     which is exactly the small-file debris [[graft.operators
    *     .Bucketing.compact]] exists to fold down; compaction preserves
    *     the fold because partials are re-aggregable (sum of sums).
    */
  def incrementalRollup(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit =
    foreachBatchIngest(spark, inDir, checkpointDir, (df, id) =>
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
            .as("cents"))
        .write.mode("overwrite").parquet(s"$outDir/batch=$id"),
      schema)

  /** The queryable rollup over [[incrementalRollup]]'s partials: one
    * groupBy folds per-batch partials to current totals. */
  def rollupView(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))

  /** File-stream ingest (reference R22): each file that lands in `inDir` is
    * processed exactly once (checkpointed), result appended as parquet.
    * `Trigger.AvailableNow` drains the backlog then stops — the batch
    * catch-up mode; pass a processing-time trigger for a live stream. */
  def fileStreamIngest(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    // Explicit schema lets the stream start on a not-yet-populated dir.
    val st = schema.getOrElse(spark.read.parquet(inDir).schema)
    val q = transform(spark.readStream.schema(st).parquet(inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append)
      .start()
    q.awaitTermination()
  }

  /** Rate-limited (admission-controlled) file-stream drain — the
    * operational backpressure knob for file sources as a TESTED contract:
    * `maxFilesPerTrigger` / `maxBytesPerTrigger` cap what each
    * micro-batch admits, so a backlog of 10⁶ small files after an outage
    * is worked off in bounded-memory batches instead of one giant batch
    * that OOMs the driver's file index or the executors' shuffle.
    * `Trigger.AvailableNow` honors the admission caps while still
    * draining to empty and stopping — the catch-up mode a 100 TB
    * re-backfill actually runs. Returns the per-micro-batch row counts
    * in execution order (empty batches excluded), which IS the contract
    * the spec pins: with `maxFilesPerTrigger=1` and N single-file
    * writes, exactly N batches of one file each.
    */
  def rateLimitedDrain(
      spark: SparkSession,
      inDir: String,
      checkpointDir: String,
      sourceOptions: Map[String, String]): Seq[Long] = {
    val st = spark.read.parquet(inDir).schema
    // Keyed by batchId, not appended: foreachBatch is AT-LEAST-ONCE (a
    // transiently failed micro-batch re-runs under the same batchId), so
    // an append buffer would double-count the retried epoch even though
    // its data is delivered once. Overwrite-by-id makes the retry
    // idempotent; emission in batchId order restores execution order.
    val counts = new scala.collection.mutable.HashMap[Long, Long]
    val reader = sourceOptions.foldLeft(spark.readStream.schema(st)) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.parquet(inDir)
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val n = df.count()
        if (n > 0) counts.synchronized { counts(batchId) = n }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    counts.toSeq.sortBy(_._1).map(_._2)
  }
}
