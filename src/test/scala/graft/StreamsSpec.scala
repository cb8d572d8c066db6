package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming validated by batch equivalence: the same transform applied to
  * a MemoryStream must converge to its batch result (SURVEY.md §5.2).
  */
class StreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sample = Seq(
    Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0, "{}"),
    Event(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0, "{}"),
    Event(3, ts("2024-01-01 11:05:00"), 2, "view", 3.0, "{}"),
    Event(4, ts("2024-01-01 11:45:00"), 2, "view", 4.0, "{}"),
    Event(5, ts("2024-01-01 13:00:00"), 1, "click", 5.0, "{}"),
    Event(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0, "{}") // duplicate id
  )

  private def runStream(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: OutputMode = OutputMode.Complete()): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(sample.take(3))
    mem.addData(sample.drop(3))
    val q = transform(mem.toDF())
      .writeStream.format("memory").queryName("t_out").outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table("t_out").collect()
  }

  test("tumbling window counts: stream equals batch") {
    import spark.implicits._
    val batch = Streams.tumblingCounts(sample.toDF()).collect().toSet
    val stream = runStream(Streams.tumblingCounts).toSet
    assert(stream === batch)
    assert(batch.exists(r => r.getString(1) == "click" && r.getLong(2) == 3)) // 10:00 window incl. dup
  }

  test("sliding window counts: stream equals batch") {
    import spark.implicits._
    val batch = Streams.slidingCounts(sample.toDF()).collect().toSet
    val stream = runStream(Streams.slidingCounts).toSet
    assert(stream === batch)
    // a 10:05 event belongs to 4 sliding windows (09:15..10:00 starts)
    assert(batch.count(r => r.getString(1) == "click") >= 4)
  }

  test("session windows per user: stream equals batch") {
    import spark.implicits._
    val batch = Streams.sessionCounts(sample.toDF()).collect().toSet
    val stream = runStream(Streams.sessionCounts).toSet
    assert(stream === batch)
    // user 1: 10:05+10:20 in one session (gap<30m), 13:00 alone; user 2: 11:05 / 11:45 separate
    assert(batch.size === 4)
  }

  test("two-level windowed agg (chained stateful operators): stream equals batch on closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Streams.twoLevelDailyMax(sample.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val mem = MemoryStream[Event]
    mem.addData(sample)
    val q = Streams.twoLevelDailyMax(
        mem.toDF().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("t_twolevel")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // append mode only emits windows the watermark has closed: push a
    // far-future sentinel to flush the sample's day windows, then ignore
    // the sentinel's own (still-open) window in the comparison
    mem.addData(Event(999, ts("2024-03-01 00:00:00"), 9, "flush", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_twolevel").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === batch,
      s"closed-window stream output must equal batch:\n$streamed\nvs\n$batch")
  }

  test("streaming dedup drops the duplicate event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(sample)
    val q = Streams.dedupEvents(mem.toDF()).writeStream
      .format("memory").queryName("t_dedup").outputMode(OutputMode.Append).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("t_dedup").count() === 5)
    assert(Streams.dedupEvents(sample.toDF()).count() === 5) // batch agrees
  }

  test("stateful user totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.userTotals(mem.toDS()).writeStream
      .format("memory").queryName("t_tot").outputMode(OutputMode.Update).start()
    mem.addData(sample.take(3)); q.processAllAvailable()
    mem.addData(sample.drop(3)); q.processAllAvailable()
    q.stop()
    // last update per user reflects the full history
    val last = spark.table("t_tot").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1) }
    assert(last(1L) === ((4L, 10.0))) // events 1,2,5 + dup id 2
    assert(last(2L) === ((2L, 7.0)))
  }

  test("stream-stream click-view interval join: stream equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
      Event(2, ts("2024-01-01 12:00:00"), 1, "click", 1.0, "{}"),
      Event(3, ts("2024-01-01 10:10:00"), 2, "click", 1.0, "{}"))
    val views = Seq(
      Event(10, ts("2024-01-01 10:15:00"), 1, "view", 1.0, "{}"), // in click 1's window
      Event(11, ts("2024-01-01 10:45:00"), 1, "view", 1.0, "{}"), // outside every window
      Event(12, ts("2024-01-01 10:20:00"), 2, "view", 1.0, "{}"), // in click 3's window
      Event(13, ts("2024-01-01 12:29:00"), 1, "view", 1.0, "{}")) // in click 2's window
    val memC = MemoryStream[Event]
    val memV = MemoryStream[Event]
    val q = Streams.clickViewJoin(memC.toDF(), memV.toDF()).writeStream
      .format("memory").queryName("t_ssjoin").outputMode(OutputMode.Append).start()
    // feed the sides unevenly across micro-batches: matches must still
    // surface once both halves have arrived (that's the buffered state)
    memC.addData(clicks.take(2)); memV.addData(views.take(1)); q.processAllAvailable()
    memV.addData(views.drop(1)); memC.addData(clicks.drop(2)); q.processAllAvailable()
    q.stop()
    val batch = Streams.clickViewJoin(clicks.toDF(), views.toDF()).collect().toSet
    assert(spark.table("t_ssjoin").collect().toSet === batch)
    assert(batch.map(r => (r.getLong(0), r.getLong(1))) ===
      Set((1L, 10L), (2L, 13L), (3L, 12L)))
  }

  test("stream-stream LEFT OUTER join: unmatched clicks emit after the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"), // matched
      Event(2, ts("2024-01-01 10:05:00"), 2, "click", 1.0, "{}")) // never matched
    val views = Seq(
      Event(10, ts("2024-01-01 10:15:00"), 1, "view", 1.0, "{}"))
    val memC = MemoryStream[Event]
    val memV = MemoryStream[Event]
    // zero-delay watermark so event time alone drives outer emission
    val q = Streams.clickViewJoinOuter(memC.toDF(), memV.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("t_ssouter")
      .outputMode(OutputMode.Append).start()
    memC.addData(clicks); memV.addData(views); q.processAllAvailable()
    // click 2's interval ends 10:35; the 10:15 watermark cannot prove it
    // unmatched yet — only the matched row may have surfaced
    val early = spark.table("t_ssouter").collect()
    assert(!early.exists(_.getLong(0) == 2L),
      "outer row emitted before the watermark closed its interval")
    // advance BOTH watermarks past 10:35 (the join watermark is the min
    // of the two sides); the unmatched click must now surface with -1s
    memV.addData(Seq(Event(11, ts("2024-01-01 12:00:00"), 9, "view", 1.0, "{}")))
    memC.addData(Seq(Event(3, ts("2024-01-01 12:00:00"), 9, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssouter").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), "matched pair missing")
    assert(got.contains((2L, -1L)), "unmatched click never emitted")
    // and the batch twin agrees with a plain LEFT JOIN of the same data
    val batch = Streams.clickViewJoinOuter(clicks.toDF(), views.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 10L), (2L, -1L)))
  }

  test("stream-stream FULL OUTER join: both unmatched sides emit after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"), // matched
      Event(2, ts("2024-01-01 10:05:00"), 2, "click", 1.0, "{}")) // never matched
    val views = Seq(
      Event(10, ts("2024-01-01 10:15:00"), 1, "view", 1.0, "{}"),
      Event(11, ts("2024-01-01 10:20:00"), 3, "view", 1.0, "{}")) // no click claims it
    val memC = MemoryStream[Event]
    val memV = MemoryStream[Event]
    val q = Streams.clickViewJoinFull(memC.toDF(), memV.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("t_ssfull")
      .outputMode(OutputMode.Append).start()
    memC.addData(clicks); memV.addData(views); q.processAllAvailable()
    // advance both watermarks far past every open interval
    memV.addData(Seq(Event(12, ts("2024-01-01 12:00:00"), 9, "view", 1.0, "{}")))
    memC.addData(Seq(Event(3, ts("2024-01-01 12:00:00"), 9, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssfull").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), "matched pair missing")
    assert(got.contains((2L, -1L)), "unmatched click never emitted")
    assert(got.contains((-1L, 11L)), "unclaimed view never emitted")
    // batch twin = plain FULL JOIN of the same data
    val batch = Streams.clickViewJoinFull(clicks.toDF(), views.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 10L), (2L, -1L), (-1L, 11L)))
  }

  test("stream-stream RIGHT OUTER join: unclaimed views emit after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"))
    val views = Seq(
      Event(10, ts("2024-01-01 10:15:00"), 1, "view", 1.0, "{}"), // claimed
      Event(11, ts("2024-01-01 10:20:00"), 3, "view", 1.0, "{}")) // unclaimed
    val memC = MemoryStream[Event]
    val memV = MemoryStream[Event]
    val q = Streams.clickViewJoinRight(memC.toDF(), memV.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("t_ssright")
      .outputMode(OutputMode.Append).start()
    memC.addData(clicks); memV.addData(views); q.processAllAvailable()
    // advance both watermarks past every open interval (disjoint users)
    memV.addData(Seq(Event(12, ts("2024-01-01 12:00:00"), 8, "view", 1.0, "{}")))
    memC.addData(Seq(Event(2, ts("2024-01-01 12:00:00"), 9, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssright").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), "claimed pair missing")
    assert(got.contains((-1L, 11L)), "unclaimed view never emitted")
    // batch twin = plain RIGHT JOIN of the same data
    val batch = Streams.clickViewJoinRight(clicks.toDF(), views.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 10L), (-1L, 11L)))
  }

  test("stream-stream LEFT SEMI join: one row per converted click, no view fanout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"), // 2 matching views
      Event(2, ts("2024-01-01 10:05:00"), 2, "click", 1.0, "{}")) // never matched
    val views = Seq(
      Event(10, ts("2024-01-01 10:15:00"), 1, "view", 1.0, "{}"),
      Event(11, ts("2024-01-01 10:20:00"), 1, "view", 1.0, "{}"), // same click — must NOT duplicate
      Event(12, ts("2024-01-01 10:30:00"), 3, "view", 1.0, "{}"))
    val memC = MemoryStream[Event]
    val memV = MemoryStream[Event]
    val q = Streams.clickViewJoinSemi(memC.toDF(), memV.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("t_sssemi")
      .outputMode(OutputMode.Append).start()
    memC.addData(clicks); memV.addData(views); q.processAllAvailable()
    // advance both watermarks past every open interval (disjoint users so
    // the advancer rows cannot semi-join each other)
    memV.addData(Seq(Event(13, ts("2024-01-01 12:00:00"), 8, "view", 1.0, "{}")))
    memC.addData(Seq(Event(3, ts("2024-01-01 12:00:00"), 9, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_sssemi").collect().map(_.getLong(0)).toSeq.sorted
    // click 1 exactly once despite two matching views; click 2 never
    assert(got === Seq(1L), s"semi output wrong: $got")
    // batch twin = LEFT SEMI JOIN of the same data
    val batch = Streams.clickViewJoinSemi(clicks.toDF(), views.toDF())
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(batch === Seq(1L))
  }

  test("stream-static dim enrichment: stream equals batch, unmatched → 'unknown'") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 has a segment; user 2 is missing from the dim (left semantics)
    val dim = Seq((1L, "gold")).toDF("user_id", "segment")
    val mem = MemoryStream[Event]
    val q = Streams.enrichWithDim(mem.toDF(), dim).writeStream
      .format("memory").queryName("t_dim").outputMode(OutputMode.Append).start()
    mem.addData(sample.take(3)); q.processAllAvailable()
    mem.addData(sample.drop(3)); q.processAllAvailable()
    q.stop()
    val batch = Streams.enrichWithDim(sample.toDF(), dim).collect().toSet
    assert(spark.table("t_dim").collect().toSet === batch)
    assert(batch.count(_.getString(4) == "unknown") === 2) // user 2's events
    assert(batch.count(_.getString(4) == "gold") === 3) // user 1 (dup row collapses in the set)
  }

  test("event-time TTL evicts idle user state; a returning user restarts from zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // 1-hour TTL, zero-delay watermark: expiry is driven purely by event time
    val q = Streams.userTotalsExpiring(mem.toDS(), ttlMs = 60L * 60 * 1000, delay = "0 seconds")
      .writeStream.format("memory").queryName("t_ttl").outputMode(OutputMode.Update).start()
    // batch 1: user 1 seeds state (timeout armed at 11:00)
    mem.addData(Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    // batch 2: only user 2 — its 20:00 event advances the watermark past 11:00
    mem.addData(Seq(Event(2, ts("2024-01-01 20:00:00"), 2, "view", 5.0, "{}")))
    q.processAllAvailable()
    // batch 3: still no user-1 data; the now-current 20:00 watermark fires
    // user 1's timeout and its state is removed
    mem.addData(Seq(Event(3, ts("2024-01-01 20:05:00"), 2, "view", 1.0, "{}")))
    q.processAllAvailable()
    // batch 4: user 1 returns — must restart at n=1, not accumulate to 2
    mem.addData(Seq(Event(4, ts("2024-01-01 20:30:00"), 1, "click", 2.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val user1 = spark.table("t_ttl").collect().filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(user1.toSeq === Seq((1L, 1.0), (1L, 2.0)),
      s"expected state restart after TTL expiry, got ${user1.toSeq}")
    // control: the unbounded variant accumulates (2, 3.0) on the same feed —
    // proving the difference above comes from expiry, not from the rewrite
    val all = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
      Event(4, ts("2024-01-01 20:30:00"), 1, "click", 2.0, "{}"))
    val mem2 = MemoryStream[Event]
    val q2 = Streams.userTotals(mem2.toDS()).writeStream
      .format("memory").queryName("t_nottl").outputMode(OutputMode.Update).start()
    all.foreach { e => mem2.addData(Seq(e)); q2.processAllAvailable() }
    q2.stop()
    val lastNoTtl = spark.table("t_nottl").collect().filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).last
    assert(lastNoTtl === ((2L, 3.0)))
  }

  test("late-but-admitted older events do not pull the TTL timeout earlier") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // 1-hour TTL, 4-hour watermark delay (so the late event below is
    // admitted). The documented contract is (latest event SEEN SO FAR +
    // ttl): re-arming from only the CURRENT batch's max would move user
    // 1's timeout from 11:00 back to 08:00 and evict it at batch 4.
    val q = Streams.userTotalsExpiring(mem.toDS(), ttlMs = 60L * 60 * 1000, delay = "4 hours")
      .writeStream.format("memory").queryName("t_ttl_late").outputMode(OutputMode.Update).start()
    // batch 1: user 1 @ 10:00 → timeout armed at 11:00 (watermark 06:00)
    mem.addData(Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    // batch 2: user 1 LATE event @ 07:00 — above the 06:00 watermark, so
    // admitted; must NOT re-arm the timeout back to 08:00
    mem.addData(Seq(Event(2, ts("2024-01-01 07:00:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    // batch 3: user 2 @ 14:00 advances the watermark to 10:00 — past the
    // buggy 08:00 timeout, short of the correct 11:00 one
    mem.addData(Seq(Event(3, ts("2024-01-01 14:00:00"), 2, "view", 1.0, "{}")))
    q.processAllAvailable()
    // batch 4: user-1-less batch where a (wrongly) expired timeout would fire
    mem.addData(Seq(Event(4, ts("2024-01-01 14:05:00"), 2, "view", 1.0, "{}")))
    q.processAllAvailable()
    // batch 5: user 1 returns before its documented horizon — must ACCUMULATE
    mem.addData(Seq(Event(5, ts("2024-01-01 14:10:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val user1Last = spark.table("t_ttl_late").collect().filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).last
    assert(user1Last === ((3L, 3.0)),
      s"late batch pulled the timeout earlier and evicted live state: $user1Last")
  }

  test("userTotalsExpiring rejects a non-positive TTL") {
    import spark.implicits._
    val empty = spark.emptyDataset[Event]
    intercept[IllegalArgumentException](Streams.userTotalsExpiring(empty, ttlMs = 0L))
    intercept[IllegalArgumentException](Streams.userTotalsExpiring(empty, ttlMs = -5L))
  }

  test("transformWithState TTL purges idle state; a returning user restarts from zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // TTL mode checkpoints extra (secondary-index) state per batch; the
    // checksum checkpoint manager's async close deadlocks under that load
    // on a local-FS checkpoint (stack: ChecksumCancellableFSDataOutputStream
    // .close awaiting a result that never arrives). Local-FS test
    // checkpoints don't need corruption detection — turn it off here.
    val prevChecksum = spark.conf.getOption("spark.sql.streaming.checkpoint.fileChecksum.enabled")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try {
      // In TimeMode.ProcessingTime the operator always schedules another
      // micro-batch for potential timer/TTL work, so the query NEVER
      // quiesces: processAllAvailable blocks forever and even
      // Trigger.AvailableNow never terminates (verified by jstack — the
      // trigger executor keeps running timer batches). Drive it instead by
      // polling the sink with a deadline, then stop() explicitly.
      val mem = MemoryStream[Event]
      val q = Streams.userTotalsTws(mem.toDS(), ttl = Some(java.time.Duration.ofMillis(300)))
        .writeStream.format("memory").queryName("t_tws_ttl")
        .outputMode(OutputMode.Update).start()
      def user1Rows: Seq[(Long, Double)] =
        spark.table("t_tws_ttl").collect().toSeq
          .filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getDouble(2)))
      def awaitSink(expect: (Long, Double), what: String): Unit = {
        val deadline = System.currentTimeMillis + 60000
        while (System.currentTimeMillis < deadline && !user1Rows.contains(expect))
          Thread.sleep(100)
        assert(user1Rows.contains(expect), s"$what: got $user1Rows")
      }
      mem.addData(Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}")))
      awaitSink((1L, 1.0), "first event must seed totals")
      // let wall-clock pass well beyond the 300 ms TTL (batches keep
      // ticking meanwhile), then touch the key: the expired value reads
      // back as absent, so totals restart instead of accumulating to (2, 3.0)
      Thread.sleep(2000)
      mem.addData(Seq(Event(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0, "{}")))
      awaitSink((1L, 2.0), "state must have been TTL-purged before the second event")
      q.stop()
      assert(!user1Rows.contains((2L, 3.0)),
        s"unexpired state accumulated across the TTL horizon: $user1Rows")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      prevChecksum match {
        case Some(p) => spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", p)
        case None => spark.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
      }
    }
  }

  test("watermark drops events later than the horizon (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agged = Streams.withWatermarked(mem.toDF(), "30 minutes")(Streams.tumblingCounts)
    val q = agged.writeStream.format("memory").queryName("t_wm")
      .outputMode(OutputMode.Append).start()
    // two on-time events in the 10:00 window
    mem.addData(Seq(
      Event(10, ts("2024-01-01 10:05:00"), 1, "click", 1.0, "{}"),
      Event(11, ts("2024-01-01 10:10:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    // jump far ahead: watermark advances to 19:30, finalizing 10:00
    mem.addData(Seq(Event(12, ts("2024-01-01 20:00:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    // a 10:07 straggler is now behind the watermark -> dropped
    mem.addData(Seq(Event(13, ts("2024-01-01 10:07:00"), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val tenOclock = spark.table("t_wm").collect()
      .filter(_.getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(tenOclock.map(_.getLong(2)).sum === 2) // late event not counted
  }

  test("transformWithState user totals match flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = Streams.userTotalsTws(mem.toDS()).writeStream
        .format("memory").queryName("t_tws").outputMode(OutputMode.Update).start()
      mem.addData(sample.take(3)); q.processAllAvailable()
      mem.addData(sample.drop(3)); q.processAllAvailable()
      q.stop()
      val last = spark.table("t_tws").collect()
        .groupBy(_.getLong(0)).map { case (u, rs) =>
          u -> rs.map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1) }
      assert(last(1L) === ((4L, 10.0)))
      assert(last(2L) === ((2L, 7.0)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch sink receives each file's rows exactly once") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("fb_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fb_ckpt").toString
    sample.take(4).toDF().write.mode("append").parquet(in)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def drain(): Unit = Streams.foreachBatchIngest(spark, in, ckpt,
      (df, _) => seen.addAndGet(df.count()))
    drain()
    assert(seen.get() === 4)
    drain() // checkpointed: nothing new, no re-delivery
    assert(seen.get() === 4)
  }

  test("maxFilesPerTrigger admission: N single-file writes drain as N one-file batches") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("rl_in").toString
    // 4 separate single-file appends (repartition(1) → one part-file each)
    sample.take(4).zipWithIndex.foreach { case (e, _) =>
      Seq(e).toDF().repartition(1).write.mode("append").parquet(in)
    }
    val ckpt1 = java.nio.file.Files.createTempDirectory("rl_c1").toString
    val counts1 = Streams.rateLimitedDrain(spark, in, ckpt1,
      Map("maxFilesPerTrigger" -> "1"))
    // the cap bounds every batch to ONE file's rows, and AvailableNow
    // still drains the whole backlog before stopping
    assert(counts1.length === 4, s"expected 4 capped batches: $counts1")
    assert(counts1.forall(_ === 1L), s"a batch admitted >1 file: $counts1")
    assert(counts1.sum === 4L)
    // doubling the cap halves the batch count; nothing re-delivers with a
    // fresh checkpoint reading the same files
    val ckpt2 = java.nio.file.Files.createTempDirectory("rl_c2").toString
    val counts2 = Streams.rateLimitedDrain(spark, in, ckpt2,
      Map("maxFilesPerTrigger" -> "2"))
    assert(counts2.length === 2 && counts2.forall(_ === 2L),
      s"expected 2 batches of 2: $counts2")
    // byte-based cap: 1 byte < any parquet file, and admission is
    // at-least-one-file, so it degenerates to one file per batch
    val ckpt3 = java.nio.file.Files.createTempDirectory("rl_c3").toString
    val counts3 = Streams.rateLimitedDrain(spark, in, ckpt3,
      Map("maxBytesPerTrigger" -> "1"))
    assert(counts3.length === 4 && counts3.forall(_ === 1L),
      s"expected 4 byte-capped batches: $counts3")
    // resuming from an existing checkpoint re-delivers nothing
    assert(Streams.rateLimitedDrain(spark, in, ckpt1,
      Map("maxFilesPerTrigger" -> "1")).isEmpty)
  }

  test("incremental rollup maintains exact per-key totals across drains, no double-count") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("ir_in").toString
    val out = java.nio.file.Files.createTempDirectory("ir_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ir_ckpt").toString
    def expected(rows: Seq[Event]) = rows.groupBy(_.user_id).map { case (u, es) =>
      (u, es.size.toLong,
        es.map(e => math.floor(e.value * 100.0 + 0.5).toLong).sum)
    }.toSet
    def view() = Streams.rollupView(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    sample.take(3).toDF().write.mode("append").parquet(in)
    Streams.incrementalRollup(spark, in, out, ckpt)
    assert(view() === expected(sample.take(3)))
    // new data arrives: one more drain folds it in incrementally
    sample.drop(3).toDF().write.mode("append").parquet(in)
    Streams.incrementalRollup(spark, in, out, ckpt)
    assert(view() === expected(sample))
    // idle drain: checkpoint says nothing new — totals must not move
    Streams.incrementalRollup(spark, in, out, ckpt)
    assert(view() === expected(sample))
    // partial debris compacts without changing the fold (sum of sums):
    // relayout every batch=<id> dir's files through one compaction pass
    val batches = new java.io.File(out).listFiles.filter(_.getName.startsWith("batch="))
    assert(batches.length >= 2, "expected one partial dir per drained batch")
    val compacted = java.nio.file.Files.createTempDirectory("ir_compact").toString
    batches.foreach { b =>
      graft.operators.Bucketing.compact(
        spark, b.toString, s"$compacted/${b.getName}", 64L << 20)
    }
    assert(Streams.rollupView(spark, compacted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === expected(sample))
  }

  test("file-stream ingest processes each file exactly once") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("stream_in").toString
    val out = java.nio.file.Files.createTempDirectory("stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    sample.take(3).toDF().write.mode("append").parquet(in)
    Streams.fileStreamIngest(spark, in, out, ckpt)
    assert(spark.read.parquet(out).count() === 3)
    // second drain with no new files adds nothing (checkpoint = exactly once)
    Streams.fileStreamIngest(spark, in, out, ckpt)
    assert(spark.read.parquet(out).count() === 3)
  }
}
