package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {
  import EventStreamOps._

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def event(id: Long, minute: Int, user: Long, tpe: String,
                    v: Double): Event =
    Event(id, ts(minute), user, tpe, v)

  test("windowed counts aggregate incrementally like batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreamOps.toMemorySink(
      windowedCounts(input.toDF(), "60 minutes", "60 minutes", "120 minutes"),
      "win_counts", OutputMode.Complete())
    input.addData(
      event(1, 5, 1, "click", 1.0), event(2, 20, 2, "click", 2.0),
      event(3, 65, 1, "view", 5.0))
    q.processAllAvailable()
    input.addData(event(4, 70, 3, "view", 7.0))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select("event_type", "events", "total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows == Set(("click", 2L, 3.0), ("view", 2L, 12.0)))
  }

  test("activeUsers equals the naive per-day distinct count") {
    import spark.implicits._
    val ev = EventStreamOps.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet").cache()
    val pairs = ev.select(col("user_id"),
      expr("unix_micros(ts) div 86400000000L").as("day")).distinct()
      .cache()
    val b = pairs.agg(min("day"), max("day")).collect().head
    val grid = (b.getLong(0) to b.getLong(1)).toDF("day")
    val naive = grid.crossJoin(pairs.withColumnRenamed("day", "aday"))
      .filter(col("aday").between(col("day") - 6, col("day")))
      .groupBy("day").agg(countDistinct("user_id").as("active_users"))
    val got = EventStreamOps.activeUsers(ev, windowDays = 7)
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    // hand case: users {1,2} on day 0, {1} on day 2; window 2 days
    val hand = Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 1L, 2L))
      .toDF("event_id", "user_id", "d")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("d") * 86400000000L + 5L).as("ts"))
    val h = EventStreamOps.activeUsers(hand, windowDays = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }

  test("interArrival bucketed plan equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = EventStreamOps.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet").cache()
    // reference: one lag window over each user's full history
    val d = ev.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("d", col("us") - lag(col("us"), 1).over(
        Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))))
    val want = d.groupBy("user_id")
      .agg(count(lit(1)).as("events"), count(col("d")).as("gaps"),
        min("d").as("min_gap_us"), max("d").as("max_gap_us"),
        sum("d").as("sum_gap_us"),
        expr("sum(d) div count(d)").as("mean_gap_us"))
      .filter(col("gaps") >= 1)
    // a 1-hour bucket forces MANY boundary chains on this fixture —
    // the decomposition must still be exact; default bucket too
    for (bucket <- Seq(3600000000L, 86400000000L)) {
      val got = EventStreamOps.interArrival(ev, bucketUs = bucket)
      assert(got.exceptAll(want).count() == 0, s"bucket=$bucket extra")
      assert(want.exceptAll(got).count() == 0, s"bucket=$bucket missing")
    }
    // hand case: gaps 10us, 20us with the bucket boundary between them
    import spark.implicits._
    val hand = Seq((1L, 100L), (2L, 110L), (3L, 130L)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(7L).as("user_id"))
    val h = EventStreamOps.interArrival(hand, bucketUs = 128L)
      .collect().head
    assert((h.getLong(1), h.getLong(2), h.getLong(3), h.getLong(4),
      h.getLong(5), h.getLong(6)) == ((3L, 2L, 10L, 20L, 30L, 15L)))
  }

  test("gapSessions equals the single-window formulation") {
    val ev = EventStreamOps.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet").cache()
    val cols = ev.columns.map(col) :+ col("__session")
    val want = EventStreamOps.gapSessionsNaive(ev, 1800)
      .select(cols: _*)
    // hour buckets force many boundary merges on this fixture; a
    // bucket SMALLER than the gap must also agree (the merge test
    // compares actual timestamps, not bucket adjacency)
    for (bucket <- Seq(3600L, 900L, 86400L)) {
      val got = EventStreamOps.gapSessions(ev, 1800, bucketSec = bucket)
        .select(cols: _*)
      assert(got.exceptAll(want).count() == 0, s"bucket=$bucket extra")
      assert(want.exceptAll(got).count() == 0, s"bucket=$bucket missing")
    }
    // hand case: one session spanning three hour-buckets (deltas at
    // exactly the gap — NOT a new session), then a gap one second
    // past the threshold opening session 2
    import spark.implicits._
    val hand = Seq(
      (1L, 0L), (2L, 1800L), (3L, 3600L), (4L, 5400L),
      (5L, 7201L)).toDF("event_id", "s")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(7L).as("user_id"))
    val h = EventStreamOps.gapSessions(hand, 1800)
      .select("event_id", "__session").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("gapSessions: per-user-only windows ride summary rows only") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val ev = EventStreamOps.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet")
    val plan = EventStreamOps.gapSessions(ev, 1800)
      .queryExecution.sparkPlan
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      if (w.partitionSpec.length < 2)
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }
          .nonEmpty,
          "a per-user-only window must sit above bucket SUMMARY " +
            "aggregates, never over raw events: " + w.toString.take(500))
    }
  }

  test("session windows close after the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreamOps.toMemorySink(
      sessionize(input.toDF(), gap = "10 minutes", lateness = "0 seconds"),
      "sessions", OutputMode.Append())
    // user 1: events at minute 0 and 5 (one session), then silence
    input.addData(event(1, 0, 1, "click", 1.0), event(2, 5, 1, "click", 2.0))
    q.processAllAvailable()
    // advance event time far beyond the gap so the session closes
    input.addData(event(3, 120, 2, "click", 9.0))
    q.processAllAvailable()
    input.addData(event(4, 240, 2, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions")
      .select("user_id", "events", "total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows.contains((1L, 2L, 3.0)))
  }

  test("mapGroupsWithState keeps running per-user totals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreamOps.toMemorySink(
      runningUserStats(input.toDS()).toDF(), "user_stats",
      OutputMode.Update())
    input.addData(event(1, 0, 7, "a", 1.0), event(2, 1, 7, "a", 2.0))
    q.processAllAvailable()
    input.addData(event(3, 2, 7, "a", 4.0))
    q.processAllAvailable()
    val last = spark.table("user_stats").filter(col("user_id") === 7)
      .orderBy(col("events").desc).limit(1)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).head
    q.stop()
    assert(last == ((3L, 7.0, 700L)))
  }

  test("parquet-sink stream commits the batch answer exactly once") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sink-spec").toString + "/run"
    val got = EventStreamOps.streamedToParquet(spark, path, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStreamOps.readEvents(spark, path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
    // a restart on the SAME checkpoint reprocesses nothing: re-running
    // the stream against the kept checkpoint leaves the table unchanged
    val q = EventStreamOps.streamFromParquet(spark, path)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .writeStream.format("parquet").option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val again = spark.read.parquet(s"$dir/data")
      .groupBy(col("event_type")).agg(count(lit(1)).as("events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == want.map(t => (t._1, t._2)))
  }

  test("streamedUserState final states equal the batch aggregate") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val got = EventStreamOps.streamedUserState(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStreamOps.readEvents(spark, path)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("file-source stream over the events table matches batch counts") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val stream = streamFromParquet(spark, path)
    assert(stream.isStreaming)
    val q = EventStreamOps.toMemorySink(
      stream.groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      "file_counts", OutputMode.Complete())
    q.processAllAvailable()
    val streamed = spark.table("file_counts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    q.stop()
    val batch = readEvents(spark, path).groupBy(col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("streamed stateful dedup equals batch distinct") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStreamOps.streamedDedup(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = readEvents(spark, path)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("funnel: earliest strict-after traversal, ties by ord, order matters") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes all three in order
      (1L, ts(10), 1L, "view"), (2L, ts(20), 1L, "click"),
      (3L, ts(30), 1L, "purchase"),
      // user 2 purchases BEFORE clicking: stage 3 must not count
      (4L, ts(10), 2L, "view"), (5L, ts(15), 2L, "purchase"),
      (6L, ts(20), 2L, "click"),
      // user 3: click at the SAME ts as the first view — larger
      // event_id wins the strict-after tie-break, funnel proceeds
      (7L, ts(10), 3L, "view"), (8L, ts(10), 3L, "click"),
      // user 4: click at same ts but SMALLER event_id — not after
      (10L, ts(10), 4L, "view"), (9L, ts(10), 4L, "click"),
      // user 5 never views: absent from the report
      (11L, ts(10), 5L, "click"), (12L, ts(20), 5L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // greedy earliest matching: user 2's click after the missed
    // purchase still counts stage 2 (funnel is per-stage earliest,
    // not contiguous) — and a purchase before the click never revives
    val s3 = funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(s3(2L).isEmpty && s3(1L).nonEmpty)
  }

  test("asofJoin picks the latest right row at-or-before, per key") {
    import spark.implicits._
    val left = Seq(
      (10L, ts(10), 1L), (11L, ts(30), 1L), (12L, ts(5), 2L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(10), 1L, 5.0),  // same-ts: inclusive match for id 10
      (101L, ts(20), 1L, 7.0),  // latest before id 11
      (102L, ts(40), 1L, 9.0),  // after everything — never matched
      (103L, ts(20), 2L, 3.0))  // after id 12 — user 2 unmatched
      .toDF("event_id", "ts", "user_id", "value")
    val out = asofJoin(left, right, "user_id", "ts", "event_id",
      leftCols = Seq("event_id"), payload = Seq("event_id", "value"),
      prefix = "m_")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set((10L, 100L), (11L, 101L), (12L, -1L)))
  }

  test("asofJoin equal-ts right rows: greatest ord wins") {
    import spark.implicits._
    val left = Seq((1L, ts(10), 1L)).toDF("event_id", "ts", "user_id")
    val right = Seq((7L, ts(10), 1L, 1.0), (9L, ts(10), 1L, 2.0),
      (8L, ts(10), 1L, 3.0)).toDF("event_id", "ts", "user_id", "value")
    val out = asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("event_id"), Seq("event_id"), "m_").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(9L))
  }

  test("asofJoinForward picks the earliest right row at-or-after") {
    import spark.implicits._
    val left = Seq(
      (10L, ts(10), 1L), (11L, ts(30), 1L), (12L, ts(50), 2L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(10), 1L, 5.0),  // same-ts: inclusive match for id 10
      (101L, ts(20), 1L, 7.0),  // before id 11 — skipped forward
      (102L, ts(40), 1L, 9.0),  // earliest after id 11
      (103L, ts(20), 2L, 3.0))  // before id 12 — user 2 unmatched
      .toDF("event_id", "ts", "user_id", "value")
    val out = EventStreamOps.asofJoinForward(left, right, "user_id",
        "ts", "event_id", leftCols = Seq("event_id"),
        payload = Seq("event_id", "value"), prefix = "n_")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set((10L, 100L), (11L, 102L), (12L, -1L)))
  }

  test("trailingWindow counts and cent-sums the trailing range") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 1L, 1.10), (2L, ts(20), 1L, 2.05),
      (3L, ts(40), 1L, 4.00), (4L, ts(0), 2L, 9.99))
      .toDF("event_id", "ts", "user_id", "value")
    val out = trailingWindow(ev, seconds = 1800) // 30 minutes
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // id 3's trailing 30 min includes id 2 but not id 1; note
    // 9.99*100 rounds to exactly 999.0 in double (floor 999, both
    // engines), while 2.05*100 = 204.999… floors to 204
    assert(out == Set((1L, 1L, 110L), (2L, 2L, 314L), (3L, 2L, 604L),
      (4L, 1L, 999L)))
  }

  test("streamed interval join equals the batch interval join") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStreamOps.streamedIntervalJoin(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = readEvents(spark, path)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 10 MINUTES"))
      .select("cid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed session windows equal batch gap-based sessions") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStreamOps.streamedSessions(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch model: lag-based session chaining on exact microseconds,
    // new session at diff >= gap (session_window's [start, last+gap)
    // convention)
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val ev = readEvents(spark, path)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("pus", lag(col("us"), 1).over(byUser))
      .withColumn("ns", when(col("pus").isNull ||
        col("us") - col("pus") >= 1800L * 1000000L, lit(1)).otherwise(lit(0)))
      .withColumn("sid", sum(col("ns")).over(byUser))
    val batch = ev.groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).cast("long").as("start"),
        count(lit(1)).as("events"))
      .select(col("start"), col("user_id"), col("events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-static enrichment equals the batch dimension join") {
    import spark.implicits._
    val path = "/root/testdata/sf0.001/events.parquet"
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").cast("long").as("user_id"),
        col("c_mktsegment").as("mktsegment"))
    val streamed = EventStreamOps.streamedEnrich(spark, path, dim)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val batch = readEvents(spark, path).join(dim, "user_id")
      .groupBy(col("mktsegment"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed == batch && streamed.nonEmpty)
    // inner-join semantics: users outside the dim contribute nothing
    val dimHalf = dim.filter(col("user_id") % 2 === 0)
    val total = EventStreamOps.streamedEnrich(spark, path, dimHalf)
      .agg(sum("events")).as[Long].head()
    val expected = readEvents(spark, path).join(dimHalf, "user_id").count()
    assert(total == expected)
  }

  test("throttled drain: >=3 metered micro-batches, equals batch agg") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft_throttle_spec").toString + "/shards"
    val streamed = EventStreamOps.streamedThrottled(spark, path, shardDir,
        shards = 4, minTriggers = 3)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val batch = readEvents(spark, path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed == batch && streamed.nonEmpty)
    // the throttle guard itself: demanding more data batches than
    // shards exist must fail loudly, not silently under-meter
    intercept[IllegalArgumentException] {
      EventStreamOps.streamedThrottled(spark, path, shardDir,
        shards = 2, minTriggers = 5)
    }
  }

  test("streamedFunnel equals the batch funnel; meters multiple batches") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-fnshards").toString
    val stages = Seq("view", "click", "purchase")
    val streamed = EventStreamOps.streamedFunnel(
      spark, path, shardDir, stages, shards = 4, minTriggers = 3)
    val batch = EventStreamOps.funnel(readEvents(spark, path), stages)
    // identical tables: same users, same stage times, same depth
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // an unmet trigger floor fails loudly (order test must not be
    // vacuously single-batch)
    intercept[IllegalArgumentException] {
      EventStreamOps.streamedFunnel(spark, path, shardDir, stages,
        shards = 2, minTriggers = 5)
    }
  }

  test("streamedPatterns equals the batch report; meters batches") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-spshards").toString
    val streamed = EventStreamOps.streamedPatterns(
      spark, path, shardDir, shards = 4, minTriggers = 3)
    val batch = EventStreamOps.sessionPatterns(readEvents(spark, path))
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // unmet trigger floor fails loudly (the in-order replay claim must
    // not be vacuously single-batch)
    intercept[IllegalArgumentException] {
      EventStreamOps.streamedPatterns(spark, path, shardDir,
        shards = 2, minTriggers = 5)
    }
  }

  test("streamedGapSessions equals batch gapSessions; meters batches") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-gsshards").toString
    val streamed = EventStreamOps.streamedGapSessions(
      spark, path, shardDir, gapSeconds = 1800, shards = 4,
      minTriggers = 3)
    val batch = EventStreamOps.gapSessions(
        readEvents(spark, path), gapSeconds = 1800)
      .groupBy(col("user_id"), col("__session").as("session_id"))
      .agg(count(lit(1)).as("events"))
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // a session must straddle micro-batches somewhere (else the
    // bounded-state cross-batch merge is vacuous): with 4 time-range
    // shards and 1800s sessions over a ~2-day log, at least one user's
    // session spans a shard boundary — proven indirectly by equality
    // plus the metered multi-batch drain; the trigger floor fails loud
    intercept[IllegalArgumentException] {
      EventStreamOps.streamedGapSessions(spark, path, shardDir,
        gapSeconds = 1800, shards = 2, minTriggers = 5)
    }
  }

  test("streamedAnomalies equals the batch anomaly report") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStreamOps.streamedAnomalies(spark, path, k = 3)
    val batch = EventStreamOps.anomalies(readEvents(spark, path), k = 3)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streamedValueHistogram equals the batch histogram") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStreamOps.streamedValueHistogram(spark, path)
    val batch = EventStreamOps.valueHistogram(readEvents(spark, path))
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("valueHistogram: cents bins, totals reconcile") {
    import spark.implicits._
    val ev = Seq(("t", 0.01), ("t", 4.99), ("t", 5.00), ("t", 12.34),
      ("u", 0.0)).toDF("event_type", "value")
    val out = EventStreamOps.valueHistogram(ev, widthCents = 500)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // cents 1, 499 -> bin 0; 500 -> bin 1; 1234 -> bin 2; 0 -> bin 0
    assert(out == Set(("t", 0L, 0L, 2L), ("t", 1L, 500L, 1L),
      ("t", 2L, 1000L, 1L), ("u", 0L, 0L, 1L)))
  }

  test("winsorizedStats: hand-checked clip bounds and capped counts") {
    import spark.implicits._
    // one type, cents 1..10 (values 0.01..0.10): p50 bound = 5, p90 = 9
    val ev = (1 to 10).map(i => ("t", i / 100.0)).toDF("event_type", "value")
    val out = EventStreamOps.winsorizedStats(ev, loPm = 500, hiPm = 900)
      .collect().head
    assert(out.getString(0) == "t")
    assert(out.getLong(1) == 10L)     // events
    assert(out.getLong(2) == 5L)      // lo = type-1 p50
    assert(out.getLong(3) == 9L)      // hi = type-1 p90
    // clipped: 5,5,5,5,5,6,7,8,9,9 -> 64
    assert(out.getLong(4) == 64L)
    assert(out.getLong(5) == 4L)      // 1..4 capped low
    assert(out.getLong(6) == 1L)      // 10 capped high
  }

  test("streamedCountMin equals the batch sketch chain") {
    val path = "/root/testdata/sf0.001/documents.parquet"
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-cmshards").toString
    val streamed = EventStreamOps.streamedCountMin(
      spark, path, shardDir, minTriggers = 3)
    val batch = graft.operators.CurationOps.countMinHeavyHitters(
      spark.read.parquet(path))
    // associative counter folds: the drained sketch estimates are
    // bit-identical to the batch build's
    assert(streamed.count() == 20)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    intercept[IllegalArgumentException] {
      EventStreamOps.streamedCountMin(spark, path, shardDir,
        minTriggers = 50)
    }
  }

  test("typeTransitions: hand-checked Markov counts") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
      (3L, ts(2), 1L, "view"), (4L, ts(3), 1L, "click"),
      (5L, ts(0), 2L, "view"), (6L, ts(1), 2L, "purchase"),
      (7L, ts(5), 3L, "click") // lone event: no transition
    ).toDF("event_id", "ts", "user_id", "event_type")
    val t = EventStreamOps.typeTransitions(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(t == Map(("view", "click") -> 2L, ("click", "view") -> 1L,
      ("view", "purchase") -> 1L))
    // transition mass = events minus one per user with >= 1 event
    assert(t.values.sum == 7 - 3)
  }

  test("anomalies: integer z-test flags the planted outlier only") {
    import spark.implicits._
    // type a: four 1.00s and one 10.00 — z²(1000) = 12.96e6 vs
    // denominator 3.24e6: outlier at k=1, NOT at k=3 (small n dilutes)
    val ev = Seq(
      (1L, "a", 1.00), (2L, "a", 1.00), (3L, "a", 1.00),
      (4L, "a", 1.00), (5L, "a", 10.00),
      // type b: constant values — zero variance, nothing flags
      (6L, "b", 2.00), (7L, "b", 2.00),
      // type c: singleton — excluded (n < 2)
      (8L, "c", 99.0)
    ).toDF("event_id", "event_type", "value")
    val k1 = EventStreamOps.anomalies(ev, k = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(k1.toSet == Set((5L, "a", 1000L)))
    assert(EventStreamOps.anomalies(ev, k = 3).count() == 0)
  }

  test("anomalies: flagged set is monotone in k") {
    val ev = readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val k2 = EventStreamOps.anomalies(ev, k = 2)
    val k3 = EventStreamOps.anomalies(ev, k = 3)
    assert(k3.count() <= k2.count())
    assert(k3.exceptAll(k2).count() == 0) // k=3 flags ⊆ k=2 flags
  }

  test("retentionCohorts: hand-checked triangle") {
    import spark.implicits._
    // day-long periods; epoch-anchored so period = days since epoch
    def at(day: Int, hour: Int) =
      new Timestamp((day * 86400L + hour * 3600L) * 1000L)
    val ev = Seq(
      (1L, at(10, 1), 1L), (2L, at(10, 5), 1L), // u1 cohort d10, active d10
      (3L, at(11, 0), 1L),                      // u1 active d11 (offset 1)
      (4L, at(10, 9), 2L),                      // u2 cohort d10
      (5L, at(12, 3), 2L),                      // u2 offset 2
      (6L, at(11, 8), 3L),                      // u3 cohort d11
      (7L, at(11, 9), 3L), (8L, at(13, 0), 3L)  // u3 offsets 0 and 2
    ).toDF("event_id", "ts", "user_id")
    val out = EventStreamOps.retentionCohorts(ev, periodSeconds = 86400)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(out == Map(
      (10L, 0L) -> 2L, (10L, 1L) -> 1L, (10L, 2L) -> 1L,
      (11L, 0L) -> 1L, (11L, 2L) -> 1L))
  }

  test("retentionCohorts: offset-0 cell equals the cohort's size") {
    val ev = readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val r = EventStreamOps.retentionCohorts(ev)
    // every user appears in their own cohort's offset-0 cell, so the
    // offset-0 column sums to the number of distinct users
    val zeroSum = r.filter(col("period_offset") === 0)
      .agg(sum(col("users"))).collect().head.getLong(0)
    assert(zeroSum == ev.select(col("user_id")).distinct().count())
    // offsets are never negative (first event defines the cohort)
    assert(r.filter(col("period_offset") < 0).count() == 0)
  }

  test("scd2States: LOCF intervals, same-day tie-break, singleton") {
    import spark.implicits._
    def at(day: Int, hour: Int) =
      new Timestamp((day * 86400L + hour * 3600L) * 1000L)
    val ev = Seq(
      // u1: day 10 has a then b (b is the day's last state); nothing
      // until day 13's a -> intervals (b, 10..12), (a, 13..13)
      (1L, at(10, 1), 1L, "a"), (2L, at(10, 2), 1L, "b"),
      (3L, at(13, 0), 1L, "a"),
      // u2: one event -> one single-day interval
      (4L, at(5, 0), 2L, "x"),
      // u3: identical ts, higher event_id wins the day
      (5L, at(7, 3), 3L, "p"), (6L, at(7, 3), 3L, "q")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStreamOps.scd2States(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(
      (1L, "b", 10L, 12L), (1L, "a", 13L, 13L),
      (2L, "x", 5L, 5L), (3L, "q", 7L, 7L)))
    // intervals tile each user's span without overlap
    val u1 = out.filter(_._1 == 1L).toSeq.sortBy(_._3)
    assert(u1.sliding(2).forall {
      case Seq(a, b) => a._4 + 1 == b._3
      case _ => true
    })
  }

  test("sessionPatterns: ordered pair support across gap sessions") {
    import spark.implicits._
    val ev = Seq(
      // u1 session 1: view@0, click@10, view@20
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "click"),
      (3L, ts(20), 1L, "view"),
      // u1 session 2 (gap > 30 min): view@60, purchase@70
      (4L, ts(60), 1L, "view"), (5L, ts(70), 1L, "purchase"),
      // u2 one session: click then view
      (6L, ts(0), 2L, "click"), (7L, ts(5), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStreamOps.sessionPatterns(ev, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // click->view supported by u1 s1 AND u2; the rest once each
    assert(out.toSeq == Seq(
      ("click", "view", 2L), ("view", "click", 1L),
      ("view", "purchase", 1L)))
    // support threshold prunes singleton patterns
    val thr = EventStreamOps.sessionPatterns(ev, minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(thr.toSeq == Seq(("click", "view")))
  }

  test("gapFill: LOCF grid with per-bucket last observation") {
    import spark.implicits._
    // hourly buckets; base epoch 1700000000s → bucket b0 = 472222
    // u1: two events in b0 (later one wins: 2.50), one in b0+3 (4.00)
    // u2: a single bucket — grid of size one, no fill
    val df = Seq(
      event(1, 0, 1, "a", 1.0), event(2, 2, 1, "a", 2.5),
      event(3, 185, 1, "a", 4.0), event(4, 65, 2, "a", 9.75)).toDF()
    val out = EventStreamOps.gapFill(df, periodSeconds = 3600)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getInt(3))))
      .toMap
    val b0 = 1700000000L / 3600
    assert(out == Map(
      (1L, b0) -> ((250L, 1)), (1L, b0 + 1) -> ((250L, 0)),
      (1L, b0 + 2) -> ((250L, 0)), (1L, b0 + 3) -> ((400L, 1)),
      (2L, b0 + 1) -> ((975L, 1))))
  }

  test("exactQuantiles: type-1 discrete quantile on a hand list") {
    import spark.implicits._
    // type "a": cents 100..1000 (n=10) → p500=500, p900=900, p990=1000
    // type "b": single value → every quantile is it
    val df = ((1 to 10).map(i =>
      event(i.toLong, i, 1, "a", i.toDouble)) :+
      event(11, 1, 2, "b", 42.0)).toDF()
    val out = EventStreamOps.exactQuantiles(df)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    assert(out == Map(
      ("a", 500) -> 500L, ("a", 900) -> 900L, ("a", 990) -> 1000L,
      ("b", 500) -> 4200L, ("b", 900) -> 4200L, ("b", 990) -> 4200L))
  }

  test("intervalJoin: half-open boundaries, multi-bucket periods") {
    import spark.implicits._
    val base = 1700000000L
    val ev = Seq(
      event(1, 0, 1, "a", 1.0),    // sec base+0
      event(2, 10, 1, "a", 2.0),   // base+600
      event(3, 30, 1, "a", 3.0),   // base+1800
      event(4, 60, 1, "a", 4.0))   // base+3600
      .toDF()
    // period 1 = [base, base+1800) — event 3 at the end bound excluded;
    // period 2 = [base+1800, base+3601) — spans many 600 s buckets
    val periods = Seq((1L, base, base + 1800L),
      (2L, base + 1800L, base + 3601L)).toDF("period_id", "s", "e")
      .select(col("period_id"), timestamp_seconds(col("s")).as("start_ts"),
        timestamp_seconds(col("e")).as("end_ts"))
    val out = EventStreamOps.intervalJoin(ev, periods, bucketSeconds = 600)
      .select(col("event_id"), col("period_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)))
  }

  test("sessionPaths: gap sessions, truncated heads, top-k order") {
    import spark.implicits._
    val ev = Seq(
      // u1 session 1: v>c>p ; session 2 (after 31 min gap): v>c>p
      event(1, 0, 1, "v", 0), event(2, 1, 1, "c", 0), event(3, 2, 1, "p", 0),
      event(4, 40, 1, "v", 0), event(5, 41, 1, "c", 0), event(6, 42, 1, "p", 0),
      // u2: 4 events, maxLen=3 truncates to v>v>v
      event(7, 0, 2, "v", 0), event(8, 1, 2, "v", 0), event(9, 2, 2, "v", 0),
      event(10, 3, 2, "x", 0)).toDF()
    val out = EventStreamOps.sessionPaths(ev, gapSeconds = 1800,
      maxLen = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("v>c>p", 2L), ("v>v>v", 1L)))
  }

  test("typeHourRollup: levels reconcile and gid bits are standard") {
    val ev = readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val rows = EventStreamOps.typeHourRollup(ev).collect()
      .map(r => ((r.getString(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val total = rows(("ALL", -1, 3))
    assert(total._1 == ev.count())
    // detail rows (gid 0) sum to the grand total on both aggregates
    val detail = rows.filter(_._1._3 == 0).values
    assert(detail.map(_._1).sum == total._1)
    assert(detail.map(_._2).sum == total._2)
    // per-type rows (gid 1) also reconcile
    val perType = rows.filter(_._1._3 == 1).values
    assert(perType.map(_._1).sum == total._1)
    assert(rows.keySet.map(_._3).subsetOf(Set(0, 1, 3)))
  }

  test("dailyTrend: hand-checked slopes, negative floor, single day") {
    import spark.implicits._
    // base ts is 22:13:20 UTC; UTC day boundaries fall at minute
    // 107 + 1440k. Type a: daily counts 1,2,3 -> slope exactly +1/day;
    // type b: 3,1 -> -2/day; type c: one day -> degenerate zeros
    val ev = Seq(
      event(1, 0, 1, "a", 0),
      event(2, 200, 1, "a", 0), event(3, 300, 1, "a", 0),
      event(4, 1600, 1, "a", 0), event(5, 1700, 1, "a", 0),
      event(6, 1800, 1, "a", 0),
      event(7, 0, 1, "b", 0), event(8, 10, 1, "b", 0),
      event(9, 20, 1, "b", 0), event(10, 200, 1, "b", 0),
      event(11, 50, 1, "c", 0)).toDF()
    val out = EventStreamOps.dailyTrend(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((3L, 6L, 6L, 1000L)))
    assert(out("b") == ((2L, -2L, 1L, -2000L)))
    assert(out("c") == ((1L, 0L, 0L, 0L)))
    // floor, not truncate, on a negative non-integral slope: counts
    // 3,1,1 on days 0,1,3 (a gap day) -> num=-8, den=14 ->
    // floor(-571.43)=-572 (truncation would say -571)
    val ev2 = Seq(
      event(1, 0, 1, "d", 0), event(2, 10, 1, "d", 0),
      event(3, 20, 1, "d", 0),
      event(4, 200, 1, "d", 0), event(5, 3000, 1, "d", 0)).toDF()
    val r2 = EventStreamOps.dailyTrend(ev2).collect().head
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) ==
      ((-8L, 14L, -572L)))
  }

  test("funnelConversion: exact delays, type-1 median, per stage pair") {
    import spark.implicits._
    val ev = Seq(
      event(1, 0, 1, "view", 0), event(2, 10, 1, "click", 0),
      event(3, 30, 1, "purchase", 0),
      event(4, 0, 2, "view", 0), event(5, 20, 2, "click", 0),
      event(6, 0, 3, "view", 0)).toDF()
    val out = EventStreamOps.funnelConversion(ev,
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val m = 60000000L // one minute in micros
    // stage 1 (view->click): delays 10min, 20min; median = 10min
    assert(out(1) == ((2L, 10 * m, 20 * m, 30 * m, 10 * m)))
    // stage 2 (click->purchase): one delay of 20min
    assert(out(2) == ((1L, 20 * m, 20 * m, 20 * m, 20 * m)))
  }

  test("changePoint: CUSUM peak at the shift boundary, ties earliest") {
    import spark.implicits._
    // type a: daily counts 1,1,5,5 -> dev |4C-12k| = 8,16,8,0 ->
    // peak at day 2 (the boundary before the level shift)
    val evA = Seq(
      event(1, 0, 1, "a", 0),
      event(2, 200, 1, "a", 0),
      event(3, 1600, 1, "a", 0), event(4, 1610, 1, "a", 0),
      event(5, 1620, 1, "a", 0), event(6, 1630, 1, "a", 0),
      event(7, 1640, 1, "a", 0),
      event(8, 3000, 1, "a", 0), event(9, 3010, 1, "a", 0),
      event(10, 3020, 1, "a", 0), event(11, 3030, 1, "a", 0),
      event(12, 3040, 1, "a", 0),
      // type b: constant 2,2 -> all deviations 0 -> earliest day wins
      event(13, 0, 1, "b", 0), event(14, 10, 1, "b", 0),
      event(15, 200, 1, "b", 0), event(16, 210, 1, "b", 0)).toDF()
    val out = EventStreamOps.changePoint(evA).collect()
      .map(r => r.getString(0) -> (r.getDate(1).toString, r.getLong(2)))
      .toMap
    // base ts is 2023-11-14T22:13:20 UTC; DateType is tz-free
    assert(out("a") == (("2023-11-15", 16L)))
    assert(out("b") == (("2023-11-14", 0L)))
  }

  test("typeDowCube: all four levels present and reconciling") {
    val ev = readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val rows = EventStreamOps.typeDowCube(ev).collect()
      .map(r => ((r.getString(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val total = rows(("ALL", -1, 3))
    assert(total._1 == ev.count())
    // CUBE has the (ALL, dow) level ROLLUP lacks — gid 2
    assert(rows.keySet.map(_._3) == Set(0, 1, 2, 3))
    for (g <- Seq(0, 1, 2)) {
      val lvl = rows.filter(_._1._3 == g).values
      assert(lvl.map(_._1).sum == total._1, s"gid $g events")
      assert(lvl.map(_._2).sum == total._2, s"gid $g cents")
    }
    // dow sentinel only on the rolled-up-dow levels
    assert(rows.keys.filter(k => k._3 == 0 || k._3 == 2)
      .forall(k => k._2 >= 1 && k._2 <= 7))
  }

  test("dailyTypePivot equals per-type groupBy; absent cells are 0") {
    val ev = readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val piv = EventStreamOps.dailyTypePivot(ev)
    val types = Seq("click", "error", "purchase", "signup", "view")
    assert(piv.columns.toSeq ==
      "day" +: types.flatMap(t => Seq(s"${t}_events", s"${t}_cents")))
    assert(piv.count() ==
      ev.select(to_date(col("ts"))).distinct().count())
    // cross-foot: each type's pivoted column sums to its groupBy total
    val colSums = piv.select(types.flatMap(t => Seq(
      sum(col(s"${t}_events")), sum(col(s"${t}_cents")))): _*)
      .collect()(0)
    val byType = ev
      .withColumn("__c", floor(col("value") * 100).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)), sum(col("__c")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for ((t, i) <- types.zipWithIndex) {
      assert(colSums.getLong(2 * i) == byType(t)._1, s"$t events")
      assert(colSums.getLong(2 * i + 1) == byType(t)._2, s"$t cents")
    }
    // no nulls anywhere — absent cells render as 0
    assert(piv.filter(types.map(t =>
      col(s"${t}_events").isNull || col(s"${t}_cents").isNull)
      .reduce(_ || _)).count() == 0)
  }
}
