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
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    q.stop()
    assert(last == ((3L, 7.0)))
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
}
