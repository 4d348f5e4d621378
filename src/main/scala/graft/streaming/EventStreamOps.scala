package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming operators over the `events` stream shape
 * (`event_id, ts, user_id, event_type, value`).
 *
 * The reference is a static-graph OLAP engine with no streaming surface
 * (SURVEY §2.9); this module is the forward-looking extension the
 * Spark-native rebuild gets for free: the same DataFrame operators run
 * incrementally under `readStream`/`writeStream`. Designs follow the
 * standard scale rules — event-time watermarks bound state, windowed
 * aggregation is partial-aggregated per micro-batch, and per-key custom
 * state lives in the state store (RocksDB at scale), never the driver.
 */
object EventStreamOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class UserStats(user_id: Long, events: Long, total: Double)

  /** Convert a nanosecond-epoch LONG `ts` to a proper timestamp. */
  private def fixTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case _ => df
    }

  /**
   * Batch-read an events parquet written with TIMESTAMP(NANOS) — Spark
   * rejects nano timestamps outright ([PARQUET_TYPE_ILLEGAL]) unless
   * they are read as longs (`spark.sql.legacy.parquet.nanosAsLong`) and
   * converted; micro precision is kept.
   */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fixTs(spark.read.parquet(path))
  }

  /** Same, as a file-source stream. The streaming source needs a
    * directory; a single-file path is turned into parent + glob. */
  def streamFromParquet(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(schema)
    val src =
      if (f.isFile) reader.option("pathGlobFilter", f.getName)
        .parquet(f.getParent)
      else reader.parquet(path)
    fixTs(src)
  }

  /**
   * Watermarked sliding-window counts/sums per event type. Late rows
   * beyond `lateness` are dropped and their state evicted — bounded
   * state at any scale.
   */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
                     slide: String = "30 minutes",
                     lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events"), col("total"))

  /**
   * Session aggregation with the native `session_window` (gap-based):
   * one row per (user, session) once the watermark closes the session.
   */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("events"), col("total"))

  /**
   * Custom keyed state via `mapGroupsWithState`: running per-user
   * totals, updated each micro-batch (Update mode). The pattern slot
   * for arbitrary stateful logic the built-in windows can't express.
   */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0))
          var n = prev.events
          var t = prev.total
          rows.foreach { e => n += 1; t += e.value }
          val next = UserStats(uid, n, t)
          state.update(next)
          next
      }
  }

  /** Update-mode sink helper used by tests and demos: stream into an
    * in-memory table. */
  def toMemorySink(df: DataFrame, name: String,
                   mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  private val runCounter = new java.util.concurrent.atomic.AtomicLong()

  /**
   * Execute a REAL incremental stream to completion and return the
   * result: file-source over the events parquet → tumbling-window
   * counts per event type → memory sink, drained with
   * `processAllAvailable`. The answer must equal the batch computation
   * of the same windows — that equivalence is what the correctness gate
   * checks against the SQL oracle (epoch-aligned tumbling windows, like
   * DuckDB's `time_bucket`). Window bounds are emitted as epoch seconds
   * so the comparison is timezone-free.
   */
  def streamedWindowCounts(spark: SparkSession, path: String,
                           window: String = "1 hour"): DataFrame = {
    val name = s"graft_stream_wc_${runCounter.incrementAndGet()}"
    val counts = streamFromParquet(spark, path)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("events"))
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /**
   * Incremental STATEFUL dedup: first occurrence of each
   * (user_id, event_type) pair wins, every later one is dropped inside
   * the micro-batch pipeline — the streaming face of the exact-dedup
   * operator. Only the key columns are emitted, so the result is the
   * distinct key set regardless of arrival order (batch-equivalent and
   * oracle-checkable). State is one entry per live key; at production
   * scale bound it with `dropDuplicatesWithinWatermark` once keys stop
   * recurring past the lateness horizon — the gate keeps the unbounded
   * variant because the batch oracle is global DISTINCT.
   */
  def streamedDedup(spark: SparkSession, path: String): DataFrame = {
    val name = s"graft_stream_dd_${runCounter.incrementAndGet()}"
    val distinctKeys = streamFromParquet(spark, path)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    val q = distinctKeys.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
