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

  /** `total` is the natural double sum for API users; `cents` is the
    * engine-stable integer rendering (`Σ floor(value·100)`) — float
    * sums depend on accumulation order across engines, so correctness
    * gates compare the cents. */
  final case class UserStats(user_id: Long, events: Long, total: Double,
                             cents: Long)

  /** SQL text for a sign-split FLOOR division of int64 `c` by positive
    * literal `d` — Spark's `div` truncates toward zero while DuckDB's
    * `//` floors, so any compared bin/day arithmetic whose domain COULD
    * go negative must spell floor semantics out on the Spark side (the
    * dailyTrend invariant; on nonnegative inputs this equals `div`). */
  private def floorDivExpr(c: String, d: Long): String =
    s"CASE WHEN ($c) >= 0L THEN ($c) div ${d}L " +
      s"ELSE -((-($c) + ${d - 1}L) div ${d}L) END"

  /** Normalize `ts` to a proper TIMESTAMP: nanosecond-epoch LONG
    * (TIMESTAMP(NANOS) parquet read via nanosAsLong) divides to micros;
    * TIMESTAMP_NTZ (plain `timestamp[us]` parquet) casts — a no-op on
    * the underlying micros under the UTC session timezone every main
    * and spec pins. Watermarks/windows require TIMESTAMP, not NTZ. */
  private def fixTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
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
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, 0L))
          var n = prev.events
          var t = prev.total
          var c = prev.cents
          rows.foreach { e =>
            n += 1; t += e.value; c += math.floor(e.value * 100).toLong
          }
          val next = UserStats(uid, n, t, c)
          state.update(next)
          next
      }
  }

  /**
   * REAL incremental custom-state gate: file source → `runningUserStats`
   * (`mapGroupsWithState`, Update mode) → memory sink, drained to
   * completion. The sink holds one row per user PER update; the final
   * state per user is recovered by taking the row with the highest
   * event count (the count is strictly increasing per user, so the max
   * is the last update — no reliance on sink row order). The final
   * states must equal the batch per-user aggregate, which is what the
   * SQL oracle checks (on the integer-cents rendering; see
   * [[UserStats]]).
   */
  def streamedUserState(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_stream_us_${runCounter.incrementAndGet()}"
    val updates = runningUserStats(
      streamFromParquet(spark, path).as[Event]).toDF()
    withStatePartitions(spark, 8) {
      val q = updates.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("events"), col("cents"))).as("__s"))
      .select(col("user_id"), col("__s.events").as("events"),
        col("__s.cents").as("cents"))
  }

  /**
   * Point-in-time (as-of) join: for every left row, the LATEST right
   * row with the same key and `ts` at-or-before the left row's.
   * The training-pipeline feature join — "the user's last purchase as
   * of this click".
   *
   * Implemented as union + one per-key ordered window instead of a
   * per-row range join: both sides are tagged, unioned, and a single
   * `last(..., ignoreNulls)` running window per key carries the most
   * recent right payload forward into each left row. One shuffle on
   * the key, sort within partitions — at 100 TB this scales like any
   * keyed window (AQE/salting for hot keys), where a range join would
   * be a per-row probe. Ties: right rows sort before left rows at the
   * same `ts` (at-or-before is inclusive), and among equal-`ts` right
   * rows the greatest `ordCol` wins — fully deterministic.
   *
   * Left rows keep `leftCols`; the matched right row contributes
   * `payload` columns renamed with `prefix`. Unmatched left rows keep
   * nulls (left-outer as-of semantics).
   */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, ordCol: String,
               leftCols: Seq[String], payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val side = "__side"
    val ord = "__ord"
    val lRows = left.select(
      (col(keyCol) +: col(tsCol) +: lit(1).as(side) +: col(ordCol).as(ord) +:
        (leftCols.map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType)
            .as(s"$prefix$p")))): _*)
    val rRows = right.select(
      (col(keyCol) +: col(tsCol) +: lit(0).as(side) +: col(ordCol).as(ord) +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(p => col(p).as(s"$prefix$p")))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(side).asc, col(ord).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lRows.unionByName(rRows)) { (df, p) =>
      df.withColumn(s"$prefix$p", last(col(s"$prefix$p"), ignoreNulls = true)
        .over(w))
    }
    carried.filter(col(side) === 1)
      .select((col(keyCol) +: leftCols.map(col)) ++
        payload.map(p => col(s"$prefix$p")): _*)
  }

  /**
   * FORWARD as-of join — the time-mirror of [[asofJoin]]: each left
   * row annotated with the same key's EARLIEST right row at-or-after
   * it (next-event semantics: click → next purchase, the
   * conversion-lag / time-to-event query). Same union + keyed-window
   * decomposition (one shuffle on the key, never a per-row range
   * join): `first(ignoreNulls)` over currentRow → unboundedFollowing,
   * with left rows ordered BEFORE right rows at equal timestamps so a
   * same-instant right row counts as "after" (mirroring the backward
   * face's at-or-before inclusion).
   */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      keyCol: String, tsCol: String, ordCol: String,
                      leftCols: Seq[String], payload: Seq[String],
                      prefix: String = "next_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val side = "__side"
    val ord = "__ord"
    val lRows = left.select(
      (col(keyCol) +: col(tsCol) +: lit(0).as(side) +: col(ordCol).as(ord) +:
        (leftCols.map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType)
            .as(s"$prefix$p")))): _*)
    val rRows = right.select(
      (col(keyCol) +: col(tsCol) +: lit(1).as(side) +: col(ordCol).as(ord) +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(p => col(p).as(s"$prefix$p")))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(side).asc, col(ord).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(lRows.unionByName(rRows)) { (df, p) =>
      df.withColumn(s"$prefix$p",
        first(col(s"$prefix$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col(side) === 0)
      .select((col(keyCol) +: leftCols.map(col)) ++
        payload.map(p => col(s"$prefix$p")): _*)
  }

  /**
   * REAL incremental count-min sketch: the
   * [[graft.operators.CurationOps.countMinHeavyHitters]] chain with
   * the sketch counters maintained ACROSS micro-batches by a streaming
   * aggregation — the state store holds exactly `depth·width` int64
   * cells regardless of stream length or vocabulary (the defining
   * property of the sketch: counter addition is associative, so
   * per-batch partials fold into state losslessly and the drained
   * sketch is bit-identical to the batch build). A second,
   * vocab-bounded exact-count stream exists ONLY as the gate's
   * verification harness (exactly as in the batch op) — production
   * reads estimates straight from the constant-size sketch. Shares
   * the batch gate's oracle verbatim. Throws if the drain ran fewer
   * than `minTriggers` data batches.
   */
  def streamedCountMin(spark: SparkSession, docsPath: String,
                       shardDir: String, depth: Int = 4,
                       width: Int = 1024, topK: Int = 20,
                       minTriggers: Int = 3): DataFrame = {
    val tag = runCounter.incrementAndGet()
    val (skTbl, exTbl) = (s"graft_cms_sk_$tag", s"graft_cms_ex_$tag")
    spark.read.parquet(docsPath).repartition(4)
      .write.mode("overwrite").parquet(shardDir)
    val schema = spark.read.parquet(shardDir).schema
    def terms() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(shardDir)
      .select(explode(split(trim(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // sketch stream: constant depth×width state
    val cells = terms()
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("term"))
      .withColumn("cell", graft.operators.CurationOps.cmCellExpr(width))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("__scnt"))
    // exact stream: the verification harness (vocab-bounded)
    val exact = terms().groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
    withStatePartitions(spark, 8) {
      for ((df, tbl) <- Seq(cells -> skTbl, exact -> exTbl)) {
        val q = toMemorySink(df, tbl, OutputMode.Complete())
        try {
          q.processAllAvailable()
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches >= minTriggers,
            s"count-min drain ran $dataBatches data batches; " +
            s"expected >= $minTriggers")
        } finally q.stop()
      }
    }
    val top = spark.table(exTbl)
      .orderBy(col("cnt").desc, col("term")).limit(topK)
    top.select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("term"), col("cnt"))
      .withColumn("cell", graft.operators.CurationOps.cmCellExpr(width))
      .join(spark.table(skTbl), Seq("j", "cell"))
      .groupBy(col("term"))
      .agg(max(col("cnt")).as("exact_cnt"), min(col("__scnt")).as("est_cnt"))
      .select(col("term"), col("exact_cnt"), col("est_cnt"))
  }

  /**
   * First-order behavioral transition counts (the Markov-chain view of
   * an event log): corpus-wide counts of consecutive
   * `(prev_type → next_type)` steps within each user's (ts, event_id)-
   * ordered stream — session-flow diagnostics, next-event baselines,
   * and funnel-design input. Per-user `lag` window (the
   * events_sessions precedent — per-user history is the natural sort
   * unit; a pathological mega-user is AQE skew territory), then one
   * partial-aggregable count over a #types²-bounded key space.
   */
  def typeTransitions(events: DataFrame,
                      keyCol: String = "user_id",
                      typeCol: String = "event_type"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("transitions"))
  }

  /**
   * Daily top-`k` leaderboard: per day, the k most-active users by
   * event count (ties by user id) — the trending/abuse-monitoring
   * report. Two partial-aggregable passes and nothing else: (day,
   * user) counts combine map-side, then the bounded
   * [[graft.operators.SimilarityOps.boundedTopK]] cut keeps ≤k users
   * per day per map task — a hot DAY (launch spike) never sorts its
   * full user list in one task, the exact hazard a
   * `row_number().over(partitionBy(day))` window would plant.
   * Output: `(day, user_id, events, rank)`.
   */
  def dailyTopUsers(events: DataFrame, k: Int = 3,
                    keyCol: String = "user_id"): DataFrame = {
    val daily = events.select(
        expr(floorDivExpr("unix_micros(ts)", 86400000000L)).as("day"),
        col(keyCol))
      .groupBy(col("day"), col(keyCol))
      .agg(count(lit(1)).as("events"))
    graft.operators.SimilarityOps.boundedTopK(daily, "day", keyCol,
        "events", k, descending = true)
      .select(col("day"), col(keyCol),
        col("events").cast("long").as("events"), col("rank"))
  }

  /**
   * Fixed-width value histogram per event type — the
   * distribution-monitoring report (drift dashboards, alert
   * baselining) on the integer-cents rendering every value gate
   * shares (`floor(value·100)`, the [[exactQuantiles]] substrate).
   * Bin id = floor(cents / `widthCents`) via an explicit sign-split
   * floor division — engine-identical on ANY value domain (DuckDB's
   * `//` floors while Spark's `div` truncates toward zero, so a
   * signed domain would silently diverge under plain `div`; on
   * nonnegative cents the two agree). One partial-aggregable group-by:
   * map-side combine bounds a hot type's contribution to the bin
   * vocabulary, never its event count.
   * Output: `(event_type, bin, lo_cents, n)`.
   */
  def valueHistogram(events: DataFrame,
                     widthCents: Long = 500): DataFrame = {
    require(widthCents > 0, s"widthCents must be positive, got $widthCents")
    events.select(col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("__c"))
      .withColumn("bin", expr(floorDivExpr("__c", widthCents)))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_cents", col("bin") * widthCents)
      .select(col("event_type"), col("bin"), col("lo_cents"), col("n"))
  }

  /**
   * Statistical outlier detection on the integer-cents rendering of
   * `value`, grouped by event type: an event is anomalous when its
   * squared z-score exceeds `k²` against its type's population
   * moments. The test is evaluated in EXACT integer arithmetic —
   * `(n·x − sum)² > k²·(n·sumsq − sum²)` is the z² > k² inequality
   * multiplied through by `n²·σ²`-denominators, so no float (or
   * square root) ever appears and the boundary cases are
   * engine-identical (Spark DECIMAL(38,0) == DuckDB HUGEINT, both
   * exact). This is the monitoring primitive for value-distribution
   * drift in an event pipeline.
   *
   * Scale shape: per-type moments are one partial-aggregable pass
   * (3 int64s per type); the verdict join broadcasts the tiny moments
   * table back onto the stream — no window, no self-join. Emits only
   * the flagged rows: `(event_id, event_type, cents)`.
   */
  def anomalies(events: DataFrame, k: Int = 3,
                typeCol: String = "event_type"): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    val base = events.select(col("event_id"), col(typeCol), cents.as("cents"))
    val moments = base.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents") * col("cents")).as("sq"))
    anomalyFlag(base, moments, k, typeCol)
  }

  /** The z²>k² flag over precomputed per-type int64 moments — shared
    * by the batch face and [[streamedAnomalies]]' drained moments. */
  private def anomalyFlag(base: DataFrame, moments: DataFrame, k: Int,
                          typeCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast(dec)
    base.join(broadcast(moments), typeCol)
      .filter(col("n") >= 2 &&
        (d(col("n")) * col("cents") - col("s")) *
          (d(col("n")) * col("cents") - col("s")) >
        lit(k.toLong * k) * (d(col("n")) * col("sq") -
          d(col("s")) * col("s")))
      .select(col("event_id"), col(typeCol), col("cents"))
  }

  /**
   * REAL incremental anomaly detection — the streamed twin of
   * [[anomalies]]: the per-type integer moments (n, Σcents, Σcents²)
   * fold across micro-batches in a streaming aggregation whose state
   * is EXACTLY three int64 scalars per type regardless of stream
   * length; int64 addition is associative, so the drained moments are
   * bit-identical to the batch build and the z²>k² flag over them
   * reproduces the batch report verbatim (the gate shares the
   * `events_anomaly` oracle). The flagged-event scan itself is the
   * batch side — at scale it runs wherever the events land, against
   * moments the stream maintained for free.
   */
  def streamedAnomalies(spark: SparkSession, path: String, k: Int = 3,
                        typeCol: String = "event_type"): DataFrame = {
    val name = s"graft_stream_an_${runCounter.incrementAndGet()}"
    val moments = streamFromParquet(spark, path)
      .select(col(typeCol),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents") * col("cents")).as("sq"))
    withStatePartitions(spark, 8) {
      val q = moments.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val base = readEvents(spark, path).select(col("event_id"),
      col(typeCol), floor(col("value") * 100).cast("long").as("cents"))
    anomalyFlag(base, spark.table(name), k, typeCol)
  }

  /**
   * Trailing event-time range aggregate per key: for each event, the
   * count and integer-cent sum of `value` over the trailing `seconds`
   * window (inclusive of the current row's second). A RANGE window on
   * floored epoch seconds — per-key sort, no self-join; the
   * integer-cent sum (`floor(value*100)`) keeps the result exact and
   * engine-independent where a float sum's accumulation order is not.
   */
  def trailingWindow(events: DataFrame, seconds: Long,
                     keyCol: String = "user_id",
                     valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sec = "__sec"
    val w = Window.partitionBy(col(keyCol)).orderBy(col(sec))
      .rangeBetween(-seconds, 0)
    events
      .withColumn(sec, floor(col("ts").cast("double")).cast("long"))
      .withColumn("trailing_events", count(lit(1)).over(w))
      .withColumn("trailing_cents",
        sum(floor(col(valueCol) * 100).cast("long")).over(w))
      .select(col("event_id"), col(keyCol),
        col("trailing_events"), col("trailing_cents"))
  }

  /**
   * Time-grid gap fill with last-observation-carried-forward (the
   * feature-store / time-series resampling primitive): each user's
   * event stream is bucketed onto a fixed `periodSeconds` grid from
   * the user's first to last active bucket, empty buckets are
   * materialized, and the last observed integer-cent value carries
   * forward into them. "Last observed in a bucket" is the event with
   * the greatest `(ts, event_id)` — a partial-aggregable
   * `max(struct)`, never a per-bucket window over raw events, so a
   * bucket with millions of events combines map-side. The grid itself
   * comes from one `sequence` + `explode` off per-user min/max
   * buckets, and the only window is the LOCF scan over GRID rows —
   * bounded by calendar span / period, not by event volume.
   * Output: `(user_id, bucket, cents, observed)` — `bucket` is the
   * epoch-second floor-division index, `observed` 1 where the bucket
   * had events.
   */
  def gapFill(events: DataFrame, periodSeconds: Long = 3600,
              keyCol: String = "user_id",
              valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = events
      .withColumn("__sec", col("ts").cast("long"))
      .withColumn("bucket", expr(s"__sec div ${periodSeconds}L"))
      .withColumn("__cents", floor(col(valueCol) * 100).cast("long"))
    val observed = bucketed
      .groupBy(col(keyCol), col("bucket"))
      .agg(max(struct(col("ts"), col("event_id"), col("__cents")))
        .as("__last"))
      .select(col(keyCol), col("bucket"),
        col("__last.__cents").as("__obs"))
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, "bucket"), "left")
      .withColumn("cents", last(col("__obs"), ignoreNulls = true).over(w))
      .withColumn("observed",
        when(col("__obs").isNotNull, 1).otherwise(0))
      .select(col(keyCol), col("bucket"), col("cents"), col("observed"))
  }

  /**
   * SCD type-2 dimension build from the event log: per-user validity
   * INTERVALS of the user's current state (the type of their latest
   * event), at daily grain — the slowly-changing-dimension shape a
   * warehouse keeps so `asofJoin`-style point-in-time questions become
   * plain range lookups. Composition: per-(user, day) last event (a
   * partial-aggregable `max(struct)` — never a per-user event-history
   * window), the per-user day grid (the [[gapFill]] move), LOCF over
   * GRID rows, then island collapse — adjacent equal-state days merge
   * into one `(state, valid_from, valid_to)` interval via a
   * change-flag running sum. Every window runs over calendar-bounded
   * grid rows (users × observed day span), never event-volume rows;
   * day ids are integer epoch-second divisions (engine-exact).
   * Output: `(user_id, state, valid_from, valid_to)` — inclusive day
   * indices; intervals partition the user's observed span.
   */
  def scd2States(events: DataFrame, keyCol: String = "user_id",
                 stateCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = events.select(col(keyCol),
      expr("unix_micros(ts) div 86400000000").as("day"),
      col("ts"), col("event_id"), col(stateCol).as("__st"))
    val observed = bucketed.groupBy(col(keyCol), col("day"))
      .agg(max(struct(col("ts"), col("event_id"), col("__st")))
        .as("__last"))
      .select(col(keyCol), col("day"), col("__last.__st").as("__obs"))
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val run = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    grid.join(observed, Seq(keyCol, "day"), "left")
      .withColumn("state", last(col("__obs"), ignoreNulls = true).over(run))
      .withColumn("__chg",
        when(lag(col("state"), 1).over(ord).isNull ||
          lag(col("state"), 1).over(ord) =!= col("state"), lit(1))
          .otherwise(lit(0)))
      .withColumn("__run", sum(col("__chg")).over(run))
      .groupBy(col(keyCol), col("__run"), col("state"))
      .agg(min(col("day")).as("valid_from"),
        max(col("day")).as("valid_to"))
      .select(col(keyCol), col("state"), col("valid_from"),
        col("valid_to"))
  }

  /**
   * Hot-user-proof gap sessionization: appends a per-user session id
   * (`__session`, 1-based in time order — a new session starts when
   * the gap since the previous event exceeds `gapSeconds`, measured on
   * truncated epoch SECONDS like every gap gate) WITHOUT an unbounded
   * per-user window. The naive `lag().over(partitionBy(user))` drags a
   * bot account's entire history through one task's sort — at crawl
   * scale the 10⁹-event machine account is exactly the row you must
   * not serialize on. Same decomposition as [[interArrival]]:
   *
   *  1. per-(user, `bucketSec` time-bucket) windows assign LOCAL
   *     session indexes — task size bounded by bucket occupancy,
   *     never account age;
   *  2. a second window over per-bucket SUMMARY rows (one row per
   *     active (user, bucket) — calendar-bounded) merges each
   *     bucket's first local session into the previous bucket's last
   *     iff the boundary delta ≤ gap, and prefix-sums the per-bucket
   *     session-start counts into global bases;
   *  3. one co-partitioned equi-join stamps `base + local − merged`
   *     back onto the events.
   *
   * The merge test compares ACTUAL boundary timestamps, so the result
   * equals the single-window formulation for ANY bucket size (a
   * session spanning k buckets merges k−1 times; a quiet bucket in
   * between can never satisfy the gap test when `bucketSec ≥
   * gapSeconds`, and is handled by the timestamp comparison even when
   * it isn't). EventStreamSpec pins equality against the naive
   * formulation; the plan guard pins that the only per-user-only
   * window rides aggregate summary rows.
   */
  def gapSessions(events: DataFrame, gapSeconds: Long,
                  keyCol: String = "user_id",
                  bucketSec: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("__s", col("ts").cast("long"))
      .withColumn("__bkt", expr(s"__s div ${bucketSec}L"))
    val wb = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col("__us"), col("event_id"))
    val local = base
      .withColumn("__d", col("__s") - lag(col("__s"), 1).over(wb))
      .withColumn("__new",
        when(col("__d").isNull || col("__d") > gapSeconds, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__ls", sum(col("__new")).over(wb))
    val summary = local.groupBy(col(keyCol), col("__bkt"))
      .agg(max(col("__ls")).as("__nls"), min(col("__s")).as("__first"),
        max(col("__s")).as("__last"))
    val wu = Window.partitionBy(col(keyCol)).orderBy(col("__bkt"))
    val chained = summary
      .withColumn("__mp",
        when(col("__first") - lag(col("__last"), 1).over(wu) <=
          gapSeconds, lit(1L)).otherwise(lit(0L)))
      .withColumn("__base", coalesce(
        sum(col("__nls") - col("__mp"))
          .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("__bkt"), col("__mp"), col("__base"))
    local.join(chained, Seq(keyCol, "__bkt"))
      .withColumn("__session",
        col("__base") + col("__ls") - col("__mp"))
      .drop("__us", "__s", "__bkt", "__d", "__new", "__ls", "__mp",
        "__base")
  }

  /** The single-window formulation [[gapSessions]] replaces — kept
    * (test-only) as the equality reference: correct, but a hot user's
    * whole history sorts in one task. */
  private[graft] def gapSessionsNaive(events: DataFrame,
                                          gapSeconds: Long,
                                          keyCol: String = "user_id")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(keyCol))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("ts").cast("long") - col("__prev").cast("long") >
            gapSeconds, lit(1L)).otherwise(lit(0L)))
      .withColumn("__session", sum(col("__new")).over(byUser))
      .drop("__prev", "__new")
  }

  /**
   * Sequential-pattern support over gap-based sessions (PrefixSpan's
   * level-2 output — the "what do users do next" report): for every
   * ORDERED event-type pair (a, b), the number of sessions containing
   * some `a` event strictly before some `b` event. A session supports
   * (a, b) iff `min_ts(a) < max_ts(b)` within it, so the whole test
   * runs on the per-(session, type) min/max timestamps — a
   * partial-aggregable projection bounded by sessions × type
   * vocabulary, never by event volume. The pair join is one
   * (user, session) equi-join of that bounded projection against
   * itself; session assignment is the library's standard gap
   * sessionization (the `events_sessions` shape). Top-k collapses to
   * TakeOrderedAndProject.
   * Output: `(from_type, to_type, support)`.
   */
  def sessionPatterns(events: DataFrame, gapSeconds: Long = 1800,
                      minSupport: Long = 2, topK: Int = 20,
                      keyCol: String = "user_id",
                      typeCol: String = "event_type"): DataFrame = {
    val gapped = gapSessions(events, gapSeconds, keyCol)
      .withColumn("__sess", col("__session"))
    val typed = gapped
      .groupBy(col(keyCol), col("__sess"), col(typeCol).as("__ty"))
      .agg(min(col("ts")).as("__t0"), max(col("ts")).as("__t1"))
    val a = typed.select(col(keyCol), col("__sess"),
      col("__ty").as("from_type"), col("__t0"))
    val b = typed.select(col(keyCol), col("__sess"),
      col("__ty").as("to_type"), col("__t1"))
    a.join(b, Seq(keyCol, "__sess"))
      .filter(col("from_type") =!= col("to_type") &&
        col("__t0") < col("__t1"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("from_type"), col("to_type"))
      .limit(topK)
  }

  /**
   * Rolling distinct active users (DAU/WAU/MAU): for every day in the
   * observed range, the EXACT count of distinct users with ≥1 event in
   * the trailing `windowDays` window.
   *
   * Scale shape: exact sliding distinct is the classic trap — a
   * per-day window over user sets re-counts the whole window per day.
   * Instead: dedup to (user, active-day) pairs once (one partial-agg
   * shuffle), fan each pair out to the ≤`windowDays` window-end days
   * it supports, dedup again (a user active 5× inside one window
   * counts once), count per day. Shuffle volume is bounded by
   * `windowDays ×` the DISTINCT pair count — independent of raw event
   * volume, no per-user or per-day history window anywhere. Day ids
   * are integer epoch-micro divisions (engine-exact).
   * Output: `(day, active_users)` for days inside the observed range.
   */
  def activeUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val dayUs = 86400000000L
    val pairs = events.select(col("user_id"),
      expr(s"unix_micros(ts) div ${dayUs}L").as("__day")).distinct()
    val bounds = pairs.agg(min(col("__day")).as("__d0"),
      max(col("__day")).as("__d1"))
    val support = pairs.select(col("user_id"),
      explode(sequence(col("__day"), col("__day") + (windowDays - 1)))
        .as("day")).distinct()
    support.crossJoin(broadcast(bounds))
      .filter(col("day").between(col("__d0"), col("__d1")))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_users"))
  }

  /**
   * Per-user inter-arrival gap statistics — the bot/scraper signal
   * (machine traffic arrives on a metronome: tiny min gap, tiny
   * spread; humans are bursty). All int64 epoch-micros; `mean_gap_us`
   * is one final floor division.
   *
   * Scale shape: adjacency needs an order, but a naive
   * `lag().over(partitionBy(user))` drags a hot user's entire history
   * through one task's sort. Gaps of a sorted multiset are invariant
   * to tiebreak order, and they decompose by time ranges: deltas
   * WITHIN a bucket + the boundary delta between consecutive buckets'
   * last/first. So: one window per (user, time-bucket) — task size
   * bounded by bucket occupancy, never account age — then a second
   * window over per-bucket SUMMARY rows (calendar-bounded, the
   * compressed-window-input move of [[exactQuantiles]]) chains the
   * boundaries. Identical output to the single-window formulation,
   * which is what the oracle runs.
   * Output: `(user_id, events, gaps, min_gap_us, max_gap_us,
   * sum_gap_us, mean_gap_us)` for users with ≥2 events.
   */
  def interArrival(events: DataFrame,
                   bucketUs: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val big = Long.MaxValue
    val base = events.select(col("user_id"),
      unix_micros(col("ts")).as("__us"), col("event_id"))
      .withColumn("__b", expr(s"__us div ${bucketUs}L"))
    val wb = Window.partitionBy(col("user_id"), col("__b"))
      .orderBy(col("__us"), col("event_id"))
    val perBucket = base
      .withColumn("__d", col("__us") - lag(col("__us"), 1).over(wb))
      .groupBy(col("user_id"), col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__d")).as("__dsum"),
        min(col("__d")).as("__dmin"), max(col("__d")).as("__dmax"),
        min(col("__us")).as("__first"), max(col("__us")).as("__last"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("__b"))
    val chained = perBucket
      .withColumn("__bgap", col("__first") - lag(col("__last"), 1).over(wu))
    chained.groupBy(col("user_id"))
      .agg(sum(col("__n")).as("events"),
        (sum(col("__n")) - 1).as("gaps"),
        // null-proof min/max: park empty sides at the identity and
        // strip it after (least/greatest null semantics differ by
        // engine — never rely on them in compared outputs)
        min(least(coalesce(col("__dmin"), lit(big)),
          coalesce(col("__bgap"), lit(big)))).as("__min"),
        max(greatest(coalesce(col("__dmax"), lit(-1L)),
          coalesce(col("__bgap"), lit(-1L)))).as("__max"),
        (coalesce(sum(col("__dsum")), lit(0L)) +
          coalesce(sum(col("__bgap")), lit(0L))).as("sum_gap_us"))
      .filter(col("gaps") >= 1)
      .select(col("user_id"), col("events"), col("gaps"),
        col("__min").as("min_gap_us"), col("__max").as("max_gap_us"),
        col("sum_gap_us"),
        expr("sum_gap_us div gaps").as("mean_gap_us"))
  }

  /**
   * EXACT per-group quantiles by value compression — the scale-correct
   * alternative to both a full per-group sort (hot-group single task)
   * and an approximate sketch (engine-seeded, not oracle-checkable):
   * counts collapse to one row per DISTINCT integer-cent value
   * (partial-aggregable), the cumulative scan then runs over the
   * VALUE DOMAIN (bounded by price granularity, not event volume),
   * and quantile `p‰` is the smallest value whose cumulative count
   * reaches `⌈p·n/1000⌉` — tested as `cum·1000 ≥ p·n`, pure int64.
   * This is the textbook discrete (type-1) quantile, so any engine
   * reproduces it bit-for-bit.
   * Output: `(event_type, p_pm, q_cents)` for each requested
   * per-mille point.
   */
  def exactQuantiles(events: DataFrame,
                     psPerMille: Seq[Int] = Seq(500, 900, 990),
                     typeCol: String = "event_type",
                     valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val counts = events
      .select(col(typeCol), floor(col(valueCol) * 100).cast("long")
        .as("cents"))
      .groupBy(col(typeCol), col("cents"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(typeCol))))
    cum.crossJoin(broadcast(psPerMille.toDF("p_pm")))
      .filter(col("__cum") * 1000 >= col("p_pm") * col("__n"))
      .groupBy(col(typeCol), col("p_pm"))
      .agg(min(col("cents")).as("q_cents"))
  }

  /**
   * Winsorized per-type value statistics — the robust-scaling /
   * outlier-capping report every feature pipeline runs before
   * normalization: values are clipped to the type's exact
   * [`loPm`, `hiPm`] per-mille quantiles (type-1, from
   * [[exactQuantiles]]' value-compressed substrate — never a
   * per-type sort over events) and the clipped integer-cent moments
   * reported alongside the clip bounds and how many rows each side
   * capped. Pure int64 — oracle-exact.
   *
   * Scale shape: the quantile table is per-(type, bound) — broadcast
   * back onto the stream; one partial-aggregable pass computes every
   * output column.
   */
  def winsorizedStats(events: DataFrame, loPm: Int = 10,
                      hiPm: Int = 990,
                      typeCol: String = "event_type",
                      valueCol: String = "value"): DataFrame = {
    require(loPm >= 0 && hiPm <= 1000 && loPm < hiPm,
      s"need 0 <= loPm < hiPm <= 1000, got $loPm/$hiPm")
    val qs = exactQuantiles(events, Seq(loPm, hiPm), typeCol, valueCol)
      .groupBy(col(typeCol))
      .agg(min(when(col("p_pm") === loPm, col("q_cents"))).as("__lo"),
        min(when(col("p_pm") === hiPm, col("q_cents"))).as("__hi"))
    events
      .select(col(typeCol),
        floor(col(valueCol) * 100).cast("long").as("__cents"))
      .join(broadcast(qs), Seq(typeCol))
      .withColumn("__clip",
        greatest(col("__lo"), least(col("__hi"), col("__cents"))))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("events"),
        min(col("__lo")).as("lo_cents"),
        min(col("__hi")).as("hi_cents"),
        sum(col("__clip")).as("clipped_cents_sum"),
        sum(when(col("__cents") < col("__lo"), 1L).otherwise(0L))
          .as("capped_low"),
        sum(when(col("__cents") > col("__hi"), 1L).otherwise(0L))
          .as("capped_high"))
  }

  /**
   * Batch interval join via bucketization — "which events fall inside
   * which validity periods" (promo windows, experiment arms, incident
   * ranges) without the nested-loop theta join Spark would otherwise
   * plan: both sides map onto fixed `bucketSeconds` buckets (an event
   * has one; a period explodes to the buckets its `[start_ts, end_ts)`
   * span covers), the join is a plain EQUI-join on bucket id, and the
   * residual range predicate filters within the bucket. An event meets
   * a period at most once (its single bucket), so no dedup is needed.
   * Pick `bucketSeconds` near the typical period length: period
   * fan-out stays O(1) and each bucket pairs only co-located rows.
   * Output: the joined event rows annotated with `period_id`.
   */
  def intervalJoin(events: DataFrame, periods: DataFrame,
                   bucketSeconds: Long = 86400): DataFrame = {
    val ev = events
      .withColumn("__sec", col("ts").cast("long"))
      .withColumn("__bucket", expr(s"__sec div ${bucketSeconds}L"))
    val p = periods
      .withColumn("__s0", col("start_ts").cast("long"))
      .withColumn("__e0", col("end_ts").cast("long"))
      .withColumn("__bucket", explode(sequence(
        expr(s"__s0 div ${bucketSeconds}L"),
        expr(s"(__e0 - 1) div ${bucketSeconds}L"))))
      .select(col("period_id"), col("__s0"), col("__e0"), col("__bucket"))
    ev.join(p, Seq("__bucket"))
      .filter(col("__sec") >= col("__s0") && col("__sec") < col("__e0"))
      .drop("__bucket", "__sec", "__s0", "__e0")
  }

  /**
   * Top-`k` session paths — the "what do users actually do" report:
   * gap-sessionize each user's stream, render each session's first
   * `maxLen` event types as a `>`-joined path, and count sessions per
   * path. The path head rides [[graft.functions.BoundedMinIds]]
   * (sort key = zero-padded (epoch-micros, event_id), payload = the
   * event type), so a pathological never-idle session contributes a
   * constant-size buffer per map task — no per-session collect, no
   * length cap on what the SESSION may contain, only on what the path
   * renders. The final cut is `TakeOrderedAndProject`.
   * Output: `(path, sessions)`, ties broken by path string.
   */
  def sessionPaths(events: DataFrame, gapSeconds: Long = 1800,
                   maxLen: Int = 5, k: Int = 20,
                   keyCol: String = "user_id",
                   typeCol: String = "event_type"): DataFrame = {
    graft.functions.VectorExpressions.register(events.sparkSession)
    val sessions = gapSessions(events, gapSeconds, keyCol)
    sessions
      .groupBy(col(keyCol), col("__session"))
      .agg(graft.functions.VectorExpressions.boundedMinIds(
        concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0")),
        col(typeCol), maxLen).as("__head"))
      .select(array_join(col("__head"), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("sessions"))
      .orderBy(col("sessions").desc, col("path"))
      .limit(k)
  }

  /**
   * Multi-level rollup report over the event log — per (type, hour),
   * per type, and grand-total rows in one pass (`ROLLUP` grouping
   * sets, which Spark plans as a single expand + partial-aggregable
   * hash aggregate — one shuffle for all three levels). Aggregates
   * are count + integer-cent sum (engine-exact); rolled-up levels are
   * rendered with `'ALL'` / `-1` sentinels and the standard
   * `grouping_id` bit vector so the oracle's `GROUPING()` matches.
   * Output: `(event_type, hour, gid, events, cents_sum)`.
   */
  def typeHourRollup(events: DataFrame,
                     typeCol: String = "event_type"): DataFrame =
    events
      .withColumn("__hour", hour(col("ts")))
      .withColumn("__cents", floor(col("value") * 100).cast("long"))
      .rollup(col(typeCol), col("__hour"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("events"), sum(col("__cents")).as("cents_sum"))
      .select(coalesce(col(typeCol), lit("ALL")).as(typeCol),
        coalesce(col("__hour"), lit(-1)).cast("int").as("hour"),
        col("gid"), col("events"), col("cents_sum"))

  /**
   * Funnel conversion-time report — for each adjacent stage pair of a
   * [[funnel]], the converted-user count and exact integer stats of
   * the conversion delay (min/max/sum plus the type-1 MEDIAN in
   * epoch-micros): "how long do users take to go from click to
   * purchase" with every compared number int64. The median rides the
   * [[exactQuantiles]] distinct-value compression — the window scans
   * distinct delay values per stage, and the funnel itself is the
   * K-join partial-agg chain (no per-user history windows anywhere).
   * Output: `(stage, converted, min_us, max_us, sum_us, median_us)`,
   * stage i = the (i → i+1) transition.
   */
  def funnelConversion(events: DataFrame, stages: Seq[String],
                       keyCol: String = "user_id",
                       typeCol: String = "event_type",
                       ordCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages.size >= 2, "funnelConversion needs >= 2 stages")
    val f = funnel(events, stages, keyCol, typeCol, ordCol)
      .localCheckpoint(false) // feeds one diff branch per stage pair
    val diffs = (1 until stages.size).map { i =>
      f.filter(col(s"s${i + 1}_us").isNotNull)
        .select(lit(i).as("stage"),
          (col(s"s${i + 1}_us") - col(s"s${i}_us")).as("__d"))
    }.reduce(_ unionByName _)
    val counts = diffs.groupBy(col("stage"), col("__d"))
      .agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy(col("stage")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = counts
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col("stage"))))
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy(col("stage")).agg(min(col("__d")).as("median_us"))
    diffs.groupBy(col("stage"))
      .agg(count(lit(1)).as("converted"), min(col("__d")).as("min_us"),
        max(col("__d")).as("max_us"), sum(col("__d")).as("sum_us"))
      .join(med, Seq("stage"))
  }

  /**
   * Per-type linear TREND of daily volume — the OLS slope of daily
   * event counts regressed on the day index, with every compared
   * number an exact integer: `num = n·Σxy − Σx·Σy`,
   * `den = n·Σx² − (Σx)²` (x = days since the type's first day,
   * y = daily count), and the milli-slope uses an explicit
   * sign-split floor division (Spark's `div` truncates toward zero
   * and engines disagree on negative integral division — the
   * sign-split makes floor semantics explicit on both sides). No
   * float regression crosses engines.
   *
   * Scale shape: the raw stream collapses to one row per (type, day)
   * in a partial-aggregable count FIRST; the regression then runs
   * over day-grid-sized data (two more tiny aggregates). Magnitude
   * bound: |num| ≤ n²·x_max·y_max — int64-safe while daily counts
   * stay below ~10¹¹ over a decade of days; beyond that, cast the
   * moment sums to DECIMAL(38,0) (the [[anomalies]] pattern).
   * Output: `(event_type, n_days, num, den, slope_milli)`; groups
   * with a single day report `(n_days=1, 0, 0, 0)`.
   */
  def dailyTrend(events: DataFrame,
                 typeCol: String = "event_type"): DataFrame = {
    val daily = events
      .withColumn("__day", to_date(col("ts")))
      .groupBy(col(typeCol), col("__day"))
      .agg(count(lit(1)).as("__y"))
    val d0 = daily.groupBy(col(typeCol))
      .agg(min(col("__day")).as("__d0"))
    val xy = daily.join(broadcast(d0), Seq(typeCol))
      .withColumn("__x", datediff(col("__day"), col("__d0")).cast("long"))
    val m = xy.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("num",
        col("n_days") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("den",
        col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
    m.select(col(typeCol), col("n_days"),
      when(col("den") === 0, lit(0L)).otherwise(col("num")).as("num"),
      col("den"),
      when(col("den") === 0, lit(0L))
        .when(col("num") >= 0, expr("(1000 * num) div den"))
        .otherwise(-expr("(1000 * -num + den - 1) div den"))
        .as("slope_milli"))
  }

  /**
   * Per-type changepoint day — the day where the cumulative daily
   * volume deviates most from a constant rate (the CUSUM peak, which
   * for a single level shift is the maximum-likelihood change
   * location): `dev_k = |n·C_k − k·S|` over the type's ordered
   * observed days (C_k cumulative count through day k of n observed
   * days, S the total), maximised with ties to the EARLIEST day.
   * Every compared number is exact int64 — no float likelihoods
   * cross engines.
   *
   * Scale shape: the stream collapses to (type, day) counts in one
   * partial-aggregable pass; the cumulative window then runs over
   * DAY-GRID-sized data per type (calendar-bounded, never
   * event-volume-bounded), and the argmax is a partial-aggregable
   * `max(struct)`. Output: `(event_type, change_day, dev)`.
   */
  def changePoint(events: DataFrame,
                  typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .withColumn("__day", to_date(col("ts")))
      .groupBy(col(typeCol), col("__day"))
      .agg(count(lit(1)).as("__y"))
    val wcum = Window.partitionBy(col(typeCol)).orderBy(col("__day"))
    val wall = Window.partitionBy(col(typeCol))
    daily
      .withColumn("__k", row_number().over(wcum).cast("long"))
      .withColumn("__c", sum(col("__y")).over(
        wcum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(wall))
      .withColumn("__s", sum(col("__y")).over(wall))
      .withColumn("__dev",
        abs(col("__n") * col("__c") - col("__k") * col("__s")))
      .groupBy(col(typeCol))
      .agg(max(struct(col("__dev"), (-col("__k")).as("__nk"),
        col("__day"))).as("__b"))
      .select(col(typeCol), col("__b.__day").as("change_day"),
        col("__b.__dev").as("dev"))
  }

  /**
   * CUBE grouping sets over (type, day-of-week) — all four levels
   * ((t,d) / t / d / grand total) in one expand + partial-aggregable
   * hash aggregate, one shuffle. Completes the grouping-sets family
   * next to [[typeHourRollup]]: CUBE's extra `(null, dow)` level is
   * the weekday-seasonality report ROLLUP cannot produce. Sentinel
   * rendering and `grouping_id` exactly as the rollup face.
   * Output: `(event_type, dow, gid, events, cents_sum)`; `dow` is
   * Spark `dayofweek` (1=Sunday … 7=Saturday).
   */
  def typeDowCube(events: DataFrame,
                  typeCol: String = "event_type"): DataFrame =
    events
      .withColumn("__dow", dayofweek(col("ts")))
      .withColumn("__cents", floor(col("value") * 100).cast("long"))
      .cube(col(typeCol), col("__dow"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("events"), sum(col("__cents")).as("cents_sum"))
      .select(coalesce(col(typeCol), lit("ALL")).as(typeCol),
        coalesce(col("__dow"), lit(-1)).cast("int").as("dow"),
        col("gid"), col("events"), col("cents_sum"))

  /**
   * Pivoted daily report — one row per day, a `(events, cents)`
   * column pair per event type. Pivot values are EXPLICIT: Spark's
   * value-less `pivot(col)` runs a distinct-collect job at PLAN time
   * to discover columns — a driver-side scan of the fact table that
   * also makes the schema data-dependent. With the type list given,
   * the pivot compiles to one conditional hash aggregate: a single
   * shuffle on the day key, fully partial-aggregable, schema fixed.
   * Absent (day, type) cells render as 0 (never null) so the report
   * is subtraction-safe.
   * Output: `(day, <t>_events, <t>_cents …)` for each type `t`.
   */
  def dailyTypePivot(events: DataFrame,
                     types: Seq[String] = Seq("click", "error",
                       "purchase", "signup", "view"),
                     typeCol: String = "event_type"): DataFrame = {
    require(types.nonEmpty, "pivot needs explicit type values")
    val pivoted = events
      .withColumn("__day", to_date(col("ts")))
      .withColumn("__cents", floor(col("value") * 100).cast("long"))
      .groupBy(col("__day").as("day"))
      .pivot(typeCol, types)
      .agg(count(lit(1)).as("events"), sum(col("__cents")).as("cents"))
    pivoted.select(col("day") +: types.flatMap(t => Seq(
      coalesce(col(s"${t}_events"), lit(0L)).as(s"${t}_events"),
      coalesce(col(s"${t}_cents"), lit(0L)).as(s"${t}_cents"))): _*)
  }

  /**
   * Ordered funnel analysis — for every user, the EARLIEST traversal
   * of the `stages` event-type sequence, stage k's event strictly
   * after stage k-1's in `(ts, ordCol)` order. Greedy earliest-first
   * matching is exact for funnel membership: if any ordered traversal
   * exists, taking each stage at its earliest admissible event also
   * yields one (a later stage-k choice only shrinks what stage k+1
   * may pick — the standard exchange argument), so "reached stage k"
   * is decided correctly.
   *
   * Scale shape: each stage is one filtered user-keyed equi-join plus
   * a partial-aggregable `min(struct(ts, ord))` — `stages.size`
   * shuffles on the user key, state one row per surviving user. No
   * per-user event collection and no window over a user's full
   * history: a hot user's millions of events combine map-side, they
   * do not serialize through one task's sort.
   *
   * Output: `(keyCol, s1_us…sK_us, stages_completed)` — stage
   * timestamps as epoch-micros int64 (engine-exact; the cross-engine
   * float invariant never meets a float), null past the last stage
   * reached; users with no stage-1 event are absent (funnel reports
   * describe entrants).
   */
  def funnel(events: DataFrame, stages: Seq[String],
             keyCol: String = "user_id", typeCol: String = "event_type",
             ordCol: String = "event_id"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var cur: DataFrame = null
    val stageDfs = Vector.newBuilder[DataFrame]
    for ((st, i0) <- stages.zipWithIndex) {
      val i = i0 + 1
      val ev = events.filter(col(typeCol) === st)
        .select(col(keyCol), unix_micros(col("ts")).as("__us"),
          col(ordCol).cast("long").as("__ord"))
      val adm = if (cur == null) ev else
        ev.join(cur, Seq(keyCol))
          .filter(col("__us") > col(s"s${i - 1}_us") ||
            (col("__us") === col(s"s${i - 1}_us") &&
              col("__ord") > col(s"s${i - 1}_ord")))
      val prevCols = (1 until i).flatMap(j =>
        Seq(col(s"s${j}_us"), col(s"s${j}_ord")))
      // `cur` is unique per key, so grouping by the carried stage
      // columns adds no cardinality — it just keeps them in scope
      // lazy checkpoint: stage i's result backs BOTH the next stage's
      // join and the final assembly — without it stage j recomputes
      // K-j+1 times (self-joined-intermediates invariant); the
      // checkpointed frame is one row per surviving user
      cur = adm.groupBy((col(keyCol) +: prevCols): _*)
        .agg(min(struct(col("__us"), col("__ord"))).as("__m"))
        .withColumn(s"s${i}_us", col("__m.__us"))
        .withColumn(s"s${i}_ord", col("__m.__ord"))
        .drop("__m")
        .localCheckpoint(false)
      stageDfs += cur
    }
    val dfs = stageDfs.result()
    var out = dfs.head
    for (i <- 1 until stages.size)
      out = out.join(
        dfs(i).select(col(keyCol), col(s"s${i + 1}_us"),
          col(s"s${i + 1}_ord")),
        Seq(keyCol), "left")
    out.select(col(keyCol) +:
      (1 to stages.size).map(i => col(s"s${i}_us")) :+
      (1 to stages.size).map(i =>
        when(col(s"s${i}_us").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _).cast("long").as("stages_completed"): _*)
  }

  /** Per-user funnel progress carried between micro-batches: the
    * chosen `(epoch-micros, order-key)` per completed stage — a PREFIX
    * of the stage list by construction (stage i needs stage i-1), so
    * the state is at most `stages.size` pairs per user. */
  final case class FunnelState(us: Seq[Long], ord: Seq[Long])
  final case class FunnelEvent(user_id: Long, us: Long,
                               ord: Long, stage: Int)
  final case class FunnelUpdate(user_id: Long, stage_us: Seq[Long],
                                stages_completed: Long)

  /**
   * REAL incremental funnel: the [[funnel]] semantics computed by a
   * stateful stream with BOUNDED per-user state (K (ts, ord) pairs —
   * never the user's event history). Exactness rests on event-order
   * delivery: the source is re-sharded by `repartitionByRange(ts,
   * event_id)` (files are disjoint, ordered time ranges) and each
   * shard file gets a strictly increasing modification time, so the
   * file source (`latestFirst=false`, `maxFilesPerTrigger=1`) replays
   * the log in event order, one range per micro-batch; within a batch
   * the group iterator is sorted in memory. Processing events in
   * global (ts, ord) order makes the greedy update exact: stage i is
   * set by the FIRST qualifying event strictly after the chosen stage
   * i-1 — precisely the batch funnel's earliest-strict-after choice.
   * This is the production shape for funnel-over-log pipelines: event
   * logs arrive in approximate time order, per-key state stays K
   * timestamps, and the state store (RocksDB at scale) holds it.
   *
   * Emits one Update-mode row per user per batch in which the user's
   * state ADVANCED (stages_completed strictly increases per emission),
   * so the final answer per user is the emission with the most stages
   * — which the gate selects with a max(struct) aggregate. Throws if
   * the drain ran fewer than `minTriggers` data batches (an ignored
   * throttle would make the order test vacuous).
   */
  def streamedFunnel(spark: SparkSession, path: String, shardDir: String,
                     stages: Seq[String], shards: Int = 4,
                     minTriggers: Int = 3): DataFrame = {
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    val name = s"graft_stream_fn_${runCounter.incrementAndGet()}"
    val schema = timeOrderedShards(spark, path, shardDir, shards)
    val stageIdx = stages.zipWithIndex.toMap
    val k = stages.size
    val typed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(shardDir)
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("ord"),
        element_at(typedLit[Map[String, Int]](stageIdx),
          col("event_type")).as("stage"))
      .as[FunnelEvent]
    val updates = typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Nil, Nil))
          var us = st.us.toVector
          var ord = st.ord.toVector
          val before = us.length
          rows.toVector.sortBy(e => (e.us, e.ord)).foreach { e =>
            val p = us.length
            if (p < k && e.stage == p &&
                (p == 0 || e.us > us(p - 1) ||
                  (e.us == us(p - 1) && e.ord > ord(p - 1)))) {
              us :+= e.us; ord :+= e.ord
            }
          }
          if (us.length > before) {
            state.update(FunnelState(us, ord))
            Iterator.single(FunnelUpdate(uid, us, us.length.toLong))
          } else Iterator.empty
      }
    withStatePartitions(spark, 8) {
      val q = toMemorySink(updates.toDF(), name, OutputMode.Update())
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= minTriggers,
          s"funnel drain ran $dataBatches data batches; " +
          s"expected >= $minTriggers (file metering ignored?)")
      } finally q.stop()
    }
    // final state per user = the emission with the most stages
    val fin = spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("stages_completed"), col("stage_us")))
        .as("__m"))
    fin.select(col("user_id") +:
      (1 to k).map(i => element_at(col("__m.stage_us"), i)
        .as(s"s${i}_us")) :+
      col("__m.stages_completed").as("stages_completed"): _*)
  }

  final case class PatEvent(user_id: Long, us: Long, ord: Long,
                            ty: String)
  final case class PatState(lastUs: Long, sess: Long, tys: Seq[String],
                            t0s: Seq[Long], t1s: Seq[Long])
  final case class PatUpdate(user_id: Long, sess: Long, ty: String,
                             t0: Long, t1: Long)

  /**
   * REAL incremental sequential-pattern mining — the streamed face of
   * [[sessionPatterns]], completing the incremental story for the last
   * batch-only report. Per-user state is the OPEN gap-session's
   * per-type (min, max) timestamp pair plus the last-seen second —
   * bounded by the type vocabulary, never event volume (the
   * [[streamedFunnel]] bounded-state shape). Each micro-batch: events
   * (replayed in event-time order by [[timeOrderedShards]]) extend or
   * close the open session; a closed session's rows and the batch-end
   * open-session rows are emitted in Update mode. t0 is set by a
   * type's first in-order event and t1 only grows, so the sink's
   * min/max per (user, session, type) recovers the exact final pairs;
   * the pair-support tail over that table is [[sessionPatterns]]'
   * verbatim, and the gate shares the batch oracle verbatim.
   */
  def streamedPatterns(spark: SparkSession, path: String,
                       shardDir: String, gapSeconds: Long = 1800,
                       minSupport: Long = 2, topK: Int = 20,
                       shards: Int = 4, minTriggers: Int = 3)
      : DataFrame = {
    import spark.implicits._
    val name = s"graft_stream_sp_${runCounter.incrementAndGet()}"
    val schema = timeOrderedShards(spark, path, shardDir, shards)
    val typed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(shardDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("ord"),
        col("event_type").as("ty"))
      .as[PatEvent]
    val updates = typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[PatState, PatUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[PatEvent],
         state: GroupState[PatState]) =>
          val st = state.getOption
            .getOrElse(PatState(Long.MinValue, 0L, Nil, Nil, Nil))
          var lastUs = st.lastUs
          var sess = st.sess
          val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
          st.tys.indices.foreach(i => m(st.tys(i)) = (st.t0s(i), st.t1s(i)))
          val outBuf = scala.collection.mutable.ArrayBuffer[PatUpdate]()
          rows.toVector.sortBy(e => (e.us, e.ord)).foreach { e =>
            // gap on truncated SECONDS — the batch/oracle convention
            if (sess == 0L ||
                e.us / 1000000L - lastUs / 1000000L > gapSeconds) {
              // close the open session: flush its rows under its id
              m.foreach { case (ty, (t0, t1)) =>
                outBuf += PatUpdate(uid, sess, ty, t0, t1) }
              m.clear()
              sess += 1
            }
            val cur = m.getOrElse(e.ty, (e.us, e.us))
            m(e.ty) = (math.min(cur._1, e.us), math.max(cur._2, e.us))
            lastUs = e.us
          }
          // the still-open session's rows as of this batch end
          m.foreach { case (ty, (t0, t1)) =>
            outBuf += PatUpdate(uid, sess, ty, t0, t1) }
          state.update(PatState(lastUs, sess, m.keys.toSeq,
            m.values.map(_._1).toSeq, m.values.map(_._2).toSeq))
          outBuf.iterator
      }
    withStatePartitions(spark, 8) {
      val q = toMemorySink(updates.toDF(), name, OutputMode.Update())
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= minTriggers,
          s"patterns drain ran $dataBatches data batches; " +
            s"expected >= $minTriggers (file metering ignored?)")
      } finally q.stop()
    }
    // localCheckpoint: (a) the pair join self-joins this table, and a
    // MemorySink view cannot re-alias its references on the second
    // face (INTERNAL_ERROR: conflicting references); (b) it is the
    // bounded (user, session, type) projection — tiny by contract
    val t = spark.table(name)
      .groupBy(col("user_id"), col("sess"), col("ty"))
      .agg(min(col("t0")).as("__t0"), max(col("t1")).as("__t1"))
      .localCheckpoint()
    val a = t.select(col("user_id"), col("sess"),
      col("ty").as("from_type"), col("__t0"))
    val b = t.select(col("user_id"), col("sess"),
      col("ty").as("to_type"), col("__t1"))
    a.join(b, Seq("user_id", "sess"))
      .filter(col("from_type") =!= col("to_type") &&
        col("__t0") < col("__t1"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("from_type"), col("to_type"))
      .limit(topK)
  }

  final case class GapEvent(user_id: Long, us: Long, ord: Long)
  final case class GapState(lastUs: Long, sess: Long, n: Long)
  final case class GapUpdate(user_id: Long, session_id: Long,
                             events: Long)

  /**
   * REAL incremental gap sessionization — the streamed face of
   * [[gapSessions]], sharing the `events_sessions` oracle VERBATIM
   * (r10 verdict #8: `sessionize` rides Spark's native session_window,
   * a DIFFERENT definition; this one computes the library's own).
   * Per-user state is three scalars — last-seen second, open session
   * id, open session's event count — bounded regardless of history
   * length (the [[streamedFunnel]]/[[streamedPatterns]] shape). Each
   * micro-batch (replayed in event-time order by the
   * [[timeOrderedShards]] harness): an over-gap event closes the open
   * session (its final count is emitted under its id) and opens the
   * next; the open session's running count is emitted at batch end.
   * A session's count only grows across batches and a close emits its
   * final value, so the sink's MAX per (user, session) recovers the
   * exact batch report: `(user_id, session_id, events)` with 1-based
   * time-ordered ids — byte-identical to [[gapSessions]] grouped the
   * same way.
   */
  def streamedGapSessions(spark: SparkSession, path: String,
                          shardDir: String, gapSeconds: Long = 1800,
                          shards: Int = 4, minTriggers: Int = 3)
      : DataFrame = {
    import spark.implicits._
    val name = s"graft_stream_gs_${runCounter.incrementAndGet()}"
    val schema = timeOrderedShards(spark, path, shardDir, shards)
    val typed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(shardDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("ord"))
      .as[GapEvent]
    val updates = typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, GapUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[GapEvent],
         state: GroupState[GapState]) =>
          val st = state.getOption.getOrElse(GapState(Long.MinValue, 0L, 0L))
          var lastUs = st.lastUs
          var sess = st.sess
          var n = st.n
          val outBuf = scala.collection.mutable.ArrayBuffer[GapUpdate]()
          rows.toVector.sortBy(e => (e.us, e.ord)).foreach { e =>
            // gap on truncated SECONDS — the batch/oracle convention
            if (sess == 0L ||
                e.us / 1000000L - lastUs / 1000000L > gapSeconds) {
              if (sess > 0L) outBuf += GapUpdate(uid, sess, n)
              sess += 1
              n = 0L
            }
            n += 1
            lastUs = e.us
          }
          // the still-open session's running count as of this batch end
          outBuf += GapUpdate(uid, sess, n)
          state.update(GapState(lastUs, sess, n))
          outBuf.iterator
      }
    withStatePartitions(spark, 8) {
      val q = toMemorySink(updates.toDF(), name, OutputMode.Update())
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= minTriggers,
          s"gap-session drain ran $dataBatches data batches; " +
            s"expected >= $minTriggers (file metering ignored?)")
      } finally q.stop()
    }
    spark.table(name)
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(col("events")).as("events"))
  }

  /**
   * Cohort retention analysis: users are assigned to the period of
   * their FIRST event (the cohort), and each (cohort, period-offset)
   * cell counts the distinct users from that cohort active that many
   * periods later — the standard product-analytics retention triangle.
   * Periods are integer epoch-micro divisions against a fixed origin
   * (epoch 0), so cohort/offset arithmetic is pure int64 truncating
   * division (both engines floor nonnegative int64 `div` identically);
   * no float ever appears.
   *
   * Scale shape: first-event is a partial-aggregable `min` per user;
   * activity distincts to one row per (user, period) BEFORE the join
   * (bounding a hot user's contribution to #periods rows, not #events);
   * the cohort join is a user-keyed equi-join; the final cell count is
   * a two-phase distinct aggregate. No windows over user history.
   */
  def retentionCohorts(events: DataFrame, periodSeconds: Long = 7L * 86400,
                       keyCol: String = "user_id"): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val pUs = periodSeconds * 1000000L
    val first = events.groupBy(col(keyCol))
      .agg(min(unix_micros(col("ts"))).as("__first_us"))
      .select(col(keyCol), expr(s"__first_us div ${pUs}L").as("__cohort"))
    val active = events
      .select(col(keyCol), unix_micros(col("ts")).as("__us"))
      .select(col(keyCol), expr(s"__us div ${pUs}L").as("__period"))
      .distinct()
    active.join(first, Seq(keyCol))
      .groupBy(col("__cohort").as("cohort_period"),
        (col("__period") - col("__cohort")).as("period_offset"))
      .agg(countDistinct(col(keyCol)).as("users"))
  }

  /**
   * REAL incremental stream-stream inner join, drained to completion:
   * clicks joined to the same user's purchases within
   * `[click.ts, click.ts + windowMinutes]`, both sides watermarked so
   * the join state is bounded (Spark evicts buffered rows once the
   * watermark passes the interval bound — at scale this is what keeps
   * a stream-stream join from buffering the whole history). The
   * result must equal the batch join with the same predicate, which is
   * what the SQL oracle checks.
   */
  def streamedIntervalJoin(spark: SparkSession, path: String,
                           leftType: String = "click",
                           rightType: String = "purchase",
                           windowMinutes: Int = 10): DataFrame = {
    val name = s"graft_stream_ij_${runCounter.incrementAndGet()}"
    // stream SELF-join: both sides derive from one file source, so the
    // directory is listed and the schema resolved once (Spark plans the
    // two legs as separate scans of the same source)
    val src = streamFromParquet(spark, path)
    val l = src.filter(col("event_type") === leftType)
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("l_uid"),
        col("ts").as("l_ts"))
    val r = src.filter(col("event_type") === rightType)
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id").as("r_uid"),
        col("ts").as("r_ts"))
    val joined = l.join(r,
      col("l_uid") === col("r_uid") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("purchase_id"))
    withStatePartitions(spark, 8) {
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /** Update-mode sink helper used by tests and demos: stream into an
    * in-memory table. */
  def toMemorySink(df: DataFrame, name: String,
                   mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  private val runCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Run a drain-to-completion gate stream with a bounded number of
    * state partitions. Stateful operators allocate one state store per
    * shuffle partition PER MICRO-BATCH; for the bounded gate streams
    * the per-store commit overhead dominates actual work, so 8
    * partitions beat the session's 32. (A production deployment sizes
    * this to key cardinality — state partitioning, like any shuffle,
    * is the scale knob, and it is fixed for the life of a query.) */
  /** Write `path`'s events as `shards` time-range-sorted parquet parts
    * with strictly increasing mtimes, so a `maxFilesPerTrigger=1` file
    * source replays them oldest-first in event-time order — the replay
    * harness every REAL incremental gate drains. Returns the schema. */
  private def timeOrderedShards(spark: SparkSession, path: String,
                                shardDir: String, shards: Int)
      : org.apache.spark.sql.types.StructType = {
    readEvents(spark, path)
      .repartitionByRange(shards, col("ts"), col("event_id"))
      .sortWithinPartitions("ts", "event_id")
      .write.mode("overwrite").parquet(shardDir)
    // part-file names sort in range order; give them strictly
    // increasing mtimes so the file source's oldest-first admission
    // replays ranges in event-time order
    val parts = new java.io.File(shardDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + i * 1000L) }
    spark.read.parquet(shardDir).schema
  }

  private def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

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
    withStatePartitions(spark, 8) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /**
   * REAL incremental value histogram — the streamed twin of
   * [[valueHistogram]]: file source → (type, bin) counting
   * aggregation → memory sink, drained to completion. The streaming
   * state is EXACTLY the (type, bin) vocabulary regardless of stream
   * length, and counter addition is associative, so the drained table
   * equals the batch build — the gate shares the
   * `events_value_histogram` oracle verbatim (the streamedCountMin
   * contract).
   */
  def streamedValueHistogram(spark: SparkSession, path: String,
                             widthCents: Long = 500): DataFrame = {
    val name = s"graft_stream_vh_${runCounter.incrementAndGet()}"
    val counts = streamFromParquet(spark, path)
      .select(col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("__c"))
      .withColumn("bin", expr(floorDivExpr("__c", widthCents)))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
    withStatePartitions(spark, 8) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .withColumn("lo_cents", col("bin") * widthCents)
      .select(col("event_type"), col("bin"), col("lo_cents"), col("n"))
  }

  /**
   * REAL incremental gap-based sessionization: file source →
   * `session_window` aggregation → memory sink, drained to completion.
   * Session-window semantics: an event extends a session while its
   * timestamp is STRICTLY before the previous session end
   * (`last_ts + gap`), so a gap of exactly `gapSeconds` starts a new
   * session — the SQL oracle mirrors that with a `diff >= gap`
   * boundary on exact microsecond arithmetic. Complete mode keeps
   * every session in state for the gate (bounded fixture); a
   * production stream adds a watermark and Append mode so closed
   * sessions evict — same query shape, one config away.
   */
  def streamedSessions(spark: SparkSession, path: String,
                       gapSeconds: Int = 1800): DataFrame = {
    val name = s"graft_stream_sw_${runCounter.incrementAndGet()}"
    val sessions = streamFromParquet(spark, path)
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("events"))
      .select(col("session_window.start").cast("long").as("session_start"),
        col("user_id"), col("events"))
    withStatePartitions(spark, 8) {
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /**
   * Stream-static enrichment — the dimension-join shape every event
   * pipeline runs: file-source stream joined INSIDE the streaming plan
   * to a static (batch) dimension table, then aggregated per dimension
   * attribute. The stream-static join is stateless — Spark re-plans
   * the static side per micro-batch and keeps no join state — and the
   * static side is broadcast, so the stream never shuffles before the
   * final vocabulary-bounded aggregation. At 100 TB/day of events and
   * a dimension in the millions this is exactly the plan you want
   * (broadcast dim, map-side partial agg); a billion-row dimension
   * would switch to a pre-bucketed sort-merge join, same query shape.
   * `dim` must carry `joinKey` and the `attr` column. Drained to
   * completion via the memory sink; cents per the engine-stable
   * integer rendering (Σ floor(value·100)).
   */
  def streamedEnrich(spark: SparkSession, path: String, dim: DataFrame,
                     joinKey: String = "user_id",
                     attr: String = "mktsegment"): DataFrame = {
    val name = s"graft_stream_en_${runCounter.incrementAndGet()}"
    val enriched = streamFromParquet(spark, path)
      .join(broadcast(dim), Seq(joinKey))
      .groupBy(col(attr))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    withStatePartitions(spark, 8) {
      val q = enriched.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /**
   * RATE-LIMITED incremental run — the backlog-drain shape of a
   * production file stream: the source is split into `shards` files
   * and the stream is throttled with `maxFilesPerTrigger = 1`, so
   * draining the backlog takes at least `shards` separate
   * micro-batches (Spark's source-side flow control: each trigger
   * admits a bounded slice of the pending files; the same knob that
   * keeps a restarted 100 TB-backlog job from committing one giant
   * catch-up batch). The aggregate after the drain must equal the
   * batch SQL over all events — per-batch partial aggregation in
   * Complete mode folds increments across triggers, which is exactly
   * what the gate certifies. Throws if fewer than
   * `minTriggers` data-carrying micro-batches actually ran (the
   * throttle not taking effect must fail loudly, not pass silently
   * as one big batch).
   * Output: `(event_type, events, cents)`.
   */
  def streamedThrottled(spark: SparkSession, path: String,
                        shardDir: String, shards: Int = 4,
                        minTriggers: Int = 3): DataFrame = {
    val name = s"graft_stream_th_${runCounter.incrementAndGet()}"
    // shard the source so file-granular admission has >= `shards`
    // units to meter; overwrite keeps sequential re-runs deterministic
    readEvents(spark, path).repartition(shards)
      .write.mode("overwrite").parquet(shardDir)
    val schema = spark.read.parquet(shardDir).schema
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(shardDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    withStatePartitions(spark, 8) {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= minTriggers,
          s"throttled drain ran $dataBatches data batches; " +
          s"expected >= $minTriggers (maxFilesPerTrigger ignored?)")
      } finally q.stop()
    }
    spark.table(name)
  }

  /**
   * REAL file-sink stream — the production egress path (the memory
   * sink above is gate/test-only): file source → narrow projection →
   * parquet sink with a checkpoint location, `Trigger.AvailableNow`
   * (process everything available, then stop — the batch-over-
   * streaming pattern for scheduled incremental jobs). Exactly-once
   * comes from the sink's `_spark_metadata` commit log + source offsets
   * in the checkpoint: a restart on the same checkpoint reprocesses
   * nothing and re-reading the committed files yields the same table.
   * The gate re-reads the committed output and aggregates per type on
   * the integer-cents rendering; the result must equal the batch SQL
   * over the original parquet.
   */
  def streamedToParquet(spark: SparkSession, path: String,
                        outDir: String): DataFrame = {
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { s =>
          s.iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
        }
      }
    // deterministic gate: fresh output + checkpoint per call (a
    // production job KEEPS the checkpoint — that is what makes reruns
    // incremental and exactly-once). The per-process counter keeps
    // concurrent sessions on the same sfDir from racing a delete
    // against another session's in-flight checkpoint.
    val pidPrefix = s"${outDir}_p${ProcessHandle.current().pid()}_"
    val runDir = s"$pidPrefix${runCounter.incrementAndGet()}"
    // GC THIS process's earlier runs (sequential Verify/Bench have
    // materialized them) plus any DEAD process's leftovers — a live
    // pid's dirs may back in-flight queries and are never touched
    val deadPidDir = s"^${java.util.regex.Pattern.quote(outDir)}_p(\\d+)_".r
    val parent = java.nio.file.Paths.get(runDir).getParent
    if (parent != null && java.nio.file.Files.isDirectory(parent)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(parent)) { s =>
        s.iterator().asScala.toList
          .filter { p =>
            val str = p.toString
            str != runDir && (str.startsWith(pidPrefix) ||
              deadPidDir.findPrefixMatchOf(str).exists { m =>
                val pid = m.group(1).toLong
                ProcessHandle.of(pid).map[Boolean](h => !h.isAlive)
                  .orElse(true)
              })
          }
          .foreach(rmTree)
      }
    }
    val data = s"$runDir/data"
    val q = streamFromParquet(spark, path)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .writeStream.format("parquet")
      .option("path", data)
      .option("checkpointLocation", s"$runDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(data)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("cents")).as("cents"))
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
    withStatePartitions(spark, 8) {
      val q = distinctKeys.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }
}
