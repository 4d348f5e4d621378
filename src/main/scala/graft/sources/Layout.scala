package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators for multi-dimensional scan pruning — the
 * OPTIMIZE-ZORDER story every lakehouse table format (Delta, Iceberg,
 * Hudi) ships, rebuilt on plain parquet: interleave the bits of two
 * clustering keys into a Morton (z-order) value, range-partition and
 * sort the write by it, then answer 2-D range queries by consulting
 * per-file zone maps (min/max of the z-value) and scanning ONLY the
 * files whose range intersects the query.
 *
 * Why this matters at 100 TB: a table sorted by one key answers range
 * scans on THAT key with file skipping, but a filter on a second
 * column still touches every file. The z-order curve keeps both keys'
 * locality simultaneously (points close in (x, y) are close on the
 * curve), so a selective 2-D band touches O(selectivity) of the files
 * instead of all of them. The math is pure int64 bit-spreading —
 * identical in Spark Columns and DuckDB SQL, so the whole
 * write→prune→scan chain is oracle-checkable row-for-row.
 *
 * Also here: [[compactShards]], the small-file compactor (the
 * companion layout problem — a streaming or over-parallel write leaves
 * thousands of KB-scale files whose per-file open/footer cost
 * dominates the scan; bin-pack them into target-size shards without
 * touching row content).
 */
object Layout {

  /** Clamp to the 16-bit grid the interleave supports. */
  private def clamp16(c: Column): Column =
    least(greatest(c.cast("bigint"), lit(0L)), lit(65535L))

  /** Spread the low 16 bits of `v` to even bit positions 0,2,..,30
    * (the classic Morton mask cascade — each step doubles the gap). */
  private def spread(v: Column): Column = {
    val s1 = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x3333333333333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 32-bit Morton key of `(x, y)` (each clamped to [0, 65535]):
    * x's bits land even, y's odd. Pure int64 shifts/masks — codegen'd,
    * and bit-identical to the SQL mirror in any engine. */
  def zValue(x: Column, y: Column): Column =
    spread(clamp16(x)).bitwiseOR(shiftleft(spread(clamp16(y)), 1))

  /** Mirror of [[zValue]] as engine-neutral SQL CTE steps over columns
    * `x`/`y` of `src` — shared by oracles and ad-hoc checks. Emits a
    * relation `(… , zval)` carrying `keep` extra columns through. */
  def zValueSqlCtes(src: String, keep: String): String =
    s"""zs1 AS (SELECT $keep,
       |  (x | (x << 8)) & 71777214294589695 AS xa,
       |  (y | (y << 8)) & 71777214294589695 AS ya FROM $src),
       |zs2 AS (SELECT $keep,
       |  (xa | (xa << 4)) & 1085102592571150095 AS xa,
       |  (ya | (ya << 4)) & 1085102592571150095 AS ya FROM zs1),
       |zs3 AS (SELECT $keep,
       |  (xa | (xa << 2)) & 3689348814741910323 AS xa,
       |  (ya | (ya << 2)) & 3689348814741910323 AS ya FROM zs2),
       |zs4 AS (SELECT $keep,
       |  (xa | (xa << 1)) & 6148914691236517205 AS xa,
       |  (ya | (ya << 1)) & 6148914691236517205 AS ya FROM zs3),
       |zv AS (SELECT $keep, xa | (ya << 1) AS zval FROM zs4)""".stripMargin

  /**
   * Write `df` z-ordered on `(xCol, yCol)` under `dir`: attach `zval`,
   * range-partition into `nFiles` splits on it, sort each split, write
   * parquet. Range partitioning (not hash) is what makes the zone maps
   * selective: each file covers one contiguous z-interval, so file
   * ranges are DISJOINT and a query band intersects few of them. One
   * shuffle (the range exchange) — the same cost any clustering write
   * pays, amortized over every subsequent pruned scan.
   */
  def zorderWrite(df: DataFrame, dir: String, xCol: Column, yCol: Column,
                  nFiles: Int = 8): Unit =
    df.withColumn("zval", zValue(xCol, yCol))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(dir)

  /** Per-file zone maps of a [[zorderWrite]] table: `(file, zmin,
    * zmax, rows)`. One metadata-cheap aggregate per file; at warehouse
    * scale this table comes straight from parquet footers — the scan
    * here is the verification-friendly face, and its OUTPUT is what
    * production would persist as the pruning index. */
  def fileStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("zval")).as("zmin"), max(col("zval")).as("zmax"),
        count(lit(1)).as("rows"))

  /** The files whose z-interval intersects `[lo, hi]` — the zone-map
    * cut. Collect is bounded by the FILE count, never row count. */
  def pruneFiles(stats: DataFrame, lo: Long, hi: Long): Seq[String] =
    stats.filter(col("zmax") >= lo && col("zmin") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /**
   * Zone-map-pruned range scan: read ONLY the files intersecting
   * `[lo, hi]`, then apply the residual row filter. Returns exactly
   * the rows a full scan + filter would (zone maps are admissible:
   * a skipped file can contain no qualifying row), having opened a
   * fraction of the files — the gate proves the equality, the spec
   * pins the fraction.
   */
  def prunedRead(spark: SparkSession, dir: String, stats: DataFrame,
                 lo: Long, hi: Long): DataFrame = {
    val files = pruneFiles(stats, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col("zval") >= lo && col("zval") <= hi)
  }

  /**
   * Small-file compaction: bin-pack the parquet parts under `inDir`
   * into at most `maxBins` shards by CUMULATIVE byte size (files in
   * name order fill a bin until `targetBytes`, then open the next —
   * deterministic, no sampling), rewrite row-identically under
   * `outDir`, and return the re-read table. The data motion is one
   * hash exchange on the bin id; row content is untouched (the gate's
   * checksum aggregates prove it). `maxBins` caps the exchange width;
   * each reduce task writes exactly one output file — EXACTLY, not
   * approximately: bins are keyed by [[exactBinKeys]] salts chosen so
   * Spark's hash partitioning maps each bin to its own reduce task
   * (plain 0..n-1 bin ids hash-collide — two bins can share a task
   * and emit a ~2×targetBytes file while another task sits empty).
   */
  def compactShards(spark: SparkSession, inDir: String, outDir: String,
                    targetBytes: Long, maxBins: Int = 64): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    require(parts.nonEmpty, s"no parquet parts under $inDir")
    var bin = 0; var filled = 0L
    val assign = parts.map { s =>
      if (filled > 0 && filled + s.getLen > targetBytes && bin < maxBins - 1) {
        bin += 1; filled = 0L
      }
      filled += s.getLen
      // key by basename: input_file_name()'s URI prefix rendering
      // (file:/// vs file:/) differs from Path.toUri, but part names
      // are unique within a directory by construction
      (s.getPath.getName, bin)
    }.toMap
    val nBins = bin + 1
    val keys = exactBinKeys(nBins)
    val binOf = udfFreeBinLookup(spark,
      assign.map { case (f, b) => (f, keys(b)) })
    spark.read.parquet(inDir)
      .withColumn("__bin", binOf)
      .repartition(nBins, col("__bin"))
      .drop("__bin")
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Bin-id salts that make the compaction exchange EXACT: key(b) is
    * the smallest non-negative int whose Murmur3 hash (seed 42 — the
    * function `HashPartitioning` evaluates on an int column) lands in
    * reduce partition b of n, so `repartition(n, __bin)` places every
    * bin in its own task. LayoutSpec cross-checks the salt table
    * against Spark's own `hash()` so a partitioner change fails loud.
    * Expected search cost is n·H(n) probes (coupon collector) —
    * microseconds at the ≤64-bin scale this compactor caps at. */
  private[graft] def exactBinKeys(nBins: Int): Array[Int] = {
    val keys = new Array[Int](nBins)
    val found = new Array[Boolean](nBins)
    var k = 0
    var left = nBins
    while (left > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(k, 42)
      val p = ((h % nBins) + nBins) % nBins
      if (!found(p)) { found(p) = true; keys(p) = k; left -= 1 }
      k += 1
    }
    keys
  }

  /** file→bin as a broadcast join-free CASE chain (file count is
    * bounded — the compactor's own premise), keeping the map codegen'd
    * instead of a UDF closure. */
  private def udfFreeBinLookup(spark: SparkSession,
                               assign: Map[String, Int]): Column = {
    val base = element_at(split(input_file_name(), "/"), -1)
    assign.foldLeft(lit(-1)) { case (acc, (name, b)) =>
      when(base === lit(name), lit(b)).otherwise(acc)
    }
  }

  /**
   * Hive-style date-partitioned export — the daily-partition layout
   * every 100 TB event table ships with: rows land under
   * `dir/day=YYYY-MM-DD/…`, so a day-scoped read never OPENS the
   * other days' files (directory-level partition pruning — cheaper
   * even than zone maps, which still read every footer). The
   * partition column is derived, not stored, so row content is
   * unchanged on the round trip.
   *
   * The write repartitions on `(day, file-slot)` first: a plain
   * `partitionBy` write emits one file per (day × upstream
   * partition) — 30 days under 32 tasks is 960 near-empty files, the
   * small-file problem [[compactShards]] exists to undo. `filesPerDay`
   * is the slot count: 1 for small tables; at 100 TB set it to a
   * day's bytes / target file size (the slot key is a deterministic
   * row hash, so the layout is reproducible).
   */
  def datePartitionedWrite(events: DataFrame, dir: String,
                           tsCol: String = "ts",
                           filesPerDay: Int = 1): Unit = {
    require(filesPerDay >= 1, s"filesPerDay must be >= 1")
    events.withColumn("day", to_date(col(tsCol)))
      .withColumn("__slot",
        pmod(xxhash64(col(tsCol)), lit(filesPerDay.toLong)))
      .repartition(col("day"), col("__slot"))
      .drop("__slot")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
  }

  /** Day-scoped read of a [[datePartitionedWrite]] table. The filter
    * lands in the scan's `PartitionFilters` (plan-guarded), so only
    * `day=<day>`'s directory is listed and scanned. */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("day") === lit(day))

  /**
   * Bucketed co-located equi-join: persist both sides bucketed (and
   * sorted) on the join key into warehouse tables, then join the
   * read-back tables — Spark's bucketing metadata proves both sides
   * are already hash-distributed on the key, so the join plans with
   * NO exchange on either side (plan-guarded). This is THE layout
   * move for a 100 TB fact table joined repeatedly on the same key:
   * the shuffle is paid once at write time and never again — every
   * subsequent join, by any job, rides the bucket files.
   * Returns the joined (fact ⋈ dim) DataFrame; caller aggregates.
   */
  def bucketedJoin(fact: DataFrame, dim: DataFrame, key: String,
                   buckets: Int, prefix: String): DataFrame = {
    val spark = fact.sparkSession
    val (ft, dt) = (s"${prefix}_fact", s"${prefix}_dim")
    spark.sql(s"DROP TABLE IF EXISTS $ft")
    spark.sql(s"DROP TABLE IF EXISTS $dt")
    fact.write.format("parquet").bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(ft)
    dim.write.format("parquet").bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(dt)
    spark.table(ft).join(spark.table(dt), Seq(key))
  }

  /**
   * Schema-evolution round trip: write two parquet GENERATIONS of the
   * same logical table — gen-1 lacks `droppedCols` (an older
   * producer's schema), gen-2 carries the full schema — then read the
   * union with `mergeSchema`, which unions the file footers into one
   * schema and back-fills a file's missing columns with nulls. This
   * is the lake reality at 100 TB: years of immutable files written
   * under evolving schemas must stay readable as ONE table without
   * rewriting history. Schema resolution touches only footers (no
   * data scan), and per-file column pruning still reads just the
   * columns each file actually has.
   */
  def schemaEvolutionRoundTrip(df: DataFrame, dir: String,
                               gen1Filter: Column,
                               droppedCols: Seq[String]): DataFrame = {
    df.filter(gen1Filter).drop(droppedCols: _*)
      .write.mode("overwrite").parquet(s"$dir/g1")
    df.filter(!gen1Filter)
      .write.mode("overwrite").parquet(s"$dir/g2")
    df.sparkSession.read.option("mergeSchema", "true")
      .parquet(s"$dir/g1", s"$dir/g2")
  }

  /**
   * CDC MERGE apply (the lakehouse `MERGE INTO` core): fold a
   * changelog into a base snapshot. `changes` carries the base's
   * columns plus `versionCol` (monotone per key) and `deletedCol`
   * (boolean tombstone); per key the HIGHEST version wins, then the
   * winner upserts (replaces the base row, or inserts a new key) or,
   * if it is a tombstone, deletes the key. Change rows are full row
   * images (standard CDC), so a null data value in the winner is
   * written as null, not "keep old".
   *
   * Scale shape: latest-per-key is `max(struct(version, …))` — a
   * PARTIAL-aggregable reduction (map-side combine collapses each
   * key's change burst before the exchange; no window, no sort), then
   * ONE full-outer hash join on the key against the base. At 100 TB
   * the base side can be bucketed on the key ([[bucketedJoin]]) so
   * nightly merges pay no base-side shuffle at all. Determinism:
   * callers must keep `(key, version)` unique — ties would fall to
   * lexicographic row order, which is engine-convention territory.
   */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
                  versionCol: String = "version",
                  deletedCol: String = "deleted"): DataFrame = {
    val dataCols = base.columns.toSeq.filterNot(keys.contains)
    val packed = struct(
      (versionCol +: deletedCol +: dataCols).map(col): _*)
    val latest = changes.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__c"))
      .select(keys.map(col) ++
        Seq(col(s"__c.$deletedCol").as("__del")) ++
        dataCols.map(d => col(s"__c.$d").as(s"__new_$d")): _*)
    base.join(latest, keys, "full_outer")
      .filter(col("__del").isNull || !col("__del"))
      .select(keys.map(col) ++ dataCols.map(d =>
        when(col("__del").isNotNull, col(s"__new_$d"))
          .otherwise(col(d)).as(d)): _*)
  }
}
