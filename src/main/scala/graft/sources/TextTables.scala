package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSON-lines ingest/egress for document tables — the interchange format
 * of large-scale text pipelines (each line one JSON object). The
 * reference ingests tab-separated HDFS text (`GraphStore.grasperText`);
 * this is the same source/sink role for the corpus-curation side of the
 * library.
 *
 * Scale notes: both directions are plain distributed file scans —
 * no shuffle, one task per file split. Reading REQUIRES an explicit
 * schema: schema inference runs an extra full pass over the data and
 * silently widens types (a 100 TB corpus cannot afford either).
 * `mode=FAILFAST` surfaces corrupt lines instead of nulling them; relax
 * to PERMISSIVE + `columnNameOfCorruptRecord` when quarantining dirty
 * data is the intent.
 */
object TextTables {

  /** Write `df` as JSON-lines (one object per row, snappy-compressed
    * parts, one file per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON-lines written by [[writeJsonl]] (or any JSONL corpus)
    * with a caller-supplied schema. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Round-trip `df` through JSONL under `dir` and return the re-read
    * DataFrame with `df`'s schema — fidelity harness for the gate. */
  def jsonlRoundTrip(df: DataFrame, dir: String): DataFrame = {
    writeJsonl(df, dir)
    readJsonl(df.sparkSession, dir, df.schema)
  }

  /** Write `df` as RFC-4180 CSV: every field quoted, quotes escaped by
    * doubling (`escape = "`), header row — the interchange dialect
    * every external tool parses. Embedded newlines in text survive
    * inside quotes. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      // the WRITER trims field whitespace by default — byte fidelity
      // demands it off on both sides
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Read CSV written by [[writeCsv]] with a caller-supplied schema.
    * `multiLine` re-assembles quoted embedded newlines; FAILFAST
    * surfaces any malformed row instead of nulling it; the impossible
    * `nullValue` sentinel keeps empty strings as empty strings (the
    * default turns them into nulls, which breaks byte fidelity). */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "FAILFAST")
      .option("nullValue", "\u0000")
      .csv(path)

  /** Round-trip `df` through CSV under `dir` and return the re-read
    * DataFrame — fidelity harness for the gate. */
  def csvRoundTrip(df: DataFrame, dir: String): DataFrame = {
    writeCsv(df, dir)
    readCsv(df.sparkSession, dir, df.schema)
  }

  /**
   * Sharded training-data export: attach
   * [[graft.operators.CurationOps.shardShuffle]]'s deterministic
   * shard/position, write parquet partitioned by shard (one directory
   * per shard — what a data-loader fleet consumes, each worker reading
   * only its `shard=K/` prefix), and return the RE-READ table. The
   * write is one narrow projection + the shard window; partition
   * pruning on the read side is free (`shard` is a partition column).
   * Deterministic shard math means the gate can verify the re-read
   * per-shard aggregates against SQL computed from the source table —
   * the sink round-trips through real files under an oracle.
   */
  def shardedParquetRoundTrip(df: DataFrame, dir: String,
                              nShards: Int,
                              idCol: String = "doc_id"): DataFrame = {
    val sharded = df.join(
      graft.operators.CurationOps.shardShuffle(df, nShards, idCol), idCol)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  /**
   * ORC ingest/egress — the other columnar interchange format Spark
   * ships natively (Hive/Trino ecosystems). Same scale shape as
   * parquet: distributed columnar scan, predicate pushdown and column
   * pruning via ORC stripe statistics, zero shuffle either direction.
   * The gate verifies byte fidelity without the oracle engine reading
   * ORC: the round-tripped table's per-source aggregates (row count,
   * char sum, and an md5-derived 32-bit content checksum per doc,
   * summed) must equal the same aggregates the oracle computes from
   * the SOURCE parquet — any byte lost or mangled in the ORC hop moves
   * the checksum (the `source_sharded_export` precedent).
   */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Round-trip `df` through ORC under `dir` and return the re-read
    * DataFrame with `df`'s schema — fidelity harness for the gate. */
  def orcRoundTrip(df: DataFrame, dir: String): DataFrame = {
    writeOrc(df, dir)
    readOrc(df.sparkSession, dir, df.schema)
  }
}
