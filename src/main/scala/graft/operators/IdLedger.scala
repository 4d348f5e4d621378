package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-increment ID ledger for [[StateStore]] ingests whose re-present
 * detection keys on a single long id column — the
 * [[GraphAlgos.ccIncremental]] edge-ledger pattern (r12) one organ
 * smaller (verdict r12 #1: both incremental-ANN ingests anti-joined
 * every drop against the FULL archive id column, the exact disease cc
 * was cured of). Each increment dir persists two ledger tables next
 * to the operator's own data:
 *
 *  - `ids`: the increment's ids as narrow 8-byte rows,
 *    hive-partitioned by `__ib = xxhash64(id) mod buckets`, so the
 *    exact-verify read partition-prunes to the touched buckets;
 *  - `idbloom`: one row — bloom bytes over the increment's id hashes
 *    plus the per-state sizing, persisted at FIRST ingest and read
 *    back by every later one (callers' parameters only size a NEW
 *    state).
 *
 * An ingest OR-folds the committed dirs' blooms (bytes × dirs — one
 * trivial driver job), splits the drop into the bloom-NEGATIVE rows
 * (blooms never false-negative, so these are *definitely* new and
 * ingest with ZERO archive I/O) and the bloom-positive tail
 * (re-presents + the ~1e-5 FP rate), and only that tail exact-verifies
 * against the bucket-pruned archive `ids` read. A fresh nightly drop
 * therefore never touches the id history — the ingest cost tracks the
 * drop, not the archive.
 *
 * [[StateStore.compact]] folds ledger dirs with plain union semantics:
 * blooms OR-fold across rows (associative), the `ids` union keeps its
 * hive layout through compact's partition-preserving rewrite.
 */
private[graft] object IdLedger {
  /** Defaults mirror the cc edge ledger's (`GraphAlgos.CcLedgerBuckets`
    * rationale): 64 buckets keeps per-increment file counts sane while
    * a handful of FP ids open ≈ that many bucket dirs; 2^25 bloom bits
    * (4 MiB) hold ~3M ids per state at ~1e-5 FP with 5 hashes. Size to
    * the expected ARCHIVE id count via the owning operator's params. */
  val Buckets = 64
  val BloomBits = 1 << 25
  val BloomHashes = 5

  private def hasTable(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** OR-folded bloom bytes + the persisted per-state sizing of the
    * committed dirs (one job; bytes × dirs reach the driver). A dir
    * missing `idbloom` is a pre-ledger (r12-format) state: fail with
    * the migration path rather than a raw path-not-found. */
  private def meta(spark: SparkSession,
                   dirs: Seq[String]): (Array[Byte], Int, Int) = {
    val missing = dirs.filterNot(d => hasTable(spark, s"$d/idbloom"))
    require(missing.isEmpty,
      s"pre-ledger state (no idbloom table) under ${missing.mkString(", ")}: " +
        "this state predates the per-increment id ledger — rebuild it " +
        "with the operator's ledgerRebuild compaction (or re-ingest " +
        "into a fresh state)")
    val rows = spark.read.parquet(dirs.map(_ + "/idbloom"): _*).collect()
    val folded = rows.map(_.getAs[Array[Byte]]("__bloom"))
      .reduce((a, b) =>
        Array.tabulate(a.length)(i => (a(i) | b(i)).toByte))
    (folded, rows.head.getAs[Int]("buckets"),
      rows.head.getAs[Int]("bloom_bits"))
  }

  /** The archive-id read of an ingest's exact-verify, PRUNED to the
    * given hash buckets — exposed for the plan-guard spec, which
    * asserts the scan carries partition filters (a fresh drop's
    * bloom-positive tail never opens untouched bucket dirs). Per-root
    * reads + union: multi-root partition inference is unsupported. */
  private[graft] def archiveIds(spark: SparkSession, dirs: Seq[String],
                                touched: Seq[Int]): DataFrame =
    dirs.map(d => spark.read.parquet(s"$d/ids"))
      .reduce(_.unionByName(_))
      .filter(col("__ib").isin(touched.map(Int.box): _*))

  /** Per-state ledger sizing: persisted meta when the state exists,
    * the caller's defaults for a new one. The bloom bytes ride along
    * so [[splitFresh]] folds meta exactly once per ingest. */
  private[graft] def sizing(spark: SparkSession, prior: Seq[String],
                            defBuckets: Int, defBits: Int)
      : (Option[Array[Byte]], Int, Int) =
    if (prior.isEmpty) (None, defBuckets, defBits)
    else { val m = meta(spark, prior); (Some(m._1), m._2, m._3) }

  /** Attach the ledger's hash columns (`__h`, `__ib`) to a drop; the
    * id column must cast to long (the ledger's storage type). */
  private[graft] def withHash(drop: DataFrame, idCol: String,
                              buckets: Int): DataFrame =
    drop.withColumn("__h", xxhash64(col(idCol).cast("long")))
      .withColumn("__ib",
        pmod(col("__h"), lit(buckets.toLong)).cast("int"))

  /** Split a hashed drop (from [[withHash]], CHECKPOINTED by the
    * caller — the split references it three times) into its
    * not-yet-ingested rows: bloom-negative rows pass through with no
    * archive I/O; the bloom-positive tail anti-joins the bucket-pruned
    * archive ids. Returns the drop's columns unchanged (incl. __h /
    * __ib); LAZY — the caller checkpoints + isEmpty-probes. */
  private[graft] def splitFresh(hashed: DataFrame, idCol: String,
                                prior: Seq[String],
                                bloom: Option[Array[Byte]],
                                bloomBits: Int): DataFrame = {
    if (prior.isEmpty) return hashed
    val spark = hashed.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom.get)
    val inBloom = graft.functions.VectorExpressions.bloomContainsBc(
      col("__h"), bloomBc, bloomBits, BloomHashes)
    val definiteNew = hashed.filter(!inBloom)
    val maybeOld = hashed.filter(inBloom)
    // touched buckets of the POSITIVE subset only — bounded by the
    // bucket count, a constant-size driver hop
    val touched = maybeOld.select(col("__ib")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) definiteNew
    else definiteNew.unionByName(
      maybeOld.join(archiveIds(spark, prior, touched)
          .select(col("vec_id").as("__lid")),
        maybeOld(idCol).cast("long") === col("__lid"), "left_anti"))
  }

  /** Persist the increment's ledger tables under `dir`. `fresh` must
    * carry `__h`/`__ib` from [[withHash]] and be the exact
    * materialized rows the operator's own table write persists (same
    * checkpointed RDD), so no-false-negative vs the ledger holds
    * without re-reading parquet. */
  private[graft] def write(fresh: DataFrame, idCol: String, dir: String,
                           buckets: Int, bloomBits: Int): Unit = {
    val spark = fresh.sparkSession
    fresh.select(col(idCol).cast("long").as("vec_id"), col("__ib"))
      .repartition(col("__ib"))
      .write.partitionBy("__ib").mode("overwrite").parquet(s"$dir/ids")
    val bloom = CurationOps.bloomFromHashes(
      fresh.select(col("__h")), bloomBits, BloomHashes)
    import spark.implicits._
    Seq((bloom, buckets, bloomBits))
      .toDF("__bloom", "buckets", "bloom_bits")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/idbloom")
  }
}
