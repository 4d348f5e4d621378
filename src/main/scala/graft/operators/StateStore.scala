package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Versioned on-disk state for incremental (cross-snapshot) operators —
 * the nightly-crawl shape where band postings / bloom bytes persist
 * between corpus versions and each run processes only the increment.
 *
 * Layout: `root/inc_0`, `root/inc_1`, … — one directory per ingested
 * increment, holding whatever parquet tables the operator stores. A
 * directory counts as ingested only once its `COMMIT` marker exists,
 * written AFTER every table write succeeded; a crash mid-increment
 * leaves an uncommitted directory that the retry simply overwrites
 * (same index, because the index is the count of COMMITTED dirs), so
 * ingest is restart-idempotent. All paths go through the Hadoop
 * FileSystem API, so `root` can live on any cluster filesystem.
 */
object StateStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed increment dirs under `root`, oldest first; empty if the
    * root does not exist yet. */
  def committed(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) Seq.empty
    else f.listStatus(r).toSeq.map(_.getPath)
      .filter(p => p.getName.matches("inc_\\d+") &&
        f.exists(new Path(p, "COMMIT")))
      .sortBy(_.getName.drop(4).toInt)
      .map(_.toString)
  }

  /** Directory for the NEXT increment. Index = committed count, so an
    * uncommitted leftover from a crashed run is overwritten, never
    * skipped — the retry lands on the same index. */
  def nextDir(spark: SparkSession, root: String): String =
    s"$root/inc_${committed(spark, root).size}"

  /** Mark an increment dir ingested (write after all its tables). */
  def commit(spark: SparkSession, dir: String): Unit =
    fs(spark, dir).create(new Path(dir, "COMMIT"), true).close()

  /** Recursively delete a state root (or any path) — the one shared
    * cleanup for gates, probes, and specs, via the same Hadoop FS
    * layer the store reads through (no SparkSession needed, so
    * callers without one can use it too). No-op if absent. */
  def delete(path: String): Unit = {
    val p = new Path(path)
    val f = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (f.exists(p)) { f.delete(p, true); () }
  }
}
