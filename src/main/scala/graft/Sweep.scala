package graft

import org.apache.spark.sql.SparkSession

/**
 * Deterministic release of transient per-query storage.
 *
 * Several operators pin self-joined intermediates with a LAZY
 * `localCheckpoint` (LSH signature sets, AllPairs prefix postings,
 * branch-filter frontiers): the blocks must stay alive while the query's
 * DataFrame is in use, but nothing frees them when the query is done —
 * Spark's ContextCleaner only unpersists them after a driver GC proves
 * the RDD unreachable, and on a large heap full GCs can lag minutes
 * behind allocation. In a long single-session sweep (bench, verify) the
 * dead checkpoint blocks pile up in the unified memory region and evict
 * the long-lived graph/index caches, so later queries silently rebuild
 * them (observed: ~2x cold-pass degradation across a 101-query sweep on
 * an 8g heap before this sweep existed).
 *
 * `transientStorage` frees exactly the locally-checkpointed RDDs:
 * long-lived `cache()`d tables (graph, index postings) are CacheManager
 * entries, not checkpoints, and are never touched.
 *
 * SAFETY: call only AFTER the query's results are fully materialized and
 * from a single-threaded driver loop. A locally-checkpointed RDD cannot
 * recompute (its lineage is truncated by design), so sweeping while
 * another query is in flight would fail that query. Concurrent servers
 * (Emu) must NOT call this; they rely on
 * `spark.cleaner.periodicGC.interval`, which is reachability-safe.
 */
object Sweep {
  /** Unpersist every locally-checkpointed RDD registered in the context.
    * Returns the number of RDDs released. */
  def transientStorage(spark: SparkSession): Int = {
    val doomed = spark.sparkContext.getPersistentRDDs.values
      .filter(org.apache.spark.rdd.RddIntrospection.isLocallyCheckpointed)
      .toSeq
    doomed.foreach(_.unpersist(blocking = false))
    doomed.size
  }
}
