package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * "No silent caps": operators that bound their work (e.g.
 * [[DedupOps.minhashLsh]]'s band-bucket cap) report what they dropped
 * through `Dataset.observe` — the metrics ride along with whatever
 * action finally executes the query (zero extra jobs, unlike a separate
 * count), and a per-session [[QueryExecutionListener]] logs any nonzero
 * drop counts. The latest observed values are also kept in memory so
 * tests and callers can assert on them.
 */
object CapMetrics {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  // weak keys: a stopped SparkSession must stay collectable even though
  // its listener was registered through us
  private val sessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private val nameCounter = new AtomicLong()
  /** op -> last observed metric row. Diagnostics-grade: with concurrent
    * invocations of the same operator the last writer wins. */
  private val lastObserved =
    new ConcurrentHashMap[String, Map[String, Any]]()

  /** Attach observed metrics under a fresh `graft.cap.<op>.<n>` name
    * (observation names must be unique within a query) and make sure
    * the session has the logging listener. */
  def observe(df: DataFrame, op: String, firstMetric: Column,
              metrics: Column*): DataFrame = {
    ensureListener(df.sparkSession)
    val name = s"graft.cap.$op.${nameCounter.incrementAndGet()}"
    df.observe(name, firstMetric, metrics: _*)
  }

  /** Last observed metric row for an operator (any invocation), keyed
    * by metric column name. Empty until an action has run — listener
    * delivery is ASYNC, so callers that just ran an action should use
    * [[await]]. */
  def last(op: String): Map[String, Any] =
    lastObserved.getOrDefault(op, Map.empty)

  /** Poll until `last(op)` satisfies `cond` or `timeoutMs` elapses
    * (QueryExecutionListener events arrive on a background bus). */
  def await(op: String, timeoutMs: Long = 10000)
           (cond: Map[String, Any] => Boolean): Map[String, Any] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var m = last(op)
    while (!cond(m) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      m = last(op)
    }
    m
  }

  private def ensureListener(spark: SparkSession): Unit = {
    if (sessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.cap.")) {
              val vals = row.schema.fieldNames
                .zip(row.toSeq).toMap
              val op = name.split('.')(2)
              lastObserved.put(op, vals)
              val dropped = vals.collect {
                case (k, v: Long) if k.contains("capped") && v > 0 => (k, v)
              }
              if (dropped.nonEmpty)
                log.warn(s"$name: capped work dropped — $vals")
            }
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }
  }
}
