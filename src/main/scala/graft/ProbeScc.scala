package graft

import org.apache.spark.sql.SparkSession

/** In-JVM steady-state probe for the graph_scc gate (the bench
  * cold-pass policy: judge iterative-gate perf from repeated in-JVM
  * passes, never one cold run). */
object ProbeScc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(sys.env.getOrElse("GRAFT_PROBE_MASTER", "local[16]"))
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_PROBE_PARTS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    for (i <- 1 to 5) {
      // phase split: the gate = ring-fixture derivation + SCC loop
      val g0 = graft.sources.GraphStore.tpch(spark, sf)
      val t0 = System.nanoTime()
      jobs.set(0)
      val rings = operators.GraphAlgos.successorRings(
        graft.sources.GraphStore(g0.vertices,
          g0.edges.filter(org.apache.spark.sql.functions.col("dst")
            % 40 === 0)),
        label = "contains", ringLen = 4)
      val nr = rings.count()
      val t1 = System.nanoTime()
      val jr = jobs.get()
      val n = SparkEntry.queries("graph_scc")(spark, sf).count()
      val t2 = System.nanoTime()
      println(f"pass $i: rings ${(t1 - t0) / 1e9}%.2f s ($jr jobs, " +
        f"$nr edges) | gate ${(t2 - t1) / 1e9}%.2f s " +
        f"(${jobs.get() - jr} jobs) rows=$n")
      Sweep.transientStorage(spark)
    }
  }
}
