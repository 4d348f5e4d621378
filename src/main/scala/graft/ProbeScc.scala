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
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("graph_scc")(spark, sf).count()
      println(f"pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      Sweep.transientStorage(spark)
    }
  }
}
