package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on
 * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line
 * `{"metric":"total","value":N,"unit":"sec","queries":{...},
 *   "queries_warm":{...},"warm_total":...,"sf":...}`.
 *
 * Queries are materialised with `.count()` (forces full execution
 * without driver-side result transfer). First a warmup pass on the
 * flagship query amortises session/codegen startup out of the numbers.
 * Each query then runs TWICE: the cold pass (`queries`/`value`, the
 * round-over-round comparable) and a warm second pass
 * (`queries_warm`) that factors out per-query codegen/planning noise —
 * a regression visible in warm numbers is real execution cost, not
 * compilation jitter.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM/codegen/parquet-footer costs land here, not in timings
    SparkEntry.queries.get("traverse_2hop").foreach { fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    def timeAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")

    val cold = timeAll()
    val warm = timeAll()
    val total = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(cold)},"queries_warm":${json(warm)},"warm_total":$warmTotal%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
