package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on
 * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE compact JSON
 * line `{"metric":"total","value":N,"unit":"sec","queries":{...},
 *   "warm_total":...,"nq":...,"sf":...}` as the LAST stdout line.
 *
 * The harness that consumes this output keeps only the tail of the
 * process log, so the final line must stay small: `queries` holds the
 * headline set (the load-bearing / historically slowest gates) and the
 * FULL cold+warm per-query detail goes to `bench_detail.json` in the
 * working directory plus an earlier stdout line (for humans reading
 * the full log).
 *
 * Queries are materialised with `.count()` (forces full execution
 * without driver-side result transfer). First a warmup pass on the
 * flagship query amortises session/codegen startup out of the numbers.
 * Each query then runs TWICE: the cold pass (`value`, the
 * round-over-round comparable) and a warm second pass (`warm_total`)
 * that factors out per-query codegen/planning noise — a regression
 * visible in warm numbers is real execution cost, not compilation
 * jitter.
 */
object Bench {
  /** Headline queries for the compact line: every historically-slow or
    * structurally-interesting gate, one per operator family. */
  private val Headline = Seq(
    "ic1_3hop", "ic5_group_2hop", "where_store_q8", "paper_q7",
    "traverse_2hop", "branch_top1_filter", "union_order_limit",
    "dedup_minhash", "dedup_token_jaccard", "neardup_embedding_lsh",
    "ann_topk", "ann_ivf", "graph_components", "graph_pagerank",
    "graph_sssp",
    "curation_top_ngram", "events_stream_window", "events_sessions",
    "multimodal_meta", "text_quality", "hasvalue_any", "group_collect")

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

    // optional comma-separated subset for targeted profiling runs
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def timeAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // free this query's checkpointed intermediates so they can't
        // evict the shared graph/index caches out from under later
        // queries (outside the timer: bookkeeping, not query cost)
        Sweep.transientStorage(spark)
        name -> dt
      }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")

    val cold = timeAll()
    val warm = timeAll()
    val total = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(cold)},"queries_warm":${json(warm)},"warm_total":$warmTotal%.3f,"sf":"$sfDir"}"""
    // full detail: one early stdout line + a file (survives log tailing)
    println(full)
    try {
      val w = new java.io.PrintWriter("bench_detail.json", "UTF-8")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }

    // `queries` carries COLD times (the round-over-round comparable, as
    // in rounds 1-3); warm headline times go under `queries_warm`.
    val coldMap = cold.toMap
    val warmMap = warm.toMap
    val headCold = Headline.filter(coldMap.contains).map(k => k -> coldMap(k))
    val headWarm = Headline.filter(warmMap.contains).map(k => k -> warmMap(k))
    spark.stop() // stop BEFORE the compact line so shutdown noise precedes it
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(headCold)},"queries_warm":${json(headWarm)},"warm_total":$warmTotal%.3f,"nq":${cold.size},"sf":"$sfDir"}""")
  }
}
