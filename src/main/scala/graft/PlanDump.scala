package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-audit main: writes `.explain("formatted")` for every (or a
 * filtered subset of) `SparkEntry.queries` gate to one file per gate
 * under an output directory, plus a one-line-per-gate red-flag summary
 * to stdout — Exchange count, join strategies, cartesian/BNLJ
 * presence, Window presence, scans whose `PushedFilters` is empty.
 * The optimization-round measurement face (guide §1: capture the plan
 * shape before and after every change).
 *
 *   sbt "runMain graft.PlanDump /root/testdata/sf0.01 /root/repo/plans/r13/audit [gate,gate]"
 *
 * Eager gates (incremental state ingests, the repeat() driver loop)
 * run their plan-time jobs against fresh state dirs, exactly as a
 * bench invocation would; the dumped plan is the final returned
 * frame's.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val line =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/$name.txt", "UTF-8")
          try w.println(plan) finally w.close()
          val exchanges = "\\bExchange\\b".r.findAllIn(plan).size
          val smj = "SortMergeJoin".r.findAllIn(plan).size
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
          val shj = "ShuffledHashJoin".r.findAllIn(plan).size
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
          val cart = "CartesianProduct".r.findAllIn(plan).size
          val win = "\\bWindow\\b".r.findAllIn(plan).size
          // scans with an empty PushedFilters list
          val unpushed = "PushedFilters: \\[\\]".r.findAllIn(plan).size
          val scans = "Scan parquet".r.findAllIn(plan).size
          f"$name%-36s ex=$exchanges%-3d smj=$smj%-2d bhj=$bhj%-2d " +
            f"shj=$shj%-2d bnlj=$bnlj%-2d cart=$cart%-2d win=$win%-2d " +
            f"scans=$scans%-2d nofilter=$unpushed%-2d"
        } catch {
          // NonFatal only (advice r13): a VM error (OOM, linkage) must
          // abort the sweep — later gates' committed plan lines can't
          // be trusted after one
          case scala.util.control.NonFatal(e) =>
            f"$name%-36s ERROR ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(120)
        }
      println(line)
      Sweep.transientStorage(spark)
    }
    spark.stop()
  }
}
