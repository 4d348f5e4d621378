package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-gate job/stage accounting: runs a gate N times warm and prints
 * wall seconds, Spark job count, stage count, and summed task time per
 * run — the diagnostic that tells floor-bound gates (many tiny jobs)
 * from work-bound ones (few jobs, big task totals), which decides
 * whether folding bookkeeping jobs can help at all.
 *
 *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.ProbeJobs \
 *     /root/testdata/sf0.1 graph_cc_incremental 3"
 */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val gate = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-probe-jobs")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty(
              "spark.job.description"))).getOrElse("") + " | " +
            j.stageInfos.map(_.name.takeWhile(_ != '(')).mkString(",")
          jobStart.put(j.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (verbose && s != null) {
            val dt = (System.nanoTime() - s._1) / 1e9
            if (dt > 0.05)
              println(f"  job ${j.jobId}%4d $dt%6.2fs ${s._2.take(140)}")
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      })
    val fn = SparkEntry.queries(gate)
    fn(spark, sfDir).count() // warm (JIT + shared caches)
    Sweep.transientStorage(spark)
    for (i <- 1 to reps) {
      Thread.sleep(500) // let the async listener bus drain
      jobs.set(0); stages.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Sweep.transientStorage(spark)
      Thread.sleep(1500)
      println(f"$gate run$i: $dt%.2fs jobs=${jobs.get()} " +
        f"stages=${stages.get()} taskSec=${taskMs.get() / 1000.0}%.1f")
    }
    // same-JVM trivial-job floor: gate latency ÷ floor is the
    // box-drift-cancelling ratio (the A-B-A control's anchor)
    println(f"trivial_floor: ${Bench.trivialFloor(spark)}%.3f s")
    spark.stop()
  }
}
