package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** In-JVM steady-state profile for the ann_pq / ann_recall_pq watch
  * item (VERDICT r9): per pass, wall seconds AND the Spark job count —
  * the decomposition that separates "the chain got slower" (job count
  * grew) from "the box's per-job floor got slower" (count flat, floor
  * up). The per-JVM trivial-job floor is measured in the same process
  * so the two are directly comparable. PQ models are cached per
  * (session, sfDir) — pass 1 pays the Lloyd fit, steady passes profile
  * pqTopK alone, exactly what the bench steady series times. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_PROBE_MASTER", "local[16]"))
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PROBE_PARTS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def floor(): Double = {
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(1 to 16, 16).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"trivial_job_floor_cold: ${floor()}%.3f s")
    for (name <- Seq("ann_pq", "ann_recall_pq")) {
      for (i <- 1 to 6) {
        jobs.set(0)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sf).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name pass $i: $dt%.3f s jobs=${jobs.get()} rows=$n")
        Sweep.transientStorage(spark)
      }
    }
    println(f"trivial_job_floor_warm: ${floor()}%.3f s")
  }
}
