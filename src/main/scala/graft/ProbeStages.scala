package graft

import org.apache.spark.sql.SparkSession

/**
 * Stage-level accounting for one gate: aggregates task COUNT and
 * summed task time per stage callsite over one warm run — the
 * diagnostic that tells which operator's stages carry the task-wave
 * overhead when a gate's summed task time dwarfs its wall time
 * (per-task floor × tasks, not payload). Sorted by summed task time.
 *
 *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProbeStages \
 *     /root/testdata/sf0.1 ann_recall_ivf_refit"
 */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val gate = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-probe-stages")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val agg = new java.util.concurrent.ConcurrentHashMap[String,
      (Long, Long, Long)]() // name -> (stages, tasks, taskMs)
    val stageNames =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = {
          // attribute AQE-materialized stages to the first graft frame
          // in the submission stack, not the generic future callsite
          val graftFrame = s.stageInfo.details.linesIterator
            .map(_.trim)
            .find(l => l.startsWith("graft.") &&
              !l.contains("ProbeStages") && !l.contains("graft.Sweep"))
            .map(_.replaceAll("\\$anonfun\\$|\\(.*?\\)", " ").trim)
            .getOrElse("")
          val n = s.stageInfo.name.takeWhile(_ != '(').trim +
            (if (graftFrame.nonEmpty) s"  [$graftFrame]" else "")
          stageNames.put(s.stageInfo.stageId, n)
          agg.merge(n, (1L, 0L, 0L), (a, b) =>
            (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) {
            val n = stageNames.getOrDefault(t.stageId, "?")
            agg.merge(n, (0L, 1L, t.taskInfo.duration), (a, b) =>
              (a._1 + b._1, a._2 + b._2, a._3 + b._3))
          }
      })
    val fn = SparkEntry.queries(gate)
    fn(spark, sfDir).count() // warm
    Sweep.transientStorage(spark)
    Thread.sleep(1000)
    agg.clear(); stageNames.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Sweep.transientStorage(spark)
    Thread.sleep(1500) // listener bus drain
    import scala.jdk.CollectionConverters._
    val rows = agg.asScala.toSeq.sortBy(-_._2._3)
    println(f"$gate wall=$dt%.2fs")
    rows.foreach { case (n, (st, tk, ms)) =>
      println(f"  ${ms / 1000.0}%8.1fs tasks=$tk%-5d stages=$st%-4d $n")
    }
    println(f"  TOTAL taskSec=${rows.map(_._2._3).sum / 1000.0}%.1f " +
      f"tasks=${rows.map(_._2._2).sum} stages=${rows.map(_._2._1).sum}")
    spark.stop()
  }
}
