package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the composite incremental-state gates (the
  * steady-table heads): replays each gate's phases with per-phase
  * wall / job / stage / task accounting, so optimization effort lands
  * on the phase that actually carries the time.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProbePhases \
  *     /root/testdata/sf0.1 refit 3"
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "refit"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-probe-phases")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) {
            tasks.incrementAndGet()
            taskMs.addAndGet(t.taskInfo.duration); ()
          }
      })
    def phase(label: String)(f: => Unit): Unit = {
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"  $label%-12s $dt%6.2fs jobs=${jobs.get()}%-3d " +
        f"stages=${stages.get()}%-3d tasks=${tasks.get()}%-4d " +
        f"taskSec=${taskMs.get() / 1000.0}%.1f")
    }
    val ops = graft.operators.SimilarityOps
    val ga = graft.operators.GraphAlgos
    def runRefit(): Unit = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10)
      val state = SparkEntry.freshStateDir("graft_probe_refit")
      phase("ingest1")(ops.ivfIncremental(
        e.filter(col("vec_id") < 300), state, kCells = 8).count())
      phase("ingest2")(ops.ivfIncremental(
        e.filter(col("vec_id") >= 300), state).count())
      phase("refit")(ops.ivfRefit(spark, state, kCells = 16))
      phase("query")(ops.recallAtK(
        ops.ivfIncrementalTopK(q, state, nprobe = 8, k = 5),
        ops.bruteForceTopK(q, e, k = 5), k = 5, floor = 1).count())
    }
    def runCcComp(): Unit = {
      val g0 = sources.GraphStore.tpch(spark, sfDir)
      val sub = g0.edges
        .filter(col("label") === "placed" || col("quantity") >= 52.0)
        .select(col("src"), col("dst")).localCheckpoint()
      val state = SparkEntry.freshStateDir("graft_probe_ccc")
      phase("ingest1")(ga.ccIncremental(
        sub.filter(pmod(col("src") + col("dst"), lit(3)) === 0), state)
        .count())
      phase("ingest2")(ga.ccIncremental(
        sub.filter(pmod(col("src") + col("dst"), lit(3)) === 1), state)
        .count())
      phase("compact")(ga.ccCompact(spark, state))
      phase("ingest3")(ga.ccIncremental(
          sub.filter(pmod(col("src") + col("dst"), lit(3)) === 2), state)
        .groupBy(col("component").as("root"))
        .agg(count(lit(1)).as("size")).count())
    }
    def runFit(): Unit = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val VE = graft.functions.VectorExpressions
      VE.register(spark)
      val vecs = e.select(col("vec_id").as("__id"),
        col("embedding").as("__v"))
        .dropDuplicates("__id", "__v").cache()
      phase("sample")(vecs
        .orderBy(md5(concat(lit("ivf:"), col("__id").cast("string"))))
        .limit(128).collect())
      val cents = Array.tabulate(16)(i =>
        Array.tabulate(64)(j => (i * 64 + j).toDouble / 1024.0))
      val bc = spark.sparkContext.broadcast(
        cents.map(c => (c, c.map(x => x * x).sum)))
      for (i <- 1 to 3)
        phase(s"meansOld$i")(vecs
          .select(VE.nearestCellBc(col("__v"), bc).as("__cell"),
            posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy("__cell", "__pos").agg(avg(col("__x")).as("__m"))
          .collect())
      for (i <- 1 to 3)
        phase(s"meansNew$i")(vecs
          .select(VE.nearestCellBc(col("__v"), bc).as("__cell"),
            col("__v"))
          .select(col("__cell"),
            posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy("__cell", "__pos").agg(avg(col("__x")).as("__m"))
          .collect())
      phase("noexplode")(vecs
        .select(VE.nearestCellBc(col("__v"), bc).as("__cell"))
        .groupBy("__cell").agg(count(lit(1))).collect())
      phase("plaincount")(vecs.groupBy().count().collect())
      bc.unpersist()
      vecs.unpersist()
    }
    def runFitPlan(): Unit = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val VE = graft.functions.VectorExpressions
      VE.register(spark)
      val vecs = e.select(col("vec_id").as("__id"),
        col("embedding").as("__v"))
        .dropDuplicates("__id", "__v").cache()
      vecs.count()
      val cents = Array.tabulate(16)(i =>
        Array.tabulate(64)(j => (i * 64 + j).toDouble / 1024.0))
      val bc = spark.sparkContext.broadcast(
        cents.map(c => (c, c.map(x => x * x).sum)))
      val means = vecs
        .select(VE.nearestCellBc(col("__v"), bc).as("__cell"), col("__v"))
        .select(col("__cell"),
          posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos").agg(avg(col("__x")).as("__m"))
      means.collect()
      println(means.queryExecution.executedPlan.toString)
      bc.unpersist(); vecs.unpersist()
    }
    def run(): Unit = which match {
      case "refit" => runRefit()
      case "cc" => runCcComp()
      case "fit" => runFit()
      case "fitplan" => runFitPlan()
      case other => sys.error(s"unknown probe: $other")
    }
    run() // warm
    Sweep.transientStorage(spark)
    for (i <- 1 to reps) {
      println(s"$which rep $i:")
      run()
      Sweep.transientStorage(spark)
    }
    spark.stop()
  }
}
