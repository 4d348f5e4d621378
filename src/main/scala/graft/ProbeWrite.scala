package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the partitioned-write floor: times the hive-bucket
  * write shapes the StateStore operators use (64-dir partitionBy from
  * various widths, plain single file) on gate-scale rows, so the
  * per-FILE vs per-TASK vs committer split is measured, not guessed. */
object ProbeWrite {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-probe-write")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 2000
    val df = spark.range(n.toLong).select(col("id"),
      pmod(xxhash64(col("id")), lit(64L)).cast("int").as("__bk"))
      .localCheckpoint()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }
    val base = s"/tmp/probe_write_${ProcessHandle.current().pid()}"
    time("partitionBy64 width32") {
      df.repartition(32, col("__bk")).write.partitionBy("__bk")
        .mode("overwrite").parquet(s"$base/a")
    }
    time("partitionBy64 width8") {
      df.repartition(8, col("__bk")).write.partitionBy("__bk")
        .mode("overwrite").parquet(s"$base/b")
    }
    time("partitionBy64 width1") {
      df.repartition(1).write.partitionBy("__bk")
        .mode("overwrite").parquet(s"$base/c")
    }
    time("plain width32") {
      df.repartition(32).write.mode("overwrite").parquet(s"$base/d")
    }
    time("plain 1file") {
      df.coalesce(1).write.mode("overwrite").parquet(s"$base/e")
    }
    time("sorted-bucket 1file") {
      df.repartition(1).sortWithinPartitions("__bk").write
        .mode("overwrite").parquet(s"$base/f")
    }
    StateStore2.delete(base)
    spark.stop()
  }
  private object StateStore2 {
    def delete(path: String): Unit =
      graft.operators.StateStore.delete(path)
  }
}
