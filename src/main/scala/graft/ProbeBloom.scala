package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val evbase = streaming.EventStreamOps.readEvents(
      spark, "/root/testdata/sf0.1/events.parquet")
    val events = (0 until 10).map { i =>
      evbase.select((col("event_id") + lit(i.toLong * 10000000)).as("event_id"),
        col("ts"), (col("user_id") + lit(i.toLong * 100000)).as("user_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _).repartition(32).cache()
    println(s"events=${events.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.1fs rows=$r")
    }
    val hot = events.select(col("user_id").as("uid")).distinct()
      .filter(col("uid") % 20 === 0).cache()
    println(s"hot=${hot.count()}")
    for (i <- 1 to 3) {
      time(s"plainJoin$i")(events.join(hot, col("user_id") === col("uid")).count())
      time(s"bloomJoin$i")(operators.JoinOps.bloomFilteredJoin(events, hot, "user_id", "uid").count())
    }
    spark.stop()
  }
}
