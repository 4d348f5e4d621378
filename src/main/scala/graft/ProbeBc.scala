package graft
import org.apache.spark.sql.SparkSession
object ProbeBc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = sources.GraphStore.tpch(spark, "/root/testdata/sf0.1")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = operators.GraphAlgos.betweenness(g, nLandmarks = 4, maxDepth = 3).count()
      println(f"bc$i: ${(System.nanoTime()-t0)/1e9}%.1fs rows=$n")
    }
    spark.stop()
  }
}
