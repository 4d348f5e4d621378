package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.GraphStore
object CCDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled","false")
      .config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = GraphStore.modern(spark)
    def undirected(e: DataFrame) = e.select(col("u"),col("v")).union(e.select(col("v").as("u"),col("u").as("v")))
    def minNeighbor(e: DataFrame) = undirected(e).groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"),col("mn")).as("m"))
    def star(e: DataFrame, large: Boolean) = {
      val m = minNeighbor(e); val all = undirected(e)
      val linked = if (large) all.filter(col("v")>col("u")).join(m,"u").select(col("v").as("u"),col("m").as("v"))
        else all.filter(col("v")<=col("u")).join(m,"u").select(col("v").as("u"),col("m").as("v")).union(m.select(col("u"),col("m").as("v")))
      linked.filter(col("u")=!=col("v")).distinct()
    }
    var edges = g.edges.select(col("src").as("u"),col("dst").as("v")).filter(col("u")=!=col("v")).distinct().cache()
    for (round <- 1 to 5) {
      println(s"CCDBG entering round $round at ${System.currentTimeMillis()}")
      val next = star(star(edges, large=true), large=false).cache()
      val cnt = next.count()
      println(s"CCDBG round $round done: edges=$cnt")
      edges.unpersist(); edges = next
    }
    spark.stop()
  }
}
