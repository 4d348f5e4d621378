package graft.operators

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraphStore

/**
 * Iterative graph algorithms over a [[GraphStore]] via GraphX/Pregel.
 *
 * The reference's `repeat()` step is degenerate (executes its body
 * exactly once, `expert/repeat_expert.hpp:12-46`); real iterative
 * traversal — reachability, components, centrality — is exactly what
 * Spark's Pregel API exists for, so these are exposed as first-class
 * operators instead of bolting loops onto the step compiler. RDD usage
 * is confined to this module (GraphX is an RDD API); inputs and outputs
 * are DataFrames.
 */
object GraphAlgos {

  private def toGraphX(g: GraphStore): XGraph[Unit, Unit] = {
    val vs = g.vertices.select(col("id")).rdd.map(r => (r.getLong(0), ()))
    val es = g.edges.select(col("src"), col("dst")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    // iterative algorithms re-read the graph every superstep — without
    // caching, each iteration re-runs the DataFrame scans
    XGraph(vs, es).cache()
  }

  /** Connected components (undirected): `(id, component)` where
    * component = smallest vertex id in the component. */
  def connectedComponents(g: GraphStore): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    toGraphX(g).connectedComponents().vertices
      .toDF("id", "component")
  }

  /** PageRank to `tol` convergence: `(id, rank)`. */
  def pageRank(g: GraphStore, tol: Double = 1e-4,
               resetProb: Double = 0.15): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    toGraphX(g).pageRank(tol, resetProb).vertices
      .toDF("id", "rank")
  }

  /** Single-source shortest hop counts (directed), Pregel:
    * `(id, distance)` for reachable vertices. */
  def shortestHops(g: GraphStore, source: Long): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val init = toGraphX(g).mapVertices((id, _) =>
      if (id == source) 0.0 else Double.PositiveInfinity)
    val res = init.pregel(Double.PositiveInfinity)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr + 1.0 < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + 1.0))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Double.PositiveInfinity)
      .map { case (id, d) => (id, d.toLong) }
      .toDF("id", "distance")
  }
}
