package graft.gremlin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraphStore

/**
 * Posting-list property index — the Spark rendering of the reference's
 * `IndexStore` (`core/index_store.hpp:65-139`: `value → sorted set of
 * element ids` per indexed key, built by the INDEX expert,
 * `expert/index_expert.hpp:28-145`).
 *
 * Here an index is a cached two-column DataFrame `(value, ids:
 * array<long>)` grouped from the element table. A leading
 * `has(key, eq(v))` / `has(key, within(...))` after `g.V()` can then
 * seed the traversal from the exploded posting list instead of scanning
 * the vertex table — useful when the predicate is selective and the
 * table scan (even with Parquet pushdown) would still read every
 * row-group. Mirrors the parser's index fold (`core/parser.cpp:991-1030`)
 * including its selectivity gate (`index_ratio`, `core/parser.hpp:43-46`).
 */
final class IndexStore {

  /** (isVertex, key) -> (posting DF, total element count) */
  private var indexes =
    Map.empty[(Boolean, String), (DataFrame, Long)]

  /** Reference gate: use the index only if the matched posting lists
    * cover < 20% of elements (`index_ratio = 0.2`). */
  val SelectivityGate = 0.2

  def build(graph: GraphStore, isVertex: Boolean, key: String): Unit = {
    val (table, idCols) =
      if (isVertex) (graph.vertices, Seq(col("id")))
      else (graph.edges, Seq(col("src"), col("dst")))
    require(table.columns.contains(key), s"no such property: $key")
    val posting =
      if (isVertex)
        table.filter(col(key).isNotNull)
          .groupBy(col(key).as("value"))
          .agg(sort_array(collect_list(col("id"))).as("ids"))
      else
        table.filter(col(key).isNotNull)
          .groupBy(col(key).as("value"))
          .agg(sort_array(collect_list(struct(col("src"), col("dst"))))
            .as("ids"))
    val cached = posting.cache()
    cached.count() // materialise now, like the INDEX expert barrier
    indexes += (isVertex, key) -> ((cached, table.count()))
  }

  def get(isVertex: Boolean, key: String): Option[(DataFrame, Long)] =
    indexes.get((isVertex, key))

  def has(isVertex: Boolean, key: String): Boolean =
    indexes.contains((isVertex, key))

  /** Vertex-id frontier for `key ∈ values`, if the index exists and
    * passes the selectivity gate; None → fall back to the scan. */
  def lookupVertices(key: String, values: Seq[Any]): Option[DataFrame] =
    get(isVertex = true, key).flatMap { case (posting, total) =>
      val matched = posting.filter(col("value").isin(values: _*))
      val cover = matched.agg(sum(size(col("ids")))).collect()
        .head.getAs[Any](0) match {
          case null => 0L
          case n: Number => n.longValue()
        }
      if (cover >= total * SelectivityGate) None
      else Some(matched.select(explode(col("ids")).as("id")))
    }
}
