package graft.gremlin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraphStore

/**
 * Posting-list property index — the Spark rendering of the reference's
 * `IndexStore` (`core/index_store.hpp:65-139`: per indexed key a
 * `value → element ids` map, a `count_map` of per-value cardinalities,
 * and a `no_key` set, built by the INDEX expert,
 * `expert/index_expert.hpp:28-145`).
 *
 * Layout per (element type, key):
 *  - postings: an EXPLODED cached DataFrame `(value, <id cols>)`,
 *    repartitioned and sorted by `value` so a value-predicate filter
 *    prunes in-memory columnar batches by their min/max stats instead
 *    of producing one giant `collect_list` row per value (the
 *    low-cardinality-key memory trap).
 *  - counts: the reference's `count_map`, collected to the driver at
 *    BUILD time. Plan-time gating (`get_count_by_predicate`,
 *    `core/index_store.hpp:259-310`) is then a pure map lookup — no
 *    Spark job runs during query compilation.
 *  - noKey: ids whose key is null (serves `hasNot(key)`), plus its
 *    driver-held count.
 *
 * The count map holds one entry per DISTINCT value — the same driver
 * memory the reference's single-node `count_map` uses; postings (the
 * big side) stay distributed.
 */
final class IndexStore {

  final case class Index(postings: DataFrame, noKey: DataFrame,
                         counts: Map[Any, Long], noKeyCount: Long,
                         total: Long) {
    def countFor(pred: Pred): Long = pred match {
      case Pred.Any     => total - noKeyCount
      case Pred.None    => noKeyCount
      case Pred.Eq(v)   => counts.getOrElse(v.value, 0L)
      case Pred.Within(vs) =>
        vs.map(v => counts.getOrElse(v.value, 0L)).sum
      case p => counts.iterator
        .collect { case (value, n) if p.eval(value) => n }.sum
    }
  }

  /** (isVertex, key) -> index */
  private var indexes = Map.empty[(Boolean, String), Index]

  /** Reference gate: use the index only if the matched posting lists
    * cover < 20% of elements (`index_ratio = 0.2`,
    * `IsIndexEnabled`, `core/index_store.hpp:23-58`). */
  val SelectivityGate = 0.2

  def build(graph: GraphStore, isVertex: Boolean, key: String): Unit = {
    val (table, idCols) =
      if (isVertex) (graph.vertices, Seq(col("id")))
      else (graph.edges, Seq(col("src"), col("dst"), col("label")))
    require(table.columns.contains(key), s"no such property: $key")
    val posting = table.filter(col(key).isNotNull)
      .select((col(key).as("value") +: idCols): _*)
      .repartition(col("value"))
      .sortWithinPartitions("value")
      .cache()
    posting.count() // materialise now, like the INDEX expert barrier
    val noKey = table.filter(col(key).isNull)
      .select(idCols: _*).cache()
    val counts = posting.groupBy(col("value"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val noKeyCount = noKey.count()
    val total = counts.valuesIterator.sum + noKeyCount
    // release the replaced index's cached blocks only AFTER the new one
    // materialized — a failed rebuild must not leave a registered index
    // serving uncached postings
    indexes.get((isVertex, key)).foreach { old =>
      old.postings.unpersist(); old.noKey.unpersist()
    }
    indexes += (isVertex, key) -> Index(posting, noKey, counts,
      noKeyCount, total)
  }

  def get(isVertex: Boolean, key: String): Option[Index] =
    indexes.get((isVertex, key))

  def has(isVertex: Boolean, key: String): Boolean =
    indexes.contains((isVertex, key))

  /** Matched-element count for a predicate, if the key is indexed and
    * the predicate passes the selectivity gate; None → use the scan.
    * Pure driver arithmetic — never runs a job (the reference's
    * IsIndexEnabled + get_count_by_predicate at parse time). */
  def admissibleCount(isVertex: Boolean, key: String,
                      pred: Pred): Option[Long] =
    get(isVertex, key).flatMap { idx =>
      val count = idx.countFor(pred)
      if (count >= idx.total * SelectivityGate) None else Some(count)
    }

  /** Element frontier for a folded predicate: the exploded postings
    * filtered by the predicate (or the no-key set for hasNot). */
  def frontier(isVertex: Boolean, key: String, pred: Pred): DataFrame = {
    val idx = indexes((isVertex, key))
    pred match {
      case Pred.None => idx.noKey
      case p => idx.postings.filter(p(col("value")))
        .drop("value")
    }
  }
}
