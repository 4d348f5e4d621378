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
 * Unlike the reference's single-node `count_map` (one entry per
 * DISTINCT value — O(cardinality) driver memory, fine at its scale,
 * fatal for an index on a unique key over 100 TB), the driver map here
 * is BOUNDED: when cardinality exceeds [[IndexStore.ExactMapCap]] only
 * heavy hitters (count >= total/[[IndexStore.HeavyHitterDenom]], hence
 * at most ~HeavyHitterDenom entries) are collected, plus two residual
 * scalars (sum and max count of the light tail). `countFor` then
 * returns an UPPER BOUND for values absent from the map — an
 * overestimate can only make the selectivity gate more conservative
 * (fall back to the scan), never produce a wrong result; a value below
 * the heavy-hitter threshold is by construction far below the 20% gate,
 * so point lookups on high-cardinality keys stay index-admissible.
 * Postings (the big side) stay distributed either way.
 */
final class IndexStore {
  import IndexStore.{ExactMapCap, HeavyHitterDenom}

  /** @param counts    exact per-value counts (all values if cardinality
    *                  <= ExactMapCap, else heavy hitters only)
    * @param residualTotal summed count of values NOT in `counts` (0 on
    *                  the exact path)
    * @param residualMax   largest single-value count absent from
    *                  `counts` — the per-value upper bound */
  final case class Index(postings: DataFrame, noKey: DataFrame,
                         counts: Map[Any, Long], noKeyCount: Long,
                         total: Long, residualTotal: Long,
                         residualMax: Long) {
    private def boundFor(v: Any): Long =
      counts.getOrElse(v, if (residualTotal > 0) residualMax else 0L)
    /** Upper bound on elements matching `pred` (exact when the full
      * value map fit the driver cap). */
    def countFor(pred: Pred): Long = pred match {
      case Pred.Any     => total - noKeyCount
      case Pred.None    => noKeyCount
      case Pred.Eq(v)   => boundFor(v.value)
      case Pred.Within(vs) =>
        math.min(vs.map(v => boundFor(v.value)).sum,
                 counts.valuesIterator.sum + residualTotal)
      case p => counts.iterator
        .collect { case (value, n) if p.eval(value) => n }.sum +
        residualTotal // residual values are invisible to p: assume all match
    }
  }

  /** (isVertex, key) -> index. @volatile: read by concurrent serving
    * threads (Server/Emu) that must observe a completed build; the
    * read-modify-write in [[build]] is additionally serialized by
    * `buildLock` so two concurrent BuildIndex DDLs cannot lose one
    * another's entry (the map itself stays an immutable snapshot, so
    * readers are never locked). */
  @volatile private var indexes = Map.empty[(Boolean, String), Index]
  private val buildLock = new Object

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
    val grouped = posting.groupBy(col("value"))
      .agg(count(lit(1)).as("n"))
    // one distributed pass for (distinct, sum) decides exact vs bounded
    val statsRow = grouped.agg(
      count(lit(1)).as("distinct"),
      coalesce(sum(col("n")), lit(0L)).as("tot")).head()
    val (distinctVals, nonNullTotal) =
      (statsRow.getLong(0), statsRow.getLong(1))
    val (counts, residualTotal, residualMax) =
      if (distinctVals <= ExactMapCap) {
        val m = grouped.collect().map(r => r.get(0) -> r.getLong(1)).toMap
        (m, 0L, 0L)
      } else {
        // heavy hitters: at most ~HeavyHitterDenom entries by pigeonhole
        val threshold = math.max(2L, nonNullTotal / HeavyHitterDenom)
        val heavy = grouped.filter(col("n") >= threshold).collect()
          .map(r => r.get(0) -> r.getLong(1)).toMap
        val resRow = grouped.filter(col("n") < threshold).agg(
          coalesce(sum(col("n")), lit(0L)),
          coalesce(max(col("n")), lit(0L))).head()
        (heavy, resRow.getLong(0), resRow.getLong(1))
      }
    val noKeyCount = noKey.count()
    val total = nonNullTotal + noKeyCount
    // release the replaced index's cached blocks only AFTER the new one
    // materialized — a failed rebuild must not leave a registered index
    // serving uncached postings. The swap is locked: concurrent DDLs
    // from different serving connections each land their entry.
    buildLock.synchronized {
      indexes.get((isVertex, key)).foreach { old =>
        old.postings.unpersist(); old.noKey.unpersist()
      }
      indexes += (isVertex, key) -> Index(posting, noKey, counts,
        noKeyCount, total, residualTotal, residualMax)
    }
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

object IndexStore {
  /** Cardinality up to which the full value→count map is collected
    * exactly (the reference's count_map semantics, bounded). */
  val ExactMapCap = 4096L
  /** Above the cap, collect values with count >= total/this — caps the
    * driver map at ~this many entries regardless of cardinality. */
  val HeavyHitterDenom = 1000L
}
