package graft.gremlin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraphStore

/**
 * User-facing entry point: run the reference's Gremlin-subset query
 * strings against a [[GraphStore]].
 *
 * {{{
 *   val g = Graft(GraphStore.modern(spark))
 *   g.df("g.V().hasLabel(\"person\").has(\"age\", gt(27)).values(\"name\")")
 *   g.strings("g.V().count()")   // console-style "=>6" parity output
 * }}}
 *
 * Output schema of [[df]] by final stream type:
 *  - vertices → `id: LONG`
 *  - edges    → `src: LONG, dst: LONG, label: STRING`
 *  - scalars  → `value: <type>`
 *  - group()/groupCount() → `key, values`/`key, count`
 *
 * Replaces the reference's client/master/worker query lifecycle
 * (Grasper `driver/client.cpp`, `driver/worker.hpp:264-347`): parse →
 * reorder → compile → Catalyst. The ZMQ/RDMA plumbing has no Spark
 * analogue to build — `collect()` is the result channel.
 */
final case class Graft(graph: GraphStore) {

  /** Posting-list indexes built by `BuildIndex(...)` DDL. */
  val index = new IndexStore
  /** Runtime toggles set by `SetConfig(...)` DDL — the reference's
    * ConfigExpert switches (`expert/config_expert.hpp:39-59`).
    * `step_reorder` and `indexing` actually gate the optimizer phases
    * below; the scheduling/caching toggles (`caching`, `core_bind`,
    * `stealing`, …) are recorded but subsumed by Catalyst/AQE. */
  @volatile var config: Map[String, String] = Map.empty

  /** A toggle is on unless explicitly set to false/0 (reference default:
    * all optimizations enabled, `utils/config.hpp`). */
  private def enabled(key: String): Boolean =
    !config.get(key).exists(v => v.equalsIgnoreCase("false") || v == "0")

  private val BuildIndexRe =
    """(?i)\s*BuildIndex\s*\(\s*([VE])\s*,\s*['"]([^'"]+)['"]\s*\)\s*""".r
  private val SetConfigRe =
    """(?i)\s*SetConfig\s*\(\s*['"]?([^'",\s]+)['"]?\s*,\s*['"]?([^'")\s]+)['"]?\s*\)\s*""".r

  /** DDL dispatch (reference entry point 2, `core/parser.cpp:75-91`).
    * Returns a status line, or None if `q` is a traversal query. */
  def ddl(q: String): Option[String] = q match {
    case BuildIndexRe(ve, key) =>
      val isV = ve.equalsIgnoreCase("V")
      index.build(graph, isV, key)
      Some(s"Index built for ${ve.toUpperCase}.$key")
    case SetConfigRe(k, v) =>
      config += k -> v
      Some(s"Config $k=$v")
    case _ => None
  }

  /** Parse + reorder + compile; returns the raw compiled result.
    * A leading chain of `has`/`hasLabel` filters with built indexes
    * seeds the frontier from intersected posting lists instead of the
    * table scan — the reference's index fold with its selectivity gate
    * and least-selective eviction (`core/parser.cpp:991-1081`), for
    * vertices AND edges (`expert/init_expert.hpp:199-234`). Gating is
    * pure driver arithmetic over the build-time count map: compiling
    * never runs a Spark job. */
  def compile(query: String): Compiler.Result = {
    val steps = plannedSteps(query)
    steps match {
      case Step.V(Seq()) :: rest if enabled("indexing") =>
        foldIndex(isVertex = true, rest) match {
          case Some((frontier, remaining)) =>
            Compiler.compileSeeded(graph, frontier, remaining)
          case scala.None => Compiler.compile(graph, steps)
        }
      case Step.E() :: rest if enabled("indexing") =>
        foldIndex(isVertex = false, rest) match {
          case Some((frontier, remaining)) =>
            Compiler.compileSeededEdges(graph, frontier, remaining)
          case scala.None => Compiler.compile(graph, steps)
        }
      case _ => Compiler.compile(graph, steps)
    }
  }

  /** Parse + (config-gated) reorder — `SetConfig('step_reorder',
    * 'false')` serves the steps in written order, like the reference's
    * `global_enable_step_reorder`. */
  private[gremlin] def plannedSteps(query: String): List[Step] = {
    val parsed = StepParser.parse(query)
    val reordered = if (enabled("step_reorder")) Reorder(parsed) else parsed
    // multiplicity-insensitivity rewrites (dead-history elimination +
    // early dedup insertion) — `SetConfig('early_dedup','false')` to
    // serve the written shape
    if (enabled("early_dedup")) EarlyDedup(reordered) else reordered
  }

  /** The reference's parser-time index fold (`core/parser.cpp:991-1081`):
    * walk the leading filter chain; each indexed `has(key, pred)` whose
    * matched count passes the selectivity gate AND `count/3 < minCount`
    * folds into the init frontier; when a new fold lowers `minCount`,
    * previously folded predicates with `count/3 >= minCount` are
    * evicted back to ordinary filter steps (`index_ratio = 3`,
    * `core/parser.hpp:43-46`). `hasLabel` folds as a WITHIN predicate
    * on the label key (`parser.cpp:1060-1081`) — selectivity-gated but
    * outside the minCount bookkeeping, like the reference. */
  private[gremlin] def foldIndex(isVertex: Boolean, rest: List[Step])
      : Option[(org.apache.spark.sql.DataFrame, List[Step])] = {
    val IndexRatio = 3L
    val isLeading: Step => Boolean = {
      case _: Step.Has | _: Step.HasKey | _: Step.HasLabel |
           _: Step.HasValue => true
      case _ => false
    }
    val leading = rest.takeWhile(isLeading)
    val tail = rest.drop(leading.length)
    if (leading.isEmpty) return scala.None

    // (key, pred, count, evictable)
    var folded = Vector.empty[(String, Pred, Long, Boolean)]
    var kept = Vector.empty[Step]
    var minCount = Long.MaxValue

    // fold-or-keep one evictable predicate (shared by has and hasKey —
    // the reference encodes hasKey as has(k, ANY))
    def tryFold(key: String, pred: Pred, step: Step): Unit =
      index.admissibleCount(isVertex, key, pred) match {
        case Some(count) if count / IndexRatio < minCount =>
          if (count < minCount) {
            minCount = count
            val (stay, evicted) = folded.partition { case (_, _, c, ev) =>
              !ev || c / IndexRatio < minCount }
            folded = stay
            kept ++= evicted.map(f => Step.Has(f._1, f._2))
          }
          folded :+= ((key, pred, count, true))
        case _ => kept :+= step
      }

    leading.foreach {
      case step @ Step.Has(key, pred)  => tryFold(key, pred, step)
      case step @ Step.HasKey(Seq(key)) => tryFold(key, Pred.Any, step)
      case step @ Step.HasLabel(labels) =>
        val pred = Pred.Within(labels.map(Lit.S))
        index.admissibleCount(isVertex, "label", pred) match {
          case Some(_) => folded :+= (("label", pred, 0L, false))
          case scala.None => kept :+= step
        }
      case step => kept :+= step
    }

    if (folded.isEmpty) scala.None
    else {
      val joinCols = if (isVertex) Seq("id") else Seq("src", "dst", "label")
      val frontier = folded
        .map(f => index.frontier(isVertex, f._1, f._2))
        .reduce((a, b) => a.join(b, joinCols, "left_semi"))
      Some((frontier, (kept ++ tail).toList))
    }
  }

  /** The query as a user-facing DataFrame (ordering applied, internal
    * columns mapped to stable names). */
  def df(query: String): DataFrame = finish(compile(query))

  private def finish(r: Compiler.Result): DataFrame = {
    val ordered = Compiler.applyOrdering(r.df, r.ordering)
    r.kind match {
      case VertexKind => ordered.select(col("__val").as("id"))
      case EdgeKind => ordered.select(
        col("__val").getField("src").as("src"),
        col("__val").getField("dst").as("dst"),
        col("__val").getField("label").as("label"))
      case ScalarKind(dt) => dt match {
        case st: org.apache.spark.sql.types.StructType =>
          // group()/groupCount() emit struct(key, count|values)
          ordered.select(st.fieldNames.map(f =>
            col("__val").getField(f).as(f)): _*)
        case _ => ordered.select(col("__val").as("value"))
      }
    }
  }

  /** Console-parity output: one "=>v" string per result row, like the
    * reference client (`docs/Tutorial.md:291-309`); DDL returns its
    * status line. Collects to the driver — final-result sized only. */
  def strings(query: String): Seq[String] = {
    ddl(query).foreach(status => return Seq(status))
    val r = compile(query)
    val out = finish(r)
    val rows = out.collect()
    val isGroup = out.columns.headOption.contains("key")
    rows.toSeq.map { row =>
      val rendered =
        if (isGroup)
          // reference group()/groupCount() console format: "key:[v1, v2]"
          // / "key:count" (barrier_expert.hpp:685-716)
          // NB: scala.collection.Seq, not the 2.13 immutable default —
          // Spark hands back mutable.ArraySeq for array columns
          row.get(0).toString + ":" + (row.get(1) match {
            case s: scala.collection.Seq[_] => s.mkString("[", ", ", "]")
            case v => v.toString
          })
        else row.toSeq.map {
          case null => ""
          case s: scala.collection.Seq[_] => s.mkString("[", ", ", "]")
          case v => v.toString
        }.mkString(", ")
      s"=>$rendered"
    }
  }
}
