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
  /** Runtime toggles set by `SetConfig(...)` DDL (the reference's
    * ConfigExpert switches; we record them — Catalyst/AQE subsumes
    * their effects). */
  @volatile var config: Map[String, String] = Map.empty

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
      Some(s"Index built for ${ve.toUpperCase}.$key" +
        (if (isV) "" else " (planner folds vertex indexes only)"))
    case SetConfigRe(k, v) =>
      config += k -> v
      Some(s"Config $k=$v")
    case _ => None
  }

  /** Parse + reorder + compile; returns the raw compiled result.
    * A leading selective `has(key, eq/within)` with a built index seeds
    * the frontier from the posting list instead of the table scan
    * (reference §4.2 index fold, selectivity-gated). */
  def compile(query: String): Compiler.Result = {
    val steps = Reorder(StepParser.parse(query))
    steps match {
      case Step.V(Seq()) :: Step.Has(key, pred) :: rest
          if index.has(isVertex = true, key) =>
        val values = pred match {
          case Pred.Eq(v)     => Some(Seq(v.value))
          case Pred.Within(vs) => Some(vs.map(_.value))
          case _ => None
        }
        values.flatMap(vs => index.lookupVertices(key, vs)) match {
          case Some(frontier) => Compiler.compileSeeded(graph, frontier, rest)
          case None => Compiler.compile(graph, steps)
        }
      case _ => Compiler.compile(graph, steps)
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
