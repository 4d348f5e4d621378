package graft.gremlin

/**
 * Logical step IR — one case class per "Expert" in the reference
 * (`EXPERT_T`, Grasper `base/type.hpp:394-397`; Gremlin-step→expert
 * mapping `core/parser.cpp:534-613,1496-1539`). The parser produces a
 * `List[Step]`; `Reorder` applies the reference's predicate-pushdown
 * rule; `Compiler` folds the list into a DataFrame plan.
 *
 * Unlike the reference's flat array-with-next-pointers
 * (`core/expert_object.hpp:15-37`), sub-traversals are nested lists —
 * Scala ADTs make branch bookkeeping structural instead of pointer
 * fix-ups.
 */
sealed trait Step

object Step {
  // ---- sources (InitExpert, init_expert.hpp:33-291) ----
  /** g.V() / g.E(): full scan of the vertex / edge table. */
  final case class V(ids: Seq[Long] = Nil) extends Step
  final case class E() extends Step

  // ---- filters (§2.2) ----
  /** has(key) / has(key, value) / has(key, pred) / hasNot(key). */
  final case class Has(key: String, pred: Pred) extends Step
  /** hasKey(k1, …): element has ALL listed property keys. */
  final case class HasKey(keys: Seq[String]) extends Step
  /** hasValue(v1, …): ANY property value of the element ∈ list. */
  final case class HasValue(vs: Seq[Lit]) extends Step
  /** hasLabel(l1, l2, …). */
  final case class HasLabel(labels: Seq[String]) extends Step
  /** is(pred): filter a scalar stream. */
  final case class Is(pred: Pred) extends Step
  /** coin(p): Bernoulli sample. */
  final case class Coin(p: Double) extends Step

  // ---- where forms (where_expert.hpp:21-229) ----
  /** Comparison op for history-referencing where(): eq|neq|lt|lte|gt|gte. */
  type CmpOp = String
  /** where(pred("a")): current value vs history value at label `target`. */
  final case class WherePred(op: CmpOp, target: String) extends Step
  /** where("a", pred("b")): history vs history. */
  final case class WhereHistory(left: String, op: CmpOp, right: String)
      extends Step
  /** where(within("x")/without("x")) against an aggregate side-effect. */
  final case class WhereStore(storeKey: String, anti: Boolean) extends Step
  /** where(subquery) — re-sugared to and(subquery) (parser.cpp:1464-1474). */

  // ---- traversals (traversal_expert.hpp) ----
  sealed trait Dir
  case object Out  extends Dir
  case object In   extends Dir
  case object Both extends Dir
  /** out/in/both(label?): vertex → adjacent vertices. */
  final case class VtoV(dir: Dir, labels: Seq[String]) extends Step
  /** outE/inE/bothE(label?): vertex → incident edges. */
  final case class VtoE(dir: Dir, labels: Seq[String]) extends Step
  /** outV/inV/bothV(): edge → endpoint vertices. */
  final case class EtoV(dir: Dir) extends Step

  // ---- projections (§2.4) ----
  /** values(k1, k2, …): element → property value(s); missing key drops row. */
  final case class Values(keys: Seq[String]) extends Step
  /** properties(k…): element → "key:value" strings (all keys if empty). */
  final case class Properties(keys: Seq[String]) extends Step
  /** key(): element → property key names present. */
  final case class Key() extends Step
  /** label(): element → label string. */
  final case class Label() extends Step
  /** as("a"): record current value in history. */
  final case class As(name: String) extends Step
  /** select("a", …): re-emit history value(s). */
  final case class Select(names: Seq[String]) extends Step

  // ---- barriers (§2.5, §2.6) ----
  final case class Count() extends Step
  sealed trait MathOp
  case object SumOp extends MathOp
  case object MaxOp extends MathOp
  case object MinOp extends MathOp
  case object MeanOp extends MathOp
  final case class MathStep(op: MathOp) extends Step
  /** dedup() by value, or dedup("a","b") by history tuple. */
  final case class Dedup(byHistory: Seq[String]) extends Step
  /** order() / order(key|"label", incr|decr). */
  final case class Order(key: Option[String], desc: Boolean) extends Step
  /** limit(n) = range(0, n); skip(n) = range(n, -1); range(lo, hi); -1 = ∞. */
  final case class Range(lo: Long, hi: Long) extends Step
  /** group(byKey?, valueKey?) / groupCount(byKey?). Keys may be "label". */
  final case class Group(byKey: Option[String], valKey: Option[String],
                         countOnly: Boolean) extends Step
  /** aggregate("x"): store stream into side-effect key x, pass through. */
  final case class Aggregate(name: String) extends Step
  /** cap("x", …): emit side-effect store(s). */
  final case class Cap(names: Seq[String]) extends Step

  // ---- branches (§2.7) ----
  /** union(sub1, sub2, …). */
  final case class Union(subs: Seq[List[Step]]) extends Step
  /** and/or/not(sub…): existential filter via per-row sub evaluation. */
  sealed trait BranchFilterOp
  case object AndOp extends BranchFilterOp
  case object OrOp  extends BranchFilterOp
  case object NotOp extends BranchFilterOp
  final case class BranchFilter(op: BranchFilterOp, subs: Seq[List[Step]])
      extends Step
  /** repeat(sub): executes sub exactly once in the reference
    * ("Act just as union", parser.cpp:1305-1318); same here, with an
    * optional times(k) extension unrolled by the compiler and an
    * optional until(cond) extension (TinkerPop's post-condition form:
    * apply the body, then emit traversers whose `cond` sub-traversal
    * yields ≥ 1 row; the rest loop). `times` is `None` until an
    * explicit `.times(k)` folds in — an explicit `.times(1)` must cap
    * at one round, which an `Int` default of 1 cannot distinguish.
    * With `until` present, `times` is the ROUND CAP (absent ⇒
    * [[graft.gremlin.Compiler.UntilCap]]), the loop runs as the
    * compiler's one EAGER driver loop (early exit when the frontier
    * drains), and a traverser still circulating past the cap fails
    * the query loudly (certify-or-throw, the graph-loop contract).
    * `untilPre`/`emitPre` mark TinkerPop's PRE-position forms —
    * `until(c).repeat(x)` is while-do (the condition checks BEFORE
    * each body application, so a depth-0 match exits immediately) and
    * `emit().repeat(x)` emits the loop INPUT at depth 0 and every
    * stayer at each later depth (per TinkerPop RepeatStep, an exiting
    * traverser is never also emit-duplicated, and a times-exhausted
    * emit-pre frontier exits as the loop's normal output). */
  final case class Repeat(sub: List[Step], times: Option[Int] = None,
                          until: Option[List[Step]] = None,
                          emit: Boolean = false,
                          untilPre: Boolean = false,
                          emitPre: Boolean = false) extends Step
  /** path(): the traverser's LABELED path — every `as()`-recorded
    * value in label-application order plus the current value, rendered
    * in the reference console's multi-select style (`[v1, v2, v3]`).
    * The reference has no path expert; this rides the same history
    * columns its `history_t` carries (core/message.hpp:74-100), so it
    * is the labeled-history path, not a full per-step trace. */
  final case class PathStep() extends Step
  /** Parser-internal `.times(k)` marker; folded into the preceding
    * Repeat by the parser, never reaches the compiler. */
  private[gremlin] final case class TimesMarker(k: Int) extends Step
  /** Parser-internal `.until(cond)` marker; folded into the preceding
    * Repeat by the parser, never reaches the compiler. */
  private[gremlin] final case class UntilMarker(cond: List[Step])
      extends Step
  /** Parser-internal `.emit()` marker; folded into the preceding
    * Repeat by the parser, never reaches the compiler. TinkerPop
    * depth emission: every post-body traverser is emitted at every
    * round AND keeps looping. With `.times(k)` (no until) the loop
    * hard-stops at depth k (TinkerPop parity — no throw); with
    * `until`/unbounded it shares the eager loop's drain semantics
    * (certify-or-throw past the cap). */
  private[gremlin] case object EmitMarker extends Step
}
