package graft.gremlin

/**
 * Multiplicity-insensitivity rewrites, applied after [[Reorder]].
 *
 * The reference executes traversals with bag semantics: every hop
 * forwards one message per (traverser, matching edge), so a 3-hop
 * expansion like `out().out().in()` multiplies path counts per hop
 * (Grasper routes each as a remote message batch,
 * `core/message.cpp:50-140`). When the query ends the expansion with a
 * plain `dedup()`, those multiplicities are provably irrelevant — only
 * the SET of reached elements survives. On Spark the duplicate
 * traversers are real shuffle rows, and at cluster scale the bag grows
 * with path counts (unbounded) while the set is bounded by |V| / |E|.
 *
 * Two rewrites exploit this, both result-preserving:
 *
 *  1. '''Dead-history elimination''': drop `as(x)` steps whose label is
 *     never read by a later `select` / `where` / `dedup(x)` (including
 *     inside sub-traversals). History columns are threaded through
 *     every join and shuffle, so an unused label widens the whole
 *     pipeline for nothing.
 *  2. '''Early dedup insertion''': for a `dedup()` preceded by an
 *     unbroken run of pure per-element steps (filters, hops,
 *     projections — nothing that counts, samples, slices, orders, or
 *     reads history) with no recorded history upstream, insert
 *     `dedup()` before every hop after the first in that run. Each
 *     frontier then stays a set: the work of hop k is bounded by
 *     |frontier ∩ V| · avg-degree instead of (paths so far) ·
 *     avg-degree. Inside and/or/not sub-traversals the inserted dedup
 *     keys on the branch tag too (the compiler's Dedup always includes
 *     `groupCol`), preserving per-input-traverser semantics.
 *
 * Both are gated by `SetConfig('early_dedup', 'false')`, alongside the
 * reference's own optimizer toggles (`expert/config_expert.hpp:39-59`).
 */
object EarlyDedup {

  /** Every history label read anywhere in the (sub)tree. */
  private def referenced(steps: List[Step]): Set[String] =
    steps.flatMap {
      case Step.Select(ns)            => ns
      case Step.WherePred(_, t)       => Seq(t)
      case Step.WhereHistory(l, _, r) => Seq(l, r)
      case Step.Dedup(hs)             => hs
      case Step.Union(subs)           => subs.flatMap(referenced)
      case Step.BranchFilter(_, subs) => subs.flatMap(referenced)
      case Step.Repeat(sub, _, u, _, _, _) =>
        referenced(sub) ++ u.toSeq.flatMap(referenced)
      case _                          => Nil
    }.toSet

  /** Per-element, set-preserving steps a dedup can commute across. */
  private def safePass(s: Step): Boolean = s match {
    case _: Step.Has | _: Step.HasKey | _: Step.HasValue |
         _: Step.HasLabel | _: Step.Is | _: Step.WhereStore |
         _: Step.Values | _: Step.Properties | _: Step.Key |
         _: Step.Label | _: Step.Dedup => true
    case other => isHop(other)
  }

  private def isHop(s: Step): Boolean = s match {
    case _: Step.VtoV | _: Step.VtoE | _: Step.EtoV => true
    case _ => false
  }

  def apply(steps: List[Step]): List[Step] =
    insertEarly(elimDeadLabels(steps))

  /** Rewrite 1: drop as(x) never read downstream (tree-global check —
    * sub-traversals inherit outer history, so a label used only inside
    * an and()/union() branch still counts as read). Duplicate labels
    * (re-recorded `as(x)`) are kept conservatively. */
  private[gremlin] def elimDeadLabels(steps: List[Step]): List[Step] = {
    // path() reads EVERY recorded label — no label is dead under it
    def containsPath(l: List[Step]): Boolean = l.exists {
      case Step.PathStep()            => true
      case Step.Union(subs)           => subs.exists(containsPath)
      case Step.BranchFilter(_, subs) => subs.exists(containsPath)
      case r: Step.Repeat             =>
        containsPath(r.sub) || r.until.exists(containsPath)
      case _                          => false
    }
    if (containsPath(steps)) return steps
    val used = referenced(steps)
    def walk(l: List[Step]): List[Step] = l.flatMap {
      case Step.Union(subs)           => Some(Step.Union(subs.map(walk)))
      case Step.BranchFilter(op, subs) =>
        Some(Step.BranchFilter(op, subs.map(walk)))
      case r @ Step.Repeat(sub, _, u, _, _, _) =>
        Some(r.copy(sub = walk(sub), until = u.map(walk)))
      case Step.As(n) if !used(n)     => None
      case s                          => Some(s)
    }
    walk(steps)
  }

  /** Rewrite 2: early dedup insertion (per list, recursing into subs).
    *
    * `outerHistoryLive` threads the enclosing traversal's history state
    * into sub-traversals: a union() sub inherits the outer frontier's
    * history bindings, so an early dedup inserted inside the sub could
    * re-pick which OUTER binding survives even when the sub itself
    * records no labels. Insertion is skipped anywhere history — local
    * or inherited — is live.
    */
  private[gremlin] def insertEarly(
      steps: List[Step],
      outerHistoryLive: Boolean = false): List[Step] = {
    val subLive =
      outerHistoryLive || steps.exists(_.isInstanceOf[Step.As])
    val rec = steps.map {
      case Step.Union(subs) =>
        Step.Union(subs.map(insertEarly(_, subLive)))
      case Step.BranchFilter(op, subs) =>
        Step.BranchFilter(op, subs.map(insertEarly(_, subLive)))
      // Repeat unrolls at compile time; its body may run under a
      // surviving outer context — leave it alone
      case other => other
    }
    val arr = rec.toVector
    val insertBefore = scala.collection.mutable.Set.empty[Int]
    arr.zipWithIndex.foreach {
      case (Step.Dedup(Seq()), i)
          // any upstream as() — here or in an enclosing traversal —
          // means live history whose arbitrary-row survival an early
          // dedup could re-pick — skip the whole run
          if !outerHistoryLive &&
            !arr.take(i).exists(_.isInstanceOf[Step.As]) =>
        var j = i - 1
        while (j >= 0 && safePass(arr(j))) j -= 1
        // collapse once 2 hops have accumulated since the last dedup:
        // multiplicity between collapses is bounded by d² instead of
        // dⁿ (scale-safe), at half the extra exchanges of a per-hop
        // dedup — and the insertion lands exactly before the fan-in
        // hop of the quadratic out(l).in(l) co-occurrence pattern
        var sinceDedup = 0
        ((j + 1) until i).foreach { k =>
          arr(k) match {
            case Step.Dedup(_) => sinceDedup = 0
            case s if isHop(s) =>
              if (sinceDedup >= 2) { insertBefore += k; sinceDedup = 0 }
              sinceDedup += 1
            case _ => ()
          }
        }
      case _ => ()
    }
    arr.zipWithIndex.flatMap { case (s, k) =>
      if (insertBefore(k)) Seq(Step.Dedup(Nil), s) else Seq(s)
    }.toList
  }
}
