package graft.gremlin

/**
 * Step reordering — the reference's only rule-based optimization
 * (`ReOrderSteps`, Grasper `core/parser.cpp:368-393,495-532`): filters
 * bubble forward, stable within class, by priority
 *
 *   is/where(0) < has*(1) < hasLabel(2) < and/or/not(3) < dedup(4)
 *   < as(5) < order(6)
 *
 * and never across a traversal/barrier step. Catalyst re-derives most of
 * this (`PushDownPredicates`), but doing it on the step IR keeps the
 * generated join tree small before Catalyst sees it, and preserves the
 * reference's plan-shape semantics deterministically.
 *
 * Guard (parser.cpp:528-530): steps that reference `as()` history
 * (`where('a',…)`, `dedup('a')`) must not cross the `as` they reference —
 * implemented conservatively by treating every `as()` as a reorder
 * fence.
 */
object Reorder {

  private def priority(s: Step): Option[Int] = s match {
    case Step.Is(_) | Step.WherePred(_, _) | Step.WhereHistory(_, _, _) |
         Step.WhereStore(_, _)                     => Some(0)
    case Step.Has(_, _) | Step.HasKey(_) | Step.HasValue(_) => Some(1)
    case Step.HasLabel(_)                          => Some(2)
    case Step.BranchFilter(_, _)                   => Some(3)
    case Step.Dedup(_)                             => Some(4)
    case Step.As(_)                                => Some(5)
    case Step.Order(_, _)                          => Some(6)
    case _                                         => None
  }

  def apply(steps: List[Step]): List[Step] = {
    // recurse into sub-traversals first
    val rec = steps.map {
      case Step.Union(subs) => Step.Union(subs.map(apply))
      case Step.BranchFilter(op, subs) =>
        Step.BranchFilter(op, subs.map(apply))
      case r @ Step.Repeat(sub, _, u, _, _, _) =>
        r.copy(sub = apply(sub), until = u.map(apply))
      case other => other
    }
    // split into maximal runs of reorderable steps; `as` is a fence
    val out = List.newBuilder[Step]
    val run = List.newBuilder[Step]
    def flush(): Unit = {
      val r = run.result()
      if (r.nonEmpty) out ++= r.sortBy(s => priority(s).get) // stable
      run.clear()
    }
    rec.foreach { s =>
      priority(s) match {
        case Some(_) if !s.isInstanceOf[Step.As] => run += s
        case Some(_) => // as(): sortable but acts as a fence
          run += s; flush()
        case None => flush(); out += s
      }
    }
    flush()
    out.result()
  }
}
