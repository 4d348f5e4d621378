package graft.gremlin

import graft.SparkSpec
import graft.sources.GraphStore

/**
 * Multiplicity-insensitivity rewrites ([[EarlyDedup]]): dead-history
 * elimination and early dedup insertion must change plans, never
 * results.
 */
class EarlyDedupSpec extends SparkSpec {

  private def names(steps: List[Step]): List[String] =
    steps.map(_.getClass.getSimpleName)

  test("dead as() labels are eliminated; used ones kept") {
    val steps = StepParser.parse(
      "g.V().as('c').out('placed').as('o').out('contains').dedup().select('o')")
    val out = EarlyDedup.elimDeadLabels(steps)
    assert(names(out) ==
      List("V", "VtoV", "As", "VtoV", "Dedup", "Select"))
    // 'c' is unused → gone; 'o' is selected → kept
    assert(out.collect { case Step.As(n) => n } == List("o"))
  }

  test("labels referenced only inside sub-traversals stay") {
    val steps = StepParser.parse(
      "g.V().as('a').out().and(out().where(neq('a'))).dedup().count()")
    val out = EarlyDedup.elimDeadLabels(steps)
    assert(out.collect { case Step.As(n) => n } == List("a"))
  }

  test("early dedup inserted once two hops have accumulated") {
    val steps = StepParser.parse(
      "g.V().hasLabel('c').out('p').out('k').in('k').has('x', gt(1)).dedup().count()")
    val out = EarlyDedup.insertEarly(steps)
    assert(names(out) == List("V", "HasLabel", "VtoV", "VtoV",
      "Dedup", "VtoV", "Has", "Dedup", "Count"))
  }

  test("four-hop run collapses before hops 3 and (not) 4, resets on dedup") {
    val steps = StepParser.parse(
      "g.V().out('a').out('b').in('b').in('a').dedup().count()")
    val out = EarlyDedup.insertEarly(steps)
    assert(names(out) == List("V", "VtoV", "VtoV", "Dedup", "VtoV",
      "VtoV", "Dedup", "Count"))
  }

  test("no insertion without a terminal dedup (bag semantics preserved)") {
    val steps = StepParser.parse("g.V().out().out().count()")
    assert(EarlyDedup.insertEarly(steps) == steps)
  }

  test("no insertion when upstream history is live") {
    val steps = StepParser.parse(
      "g.V().as('a').out().out().dedup().select('a')")
    assert(EarlyDedup.insertEarly(steps) == steps)
  }

  test("order()/range() fence the run") {
    val steps = StepParser.parse(
      "g.V().out().order().limit(5).out().dedup().count()")
    val out = EarlyDedup.insertEarly(steps)
    // the run reaching dedup holds a single hop — nothing inserted
    assert(out == steps)
  }

  test("dedup(history) never triggers insertion") {
    val steps = StepParser.parse("g.V().as('a').out().out().dedup('a').count()")
    assert(EarlyDedup.insertEarly(steps) == steps)
  }

  test("results identical with and without the rewrite (modern graph)") {
    val gi = Graft(GraphStore.modern(spark).cached())
    val queries = Seq(
      "g.V().out().out().dedup().count()",
      "g.V().hasLabel('person').out('knows').in('knows').dedup().values('name').order()",
      "g.V().as('c').out().dedup().count()",
      "g.V().out().both().dedup().count()")
    val on = queries.map(gi.strings(_))
    gi.strings("SetConfig('early_dedup', 'false')")
    val off = queries.map(gi.strings(_))
    assert(on == off)
  }

  test("ic1-shaped query identical with and without the rewrite (tpch)") {
    // NOT .cached(): the shared session's CacheManager would swap
    // PlanSpec's parquet scans for InMemoryRelation by plan match
    val gi = Graft(GraphStore.tpch(spark, "/root/testdata/sf0.001"))
    val q = "g.V().hasLabel('customer').has('mktsegment', eq('AUTOMOBILE'))" +
      ".as('c').out('placed').out('contains').in('contains')" +
      ".has('orderpriority', eq('1-URGENT')).dedup().as('o')" +
      ".order('totalprice', decr).limit(20).select('o')"
    val on = gi.strings(q)
    gi.strings("SetConfig('early_dedup', 'false')")
    val off = gi.strings(q)
    assert(on == off && on.nonEmpty)
    // and the rewrite is actually active: planned steps gain dedups
    gi.strings("SetConfig('early_dedup', 'true')")
    val planned = gi.plannedSteps(q)
    assert(planned.count(_ == Step.Dedup(Nil)) == 2,
      s"expected 1 inserted + 1 written dedup, got: ${names(planned)}")
  }
}
