package graft.gremlin

import graft.SparkSpec
import graft.sources.GraphStore

/**
 * The reference paper's benchmark query templates (SoCC'19 Table 4, as
 * recorded in BASELINE.md), instantiated on the modern sample graph
 * with hand-derived goldens:
 *
 *   Q1: g.V().has(f).properties(p)
 *   Q2: g.V().hasKey(f1).hasLabel(l).has(f2)
 *   Q3: g.V().has(f).in(l).values(k).max()
 *   Q4: g.E().has(f1).outV().dedup().has(f2).count()
 *   Q5: g.E().has(f1).not(outV().has(f2)).groupCount(k)
 *   Q6: g.V().has(f).and(out(l1).values(k1).min().is(p1), in(l2).count().is(p2)).values(k2)
 *   Q7: g.V().has(f1).as('a').union(out(l1), out(l2).in(l3)).in(l4).where(neq('a')).has(f2).order(p).limit(n)
 *   Q8: g.V().has(f1).aggregate('a').in(l1).out(l2).has(f2).where(without('a'))
 */
class PaperQueriesSpec extends SparkSpec {

  lazy val g: Graft = Graft(GraphStore.modern(spark))

  test("Q1 template: has + properties") {
    assert(g.strings("g.V().has('age', gt(30)).properties('name').order()") ==
      Seq("=>name:josh", "=>name:peter"))
  }

  test("Q2 template: hasKey + hasLabel + has") {
    assert(g.strings("g.V().hasKey('age').hasLabel('person').has('age', gt(28))")
      .sorted == Seq("=>1", "=>4", "=>6"))
  }

  test("Q5 template: E.has + not(outV.has) + groupCount(key)") {
    // created edges whose creator is NOT older than 30: only marko's
    // (1)-[created,0.4]->(3); grouped by the edge weight
    assert(g.strings(
      "g.E().hasLabel('created').not(outV().has('age', gt(30))).groupCount('weight')")
      == Seq("=>0.4:1"))
  }

  test("Q6 template: and(min().is, count().is) + values") {
    // persons whose youngest known is under 30 and who nobody knows:
    // marko (vadas 27, no in-knows); vadas/peter have no out-knows
    assert(g.strings(
      "g.V().hasLabel('person').and(out('knows').values('age').min().is(lt(30)), " +
        "in('knows').count().is(eq(0))).values('name')")
      == Seq("=>marko"))
  }

  test("Q7 template: union + in + where(neq) + order.limit keeps bag semantics") {
    // josh contributes marko twice (via ripple- and lop-co-creators'
    // in-knows), peter once; marko's own paths die at neq('a')
    assert(g.strings(
      "g.V().has('age', gt(28)).as('a').union(out('knows'), out('created').in('created'))" +
        ".in('knows').where(neq('a')).has('age', gt(25)).order('age', decr).limit(2)")
      == Seq("=>1", "=>1"))
  }

  test("Q3 template: has + in + values + max") {
    // creators of things created with weight context: in('created') of
    // software whose lang present -> persons; max age
    assert(g.strings("g.V().has('lang', eq('java')).in('created').values('age').max()")
      == Seq("=>35.0"))
  }

  test("Q4 template: E.has + outV + dedup + has + count") {
    assert(g.strings(
      "g.E().has('weight', gte(0.4)).outV().dedup().has('age', gt(28)).count()")
      == Seq("=>2")) // marko(29)? marko 29>28 yes; josh 32; peter(0.2 excluded)
  }

  test("Q8 template: aggregate + traverse + where(without)") {
    assert(g.strings(
      "g.V().has('age', lt(30)).aggregate('a').out('knows').in('knows')" +
        ".where(without('a')).dedup().count()")
      == Seq("=>0")) // marko's knows targets trace back only to marko (in 'a')
    assert(g.strings(
      "g.V().has('age', gt(30)).aggregate('a').out('created').in('created')" +
        ".where(without('a')).values('name').dedup().order()")
      == Seq("=>marko")) // josh&peter stored; co-creators of their software minus stored
  }
}
