package graft.gremlin

import graft.SparkSpec
import graft.sources.GraphStore

/**
 * The reference paper's benchmark query templates (SoCC'19 Table 4, as
 * recorded in BASELINE.md), instantiated on the modern sample graph
 * with hand-derived goldens:
 *
 *   Q1: g.V().has(f).properties(p)
 *   Q3: g.V().has(f).in(l).values(k).max()
 *   Q4: g.E().has(f1).outV().dedup().has(f2).count()
 *   Q8: g.V().has(f1).aggregate('a').in(l1).out(l2).has(f2).where(without('a'))
 */
class PaperQueriesSpec extends SparkSpec {

  lazy val g: Graft = Graft(GraphStore.modern(spark))

  test("Q1 template: has + properties") {
    assert(g.strings("g.V().has('age', gt(30)).properties('name').order()") ==
      Seq("=>name:josh", "=>name:peter"))
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
