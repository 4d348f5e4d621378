package graft.gremlin

import graft.SparkSpec
import graft.sources.GraphStore

/**
 * Empty-frontier and boundary semantics — the cases the reference
 * handles via "empty data still reaches barriers"
 * (`core/message.cpp:418-449`) and that joins/aggregations must get
 * right without that machinery.
 */
class EdgeCaseSpec extends SparkSpec {

  lazy val g: Graft = Graft(GraphStore.modern(spark))

  test("count of an empty stream is 0, not no-rows") {
    assert(g.strings("g.V().has('age', gt(99)).count()") == Seq("=>0"))
    assert(g.strings("g.V().hasLabel('nosuch').out().count()") == Seq("=>0"))
  }

  test("sum/mean of an empty stream emits a null row (SQL fold)") {
    val r = g.df("g.V().has('age', gt(99)).values('age').sum()").collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }

  test("dedup/order/limit on empty streams are empty") {
    assert(g.df("g.V().hasLabel('nosuch').dedup()").count() == 0)
    assert(g.df("g.V().hasLabel('nosuch').order('age', decr).limit(3)").count() == 0)
  }

  test("limit beyond the stream size returns everything") {
    assert(g.df("g.V().limit(100)").count() == 6)
    assert(g.df("g.V().values('age').order().range(2, 100)").count() == 2)
  }

  test("union with an empty branch keeps the non-empty one") {
    assert(g.strings("g.V().has('name','marko').union(out('knows'), out('nosuch')).count()")
      == Seq("=>2"))
  }

  test("and() with an always-empty branch filters everything") {
    assert(g.strings("g.V().and(out('knows'), out('nosuch')).count()") == Seq("=>0"))
  }

  test("not() with an always-empty branch keeps everything") {
    assert(g.strings("g.V().not(out('nosuch')).count()") == Seq("=>6"))
  }

  test("where(within) against an empty side-effect store is empty") {
    assert(g.strings(
      "g.V().has('age', gt(99)).aggregate('x').count()") == Seq("=>0"))
    assert(g.strings(
      "g.V().hasLabel('nosuch').aggregate('x').where(within('x')).count()")
      == Seq("=>0"))
  }

  test("group console format parity") {
    assert(g.strings("g.V().groupCount('label')").sorted ==
      Seq("=>person:4", "=>software:2"))
    assert(g.strings("g.V().hasLabel('software').group('label', 'name')") ==
      Seq("=>software:[lop, ripple]"))
  }

  test("count() inside a branch emits 0 for empty groups (Gremlin parity)") {
    // vertices with NO outgoing edges: vadas, lop, ripple
    assert(g.df("g.V().and(out().count().is(eq(0))).id()"
      .replace(".id()", "")).count() == 3)
    assert(g.strings(
      "g.V().and(out().count().is(gt(1))).values('name')").sorted ==
      Seq("=>josh", "=>marko"))
  }

  test("order by label on an edge stream") {
    assert(g.strings("g.E().order('label', decr).limit(1).label()") ==
      Seq("=>knows"))
  }

  test("groupCount over a partially-present key drops missing elements") {
    val t = Graft(graft.sources.GraphStore.tpch(spark, "/root/testdata/sf0.001"))
    val rows = t.df("g.V().groupCount('mktsegment')").collect()
    assert(rows.forall(r => r.getString(0) != null))
    assert(rows.map(_.getLong(1)).sum == 150L) // only customers counted
  }

  test("query not starting with V/E raises CompileException") {
    val ex = intercept[CompileException] { g.df("g.count()") }
    assert(ex.getMessage.contains("must start with V() or E()"))
  }

  test("chained barriers: count of a count") {
    assert(g.strings("g.V().count().count()") == Seq("=>1"))
  }

  test("is() after a barrier filters the scalar") {
    assert(g.strings("g.V().count().is(gt(5))") == Seq("=>6"))
    assert(g.df("g.V().count().is(gt(6))").count() == 0)
  }

  test("values on a key absent from every row of a label") {
    assert(g.df("g.V().hasLabel('person').values('lang')").count() == 0)
  }

  test("deep chain: 3 hops with history and slice") {
    assert(g.strings(
      "g.V().as('a').out('knows').as('b').out('created').as('c')" +
        ".select('a').dedup().count()") == Seq("=>1"))
  }
}
