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

  test("range/limit inside and() slices per input traverser") {
    // per-creator alphabetically-first created software is always lop
    // (marko:{lop}, josh:{lop,ripple}, peter:{lop}) — a GLOBAL limit(1)
    // would keep a single branch row and pass only one creator
    assert(g.strings(
      "g.V().hasLabel('person').and(out('created').order('name', incr)" +
        ".limit(1).has('name', eq('lop'))).count()") == Seq("=>3"))
    // ripple is josh's SECOND alphabetically — top-1 never matches it
    assert(g.strings(
      "g.V().hasLabel('person').and(out('created').order('name', incr)" +
        ".limit(1).has('name', eq('ripple'))).count()") == Seq("=>0"))
    // skip(1) per traverser: only josh created more than one thing
    assert(g.strings(
      "g.V().hasLabel('person').and(out('created').order('name', incr)" +
        ".skip(1)).values('name')") == Seq("=>josh"))
    // range(1, 2) per traverser = the second created software
    assert(g.strings(
      "g.V().hasLabel('person').and(out('created').order('name', incr)" +
        ".range(1, 2).has('name', eq('ripple'))).values('name')") ==
      Seq("=>josh"))
  }

  test("limit inside union() stays branch-global (unlabelled branch)") {
    // top-2 created targets across ALL creators in branch 1, plus all
    // knows targets in branch 2
    assert(g.df("g.V().union(out('created').dedup().order('name', incr)" +
      ".limit(1), out('knows')).count()").collect().head.getLong(0) == 3)
  }

  test("hasValue coerces int<->double and never string<->number") {
    assert(g.strings("g.V().hasValue(29).count()") == Seq("=>1"))
    assert(g.strings("g.V().hasValue(29.0).count()") == Seq("=>1"))
    // the reference's value_t compare: string '29' != int 29
    assert(g.strings("g.V().hasValue('29').count()") == Seq("=>0"))
    assert(g.strings("g.V().hasValue('java').count()") == Seq("=>2"))
    assert(g.strings("g.V().hasValue('java', 29).count()") == Seq("=>3"))
  }

  test("deep chain: 3 hops with history and slice") {
    assert(g.strings(
      "g.V().as('a').out('knows').as('b').out('created').as('c')" +
        ".select('a').dedup().count()") == Seq("=>1"))
  }

  test("union nested inside and() counts across both branches") {
    // marko: knows 2 + created 1; josh: created 2; peter: created 1
    assert(g.strings(
      "g.V().and(union(out('knows'), out('created')).count().is(gt(1)))" +
        ".values('name')").sorted == Seq("=>josh", "=>marko"))
  }

  test("not() nested inside a union branch filters that branch only") {
    // branch 1: knows-targets with no creations -> vadas;
    // branch 2: all created software -> lop, ripple (bag)
    assert(g.strings(
      "g.V().union(out('knows').not(out('created')), out('created'))" +
        ".dedup().count()") == Seq("=>3"))
  }

  test("aggregate store consumed by where(within) after a traversal") {
    // olds = {marko, josh, peter}; marko's knows-targets ∩ olds = josh
    assert(g.strings(
      "g.V().has('age', gt(28)).aggregate('olds').out('knows')" +
        ".where(within('olds')).values('name')") == Seq("=>josh"))
  }

  test("per-traverser top-1 barrier inside not()") {
    // only marko's oldest known person (josh, 32) clears gt(30), so
    // not() drops marko alone
    assert(g.strings(
      "g.V().not(out('knows').order('age', decr).limit(1)" +
        ".has('age', gt(30))).values('name').order()") ==
      Seq("=>josh", "=>lop", "=>peter", "=>ripple", "=>vadas"))
  }

  test("history recorded before union survives into select") {
    assert(g.strings(
      "g.V().as('x').union(out('created'), out('knows')).as('y')" +
        ".select('x', 'y').order()") ==
      Seq("=>[x:1, y:2]", "=>[x:1, y:3]", "=>[x:1, y:4]",
        "=>[x:4, y:3]", "=>[x:4, y:5]", "=>[x:6, y:3]"))
  }

  test("edge-stream and() with filters on both endpoints") {
    // edges whose creator/knower is over 28 AND whose target is
    // software: (1,3) (4,5) (4,3) (6,3)
    assert(g.strings(
      "g.E().and(outV().has('age', gt(28)), inV().hasLabel('software'))" +
        ".count()") == Seq("=>4"))
  }

  test("nested branch filters compose (and containing not)") {
    // persons who created something AND do not know anyone: josh? josh
    // knows nobody outward... marko knows vadas+josh (fails not), josh
    // created ripple+lop and has no out-knows (passes), peter created
    // lop and knows nobody (passes)
    assert(g.strings(
      "g.V().and(out('created').count().is(gt(0)), not(out('knows')))" +
        ".values('name')").sorted == Seq("=>josh", "=>peter"))
  }

  test("duplicate traversers survive and() independently") {
    // out('created') yields lop three times and ripple once; the
    // content-hash row tags must keep all four IDENTICAL-content
    // traversers distinct through the semi-join (a value-keyed tag
    // would collapse lop's three copies to one)
    assert(g.strings(
      "g.V().out('created').and(in('created').count().is(gt(0))).count()")
      == Seq("=>4"))
    // and a not() over the same duplicated frontier keeps none of them
    assert(g.strings(
      "g.V().out('created').not(in('created')).count()") == Seq("=>0"))
  }
}
