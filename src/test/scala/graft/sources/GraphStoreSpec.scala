package graft.sources

import graft.SparkSpec
import graft.gremlin.Graft

/**
 * ETL parity: load the reference's own bundled sample graph from its
 * HDFS-text format (`/root/reference/data/`, grammar
 * `docs/Tutorial.md:8-42`) and check it is byte-equivalent to the
 * hand-built modern fixture, then replay the tutorial's console query.
 */
class GraphStoreSpec extends SparkSpec {

  lazy val loaded: GraphStore =
    GraphStore.grasperText(spark, "/root/reference/data")

  test("text loader reproduces the modern fixture") {
    val fixture = GraphStore.modern(spark)
    val a = loaded.vertices.select("id", "label", "name", "age", "lang")
      .collect().map(_.toSeq).toSet
    val b = fixture.vertices.select("id", "label", "name", "age", "lang")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val ea = loaded.edges.select("src", "dst", "label", "weight")
      .collect().map(_.toSeq).toSet
    val eb = fixture.edges.select("src", "dst", "label", "weight")
      .collect().map(_.toSeq).toSet
    assert(ea == eb)
  }

  test("schema is typed from the property-index dictionary") {
    val fields = loaded.vertices.schema.fields.map(f =>
      f.name -> f.dataType.typeName).toMap
    assert(fields("age") == "integer")   // type tag 1 = int
    assert(fields("name") == "string")   // type tag 4 = string
    val efields = loaded.edges.schema.fields.map(f =>
      f.name -> f.dataType.typeName).toMap
    assert(efields("weight") == "double") // type tag 2 = double
  }

  test("bucketed persistence removes the edges-side shuffle in traversals") {
    val g = GraphStore.tpch(spark, "/root/testdata/sf0.001")
    g.saveBucketed("gsb", buckets = 4)
    val loaded = GraphStore.loadBucketed(spark, "gsb")

    // results identical
    val q = "g.V().hasLabel('customer').out('placed').count()"
    assert(Graft(loaded).strings(q) == Graft(g).strings(q))

    // plan: scanning the bucketed edges table for a src-key join emits
    // no Exchange on the table side (SelectedBucketsCount appears)
    val plan = Graft(loaded)
      .df("g.V().hasLabel('customer').out('placed').count()")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("Bucketed: true"),
      s"expected bucketed scan in plan:\n$plan")
  }

  test("tutorial query runs on the loaded graph") {
    // docs/Tutorial.md:283 — g.V().hasKey/hasLabel/has console sample
    val g = Graft(loaded)
    assert(g.strings("g.V().hasLabel('person').has('age', gt(27)).count()")
      == Seq("=>3"))
    assert(g.strings("g.V().has('name','marko').out('knows').values('name')")
      .toSet == Set("=>vadas", "=>josh"))
  }
}
