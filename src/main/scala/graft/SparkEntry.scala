package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gremlin.Graft
import graft.sources.GraphStore

/**
 * Driver contract (see SURVEY.md §7): one `queries` entry per operator
 * from SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` over the
 * same parquet tables.
 *
 * The Gremlin queries run over the TPC-H-derived property graph
 * (customer -[placed]-> order -[contains]-> part, `GraphStore.tpch`);
 * the oracle SQL re-expresses each traversal as the equivalent
 * relational join. Vertex id arithmetic (order = key + 1e9,
 * part = key + 2e9) matches `GraphStore.{OrderIdOffset,PartIdOffset}`.
 */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    g(spark, "/root/testdata/sf0.001").df(
      "g.V().hasLabel('customer').out('placed').out('contains').dedup().count()")

  private def g(spark: SparkSession, sfDir: String): Graft =
    Graft(GraphStore.tpch(spark, sfDir))

  /** Gremlin-query entry: compile + run over the derived graph. */
  private def q(query: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => g(spark, sfDir).df(query)

  /** Same, but with 2-decimal rounding on the `value` column so
    * double-sum accumulation order can't flip the driver's hash. */
  private def qr(query: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => g(spark, sfDir).df(query)
      .withColumn("value", round(col("value"), 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 sources / scans ----
    "init_v_count" -> q("g.V().count()"),
    "init_e_count" -> q("g.E().count()"),

    // ---- §2.2 filters / predicates ----
    "has_pred_sum"   -> qr("g.V().hasLabel('part').has('size', gt(25)).values('retailprice').sum()"),
    "has_between"    -> q("g.V().hasLabel('order').has('totalprice', between(100000.0, 200000.0)).count()"),
    "has_inside"     -> q("g.V().hasLabel('part').has('size', inside(10, 20)).count()"),
    "has_within"     -> q("g.V().hasLabel('customer').has('mktsegment', within('BUILDING', 'MACHINERY')).count()"),
    "hasnot_key"     -> q("g.V().hasNot('mktsegment').count()"),
    "haskey_all"     -> q("g.V().hasKey('name', 'acctbal').count()"),
    "hasvalue_any"   -> q("g.V().hasValue('BUILDING').count()"),
    "haslabel_multi" -> q("g.V().hasLabel('customer', 'part').count()"),
    "is_scalar"      -> q("g.V().hasLabel('order').values('totalprice').is(gt(100000.0)).count()"),

    // ---- §2.3 traversals ----
    "traverse_out"      -> q("g.V().hasLabel('customer').has('mktsegment', 'BUILDING').out('placed').count()"),
    "traverse_in"       -> q("g.V().hasLabel('part').has('brand', 'Brand#13').in('contains').count()"),
    "traverse_both"     -> q("g.V().hasLabel('order').both().count()"),
    "traverse_2hop"     -> q("g.V().hasLabel('customer').out('placed').out('contains').dedup().count()"),
    "traverse_oute_inv" -> q("g.V().hasLabel('customer').outE('placed').inV().values('totalprice').max()"),
    "edge_has_count"    -> q("g.E().hasLabel('contains').has('quantity', gt(40.0)).count()"),
    "edge_outv_dedup"   -> q("g.E().hasLabel('placed').outV().dedup().count()"),

    // ---- §2.4 projections ----
    "values_mean"   -> qr("g.V().hasLabel('customer').values('acctbal').mean()"),
    "properties_kv" -> q("g.V().has('name', 'Customer#000000001').properties('mktsegment', 'nationkey').order()"),
    "label_groupcount" -> q("g.V().groupCount('label')"),
    "select_history"   -> q("g.V().hasLabel('customer').has('nationkey', eq(5)).as('c').out('placed').select('c').dedup().count()"),

    // ---- §2.5 aggregations ----
    "math_min"      -> q("g.E().hasLabel('contains').values('extendedprice').min()"),
    "dedup_history" -> q("g.V().hasLabel('customer').as('a').out('placed').dedup('a').count()"),
    "group_count_key" -> q("g.V().hasLabel('customer').groupCount('mktsegment')"),
    "group_collect" -> ((spark: SparkSession, sfDir: String) =>
      g(spark, sfDir)
        .df("g.V().hasLabel('customer').has('nationkey', lt(3)).group('nationkey', 'name')")
        .withColumn("values", concat_ws(",", col("values")))),
    "aggregate_cap" -> q("g.V().hasLabel('order').has('totalprice', gt(300000.0)).aggregate('big').cap('big')"),

    // ---- §2.6 order / range ----
    "order_limit" -> q("g.V().hasLabel('part').order('retailprice', decr).limit(5).values('name')"),
    "range_slice" -> q("g.V().hasLabel('order').values('totalprice').order().range(10, 20)"),

    // ---- §2.7 branches ----
    "union_branches" -> q("g.V().hasLabel('customer').has('nationkey', eq(1)).union(out('placed'), out('placed').out('contains')).count()"),
    "and_filter" -> q("g.V().hasLabel('customer').and(out('placed').has('totalprice', gt(150000.0)), out('placed').has('totalprice', lt(50000.0))).count()"),
    "or_filter"  -> q("g.V().hasLabel('customer').or(out('placed').has('totalprice', gt(250000.0)), out('placed').has('totalprice', lt(20000.0))).count()"),
    "not_filter" -> q("g.V().hasLabel('customer').not(out('placed')).count()"),
    "where_store_q8" -> q("g.V().hasLabel('order').has('totalprice', lt(20000.0)).in('placed').dedup().aggregate('small').out('placed').out('contains').in('contains').in('placed').dedup().where(without('small')).count()"),
    "repeat_hop" -> q("g.V().hasLabel('customer').has('nationkey', eq(7)).repeat(out()).count()"),
  )

  // Shared SQL fragments: the derived graph in relational form.
  private val EdgesContains =
    "(SELECT l_orderkey, l_partkey, sum(l_quantity) AS quantity, sum(l_extendedprice) AS extendedprice FROM lineitem GROUP BY l_orderkey, l_partkey)"

  def oracleSql: Map[String, String] = Map(
    "init_v_count" ->
      "SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM orders) + (SELECT count(*) FROM part) AS value",
    "init_e_count" ->
      s"SELECT (SELECT count(*) FROM orders) + (SELECT count(*) FROM $EdgesContains) AS value",

    "has_pred_sum" ->
      "SELECT round(sum(p_retailprice), 2) AS value FROM part WHERE p_size > 25",
    "has_between" ->
      "SELECT count(*) AS value FROM orders WHERE o_totalprice BETWEEN 100000.0 AND 200000.0",
    "has_inside" ->
      "SELECT count(*) AS value FROM part WHERE p_size > 10 AND p_size < 20",
    "has_within" ->
      "SELECT count(*) AS value FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')",
    "hasnot_key" ->
      "SELECT (SELECT count(*) FROM orders) + (SELECT count(*) FROM part) AS value",
    "haskey_all" ->
      "SELECT count(*) AS value FROM customer",
    "hasvalue_any" ->
      "SELECT count(*) AS value FROM customer WHERE c_name = 'BUILDING' OR c_mktsegment = 'BUILDING'",
    "haslabel_multi" ->
      "SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM part) AS value",
    "is_scalar" ->
      "SELECT count(*) AS value FROM orders WHERE o_totalprice > 100000.0",

    "traverse_out" ->
      "SELECT count(*) AS value FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_mktsegment = 'BUILDING'",
    "traverse_in" ->
      s"SELECT count(*) AS value FROM $EdgesContains e JOIN part p ON p.p_partkey = e.l_partkey WHERE p.p_brand = 'Brand#13'",
    "traverse_both" ->
      s"SELECT (SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) + (SELECT count(*) FROM $EdgesContains) AS value",
    "traverse_2hop" ->
      "SELECT count(DISTINCT l.l_partkey) AS value FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey",
    "traverse_oute_inv" ->
      "SELECT max(o.o_totalprice) AS value FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
    "edge_has_count" ->
      s"SELECT count(*) AS value FROM $EdgesContains WHERE quantity > 40.0",
    "edge_outv_dedup" ->
      "SELECT count(DISTINCT o_custkey) AS value FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",

    "values_mean" ->
      "SELECT round(avg(c_acctbal), 2) AS value FROM customer",
    "properties_kv" ->
      "SELECT value FROM (SELECT 'mktsegment:' || c_mktsegment AS value FROM customer WHERE c_name = 'Customer#000000001' UNION ALL SELECT 'nationkey:' || c_nationkey FROM customer WHERE c_name = 'Customer#000000001') ORDER BY value",
    "label_groupcount" ->
      "SELECT * FROM (SELECT 'customer' AS key, count(*) AS count FROM customer UNION ALL SELECT 'order', count(*) FROM orders UNION ALL SELECT 'part', count(*) FROM part)",
    "select_history" ->
      "SELECT count(DISTINCT c.c_custkey) AS value FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey WHERE c.c_nationkey = 5",

    "math_min" ->
      s"SELECT min(extendedprice) AS value FROM $EdgesContains",
    "dedup_history" ->
      "SELECT count(DISTINCT c.c_custkey) AS value FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey",
    "group_count_key" ->
      "SELECT c_mktsegment AS key, count(*) AS count FROM customer GROUP BY c_mktsegment",
    "group_collect" ->
      "SELECT c_nationkey AS key, array_to_string(list_sort(list(c_name)), ',') AS \"values\" FROM customer WHERE c_nationkey < 3 GROUP BY c_nationkey",
    "aggregate_cap" ->
      "SELECT o_orderkey + 1000000000 AS id FROM orders WHERE o_totalprice > 300000.0",

    "order_limit" ->
      "SELECT p_name AS value FROM part ORDER BY p_retailprice DESC, CAST(p_partkey + 2000000000 AS VARCHAR) ASC LIMIT 5",
    "range_slice" ->
      "SELECT o_totalprice AS value FROM orders ORDER BY o_totalprice LIMIT 10 OFFSET 10",

    "union_branches" ->
      s"SELECT (SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_nationkey = 1) + (SELECT count(*) FROM $EdgesContains e JOIN orders o ON e.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_nationkey = 1) AS value",
    "and_filter" ->
      "SELECT count(*) AS value FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0) AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 50000.0)",
    "or_filter" ->
      "SELECT count(*) AS value FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0) OR EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 20000.0)",
    "not_filter" ->
      "SELECT count(*) AS value FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "where_store_q8" ->
      """WITH small AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_totalprice < 20000.0),
        | sp AS (SELECT DISTINCT l.l_partkey AS pk FROM small s JOIN orders o ON o.o_custkey = s.ck JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        | c2 AS (SELECT DISTINCT o2.o_custkey AS ck FROM sp JOIN lineitem l2 ON l2.l_partkey = sp.pk JOIN orders o2 ON o2.o_orderkey = l2.l_orderkey)
        |SELECT count(*) AS value FROM c2 WHERE ck NOT IN (SELECT ck FROM small)""".stripMargin,
    "repeat_hop" ->
      "SELECT count(*) AS value FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_nationkey = 7",
  )
}
