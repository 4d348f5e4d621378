package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * A distributed property graph: two DataFrames.
 *
 *  - `vertices`: `id: LONG, label: STRING, <one typed column per property key>`
 *  - `edges`:    `src: LONG, dst: LONG, label: STRING, <property columns>`
 *
 * This is the Spark-native re-expression of the reference's data model
 * (Grasper `storage/layout.hpp:18-38`: adjacency lists + KV property
 * stores, hash-partitioned by id — `core/id_mapper.hpp:76-101`). Instead
 * of row-oriented KV stores we use columnar Parquet-backed DataFrames:
 * one nullable typed column per property key gives key-presence checks
 * (`has(k)` = `col(k).isNotNull`) for free, and Catalyst prunes/pushes
 * filters into the scan. Partitioning/locality routing is delegated to
 * Spark's shuffle: traversals are equi-joins on `src`/`dst`.
 *
 * Edge identity follows the reference: an edge IS its `(src, dst)` pair
 * (packed `eid_t`, `base/type.hpp:156-184` — no multigraph ids).
 */
final case class GraphStore(vertices: DataFrame, edges: DataFrame) {
  require(vertices.columns.contains("id"), "vertices need an `id` column")
  require(edges.columns.contains("src") && edges.columns.contains("dst"),
    "edges need `src`/`dst` columns")

  /** Property keys present on vertices (everything but id/label). */
  def vertexKeys: Seq[String] =
    vertices.columns.filterNot(c => c == "id" || c == "label").toSeq
  /** Property keys present on edges (everything but src/dst/label). */
  def edgeKeys: Seq[String] =
    edges.columns.filterNot(c => c == "src" || c == "dst" || c == "label").toSeq

  /** Cache both sides (useful for repeated interactive traversals). */
  def cached(): GraphStore =
    GraphStore(vertices.cache(), edges.cache())

  /**
   * Persist as bucketed tables: vertices bucketed+sorted by `id`,
   * edges by `src`. Traversal (`out()`) and property-attach joins then
   * read pre-hashed buckets and skip the table-side shuffle exchange —
   * at 100 TB the edges-side exchange IS the job cost, so bucketing is
   * the difference between one network pass per hop and none. (The
   * reference gets the same effect from hash-partitioning vertices and
   * edges by id at load, `core/id_mapper.hpp:76-101`.)
   *
   * Uses the session catalog: with a real metastore the tables persist
   * across sessions; with the default in-memory catalog they live for
   * the session (enough for a long-running service or bench).
   */
  def saveBucketed(prefix: String = "graft", buckets: Int = 32): Unit = {
    // the in-memory catalog forgets tables across sessions while their
    // warehouse directories persist; drop first so overwrite can't hit
    // LOCATION_ALREADY_EXISTS
    val spark = vertices.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_vertices")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_edges")
    vertices.write.format("parquet")
      .bucketBy(buckets, "id").sortBy("id")
      .mode("overwrite").saveAsTable(s"${prefix}_vertices")
    edges.write.format("parquet")
      .bucketBy(buckets, "src").sortBy("src")
      .mode("overwrite").saveAsTable(s"${prefix}_edges")
  }
}

object GraphStore {

  /** Load a graph previously written by [[GraphStore.saveBucketed]]. */
  def loadBucketed(spark: SparkSession,
                   prefix: String = "graft"): GraphStore =
    GraphStore(spark.table(s"${prefix}_vertices"),
      spark.table(s"${prefix}_edges"))

  /**
   * Load a graph from the reference's HDFS-text layout
   * (`docs/Tutorial.md:8-42`, `storage/data_store.cpp`):
   *
   *   - `dir/vertices/part_*`:      `vid \t num_in \t in… \t num_out \t out…`
   *   - `dir/vtx_property/part_*`:  `vid \t label_id \t [k:v,k:v…]`
   *   - `dir/edge_property/part_*`: `src \t dst \t label_id \t [k:v…]`
   *   - `dir/index/{vtx,edge}_label`:          `name \t id`
   *   - `dir/index/{vtx,edge}_property_index`: `name \t id \t type`
   *     (type tags 1=int 2=double 3=char 4=string, `base/type.hpp:307-313`)
   *
   * Labels and property keys are de-dictionary-encoded back to their
   * human-readable strings; each property key becomes one typed column.
   * Edge direction note: the loader treats column 1 as source and column 2
   * as destination, matching `storage/data_store.cpp:781-786` (the Tutorial's
   * `{in_vid}{out_vid}` naming is the confusing part, not the semantics).
   */
  def grasperText(spark: SparkSession, dir: String): GraphStore = {
    import spark.implicits._

    def readIdx(path: String): Map[String, (String, Int)] = {
      // name -> (idStr, typeTag); typeTag 0 when absent (label files)
      spark.read.textFile(path).collect().toSeq
        .filter(_.trim.nonEmpty)
        .map { line =>
          val parts = line.trim.split("\\s+")
          val tpe = if (parts.length > 2) parts(2).toInt else 0
          (parts(0), (parts(1), tpe))
        }.toMap
    }
    val vLabels  = readIdx(s"$dir/index/vtx_label").map { case (n, (i, _)) => i -> n }
    val eLabels  = readIdx(s"$dir/index/edge_label").map { case (n, (i, _)) => i -> n }
    val vpIndex  = readIdx(s"$dir/index/vtx_property_index")
    val epIndex  = readIdx(s"$dir/index/edge_property_index")

    def sparkType(tag: Int): DataType = tag match {
      case 1 => IntegerType
      case 2 => DoubleType
      case _ => StringType // 3=char and 4=string both map to STRING
    }

    // vid \t label_id \t [1:"marko",2:29]
    val vpLines = spark.read.textFile(s"$dir/vtx_property/part_*")
      .filter(_.trim.nonEmpty)
      .map { line =>
        val cols = line.trim.split("\t")
        val body = cols(2).stripPrefix("[").stripSuffix("]")
        val kvs = splitTopLevel(body).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          (k.trim, v.trim.stripPrefix("\"").stripSuffix("\""))
        }
        (cols(0).toLong, cols(1), kvs.toMap)
      }.toDF("id", "label_id", "props")

    var vertices = vpLines
      .withColumn("label", mapLookup(vLabels, col("label_id")))
      .drop("label_id")
    for ((name, (pid, tag)) <- vpIndex.toSeq.sortBy(_._2._1.toInt)) {
      vertices = vertices.withColumn(
        name, element_at(col("props"), pid).cast(sparkType(tag)))
    }
    vertices = vertices.drop("props")

    val epLines = spark.read.textFile(s"$dir/edge_property/part_*")
      .filter(_.trim.nonEmpty)
      .map { line =>
        val cols = line.trim.split("\t")
        val body = cols(3).stripPrefix("[").stripSuffix("]")
        val kvs = splitTopLevel(body).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          (k.trim, v.trim.stripPrefix("\"").stripSuffix("\""))
        }
        (cols(0).toLong, cols(1).toLong, cols(2), kvs.toMap)
      }.toDF("src", "dst", "label_id", "props")

    var edges = epLines
      .withColumn("label", mapLookup(eLabels, col("label_id")))
      .drop("label_id")
    for ((name, (pid, tag)) <- epIndex.toSeq.sortBy(_._2._1.toInt)) {
      edges = edges.withColumn(
        name, element_at(col("props"), pid).cast(sparkType(tag)))
    }
    edges = edges.drop("props")

    GraphStore(vertices, edges)
  }

  /** Split "1:\"ma,rko\",2:29" on commas not inside quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach {
      case '"'            => inQ = !inQ; cur += '"'
      case ',' if !inQ    => out += cur.toString(); cur.clear()
      case c              => cur += c
    }
    if (cur.nonEmpty) out += cur.toString()
    out.toSeq
  }

  /** Dictionary lookup as a map LITERAL (codegen'd, no UDF); missing
    * keys yield null (try_element_at — plain element_at throws under
    * ANSI mode). Dictionaries are label/property-name sized. */
  private def mapLookup(m: Map[String, String], key: org.apache.spark.sql.Column) = {
    val entries = m.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    try_element_at(map(entries: _*), key)
  }

  /**
   * The 6-vertex "modern" graph the reference bundles as its only
   * correctness fixture (`data/vertices/part_1`, `data/graph-example-1.jpg`;
   * marko/vadas/lop/josh/ripple/peter). Used by the per-operator specs.
   */
  def modern(spark: SparkSession): GraphStore = {
    import spark.implicits._
    val vertices = Seq(
      (1L, "person",   "marko",  Some(29), Option.empty[String]),
      (2L, "person",   "vadas",  Some(27), Option.empty[String]),
      (3L, "software", "lop",    Option.empty[Int], Some("java")),
      (4L, "person",   "josh",   Some(32), Option.empty[String]),
      (5L, "software", "ripple", Option.empty[Int], Some("java")),
      (6L, "person",   "peter",  Some(35), Option.empty[String]),
    ).toDF("id", "label", "name", "age", "lang")
    val edges = Seq(
      (1L, 2L, "knows",   0.5),
      (1L, 3L, "created", 0.4),
      (1L, 4L, "knows",   1.0),
      (4L, 5L, "created", 1.0),
      (4L, 3L, "created", 0.4),
      (6L, 3L, "created", 0.2),
    ).toDF("src", "dst", "label", "weight")
    GraphStore(vertices, edges)
  }

  // Id-space offsets for the TPC-H-derived graph. Vertex ids must be
  // unique across the three source tables; the oracle SQL reproduces the
  // same arithmetic, so keep these stable.
  val OrderIdOffset = 1000000000L
  val PartIdOffset  = 2000000000L

  /**
   * Derive an sf-scalable property graph from the driver's TPC-H-ish
   * tables (`FIXTURES.md §B`):
   *
   *   customer -[placed]-> order -[contains]-> part
   *
   * Vertex schema (union of per-label properties, nullable):
   *   id, label, name, nationkey, acctbal, mktsegment,    (customer)
   *   totalprice, orderstatus, orderpriority,             (order)
   *   brand, type, size, retailprice                      (part)
   * Edge schema: src, dst, label, plus `quantity`/`extendedprice` on
   * `contains` edges (from lineitem).
   *
   * Every traversal over this graph has an equivalent SQL join that the
   * DuckDB oracle can run — that is the point of the derivation.
   */
  def tpch(spark: SparkSession, sfDir: String): GraphStore = {
    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    val customer = tbl("customer")
    val orders   = tbl("orders")
    val part     = tbl("part")
    val lineitem = tbl("lineitem")

    val nullS = lit(null).cast(StringType)
    val nullD = lit(null).cast(DoubleType)
    val nullI = lit(null).cast(IntegerType)

    val vCust = customer.select(
      col("c_custkey").cast(LongType).as("id"),
      lit("customer").as("label"),
      col("c_name").as("name"),
      col("c_nationkey").cast(IntegerType).as("nationkey"),
      col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("mktsegment"),
      nullD.as("totalprice"), nullS.as("orderstatus"), nullS.as("orderpriority"),
      nullS.as("brand"), nullS.as("type"), nullI.as("size"), nullD.as("retailprice"))

    val vOrd = orders.select(
      (col("o_orderkey") + OrderIdOffset).cast(LongType).as("id"),
      lit("order").as("label"),
      nullS.as("name"), nullI.as("nationkey"), nullD.as("acctbal"),
      nullS.as("mktsegment"),
      col("o_totalprice").as("totalprice"),
      col("o_orderstatus").as("orderstatus"),
      col("o_orderpriority").as("orderpriority"),
      nullS.as("brand"), nullS.as("type"), nullI.as("size"), nullD.as("retailprice"))

    val vPart = part.select(
      (col("p_partkey") + PartIdOffset).cast(LongType).as("id"),
      lit("part").as("label"),
      col("p_name").as("name"),
      nullI.as("nationkey"), nullD.as("acctbal"), nullS.as("mktsegment"),
      nullD.as("totalprice"), nullS.as("orderstatus"), nullS.as("orderpriority"),
      col("p_brand").as("brand"), col("p_type").as("type"),
      col("p_size").as("size"), col("p_retailprice").as("retailprice"))

    val ePlaced = orders.select(
      col("o_custkey").cast(LongType).as("src"),
      (col("o_orderkey") + OrderIdOffset).cast(LongType).as("dst"),
      lit("placed").as("label"),
      nullD.as("quantity"), nullD.as("extendedprice"))

    // Edge identity is (src,dst) per the reference's eid_t — collapse
    // multi-line lineitems into one contains edge, summing measures.
    val eContains = lineitem.groupBy(col("l_orderkey"), col("l_partkey")).agg(
      sum("l_quantity").as("quantity"),
      sum("l_extendedprice").as("extendedprice"))
      .select(
        (col("l_orderkey") + OrderIdOffset).cast(LongType).as("src"),
        (col("l_partkey") + PartIdOffset).cast(LongType).as("dst"),
        lit("contains").as("label"),
        col("quantity"), col("extendedprice"))

    GraphStore(
      vCust.unionByName(vOrd).unionByName(vPart),
      ePlaced.unionByName(eContains))
  }
}
