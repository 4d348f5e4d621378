package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * [[VectorExpressions.NearestCellBc]] ↔ broadcast-join argmin parity:
 * the expression replaces the `crossJoin(broadcast(cdf)) +
 * min(struct(__d, __cell))` assignment on the IVF fit/ingest/refit
 * paths, so its argmin — distance arithmetic, accumulation order, and
 * tie-breaking — must equal the join formulation exactly, including
 * exact-tie vectors (equidistant cells pick the LOWEST cell id both
 * ways).
 */
class NearestCellBcSpec extends SparkSpec {
  import spark.implicits._

  // deterministic float vectors, incl. the all-zero vector (ties to
  // EVERY centroid at d = cnorm2 differences) and a vector exactly on
  // the perpendicular bisector of centroids 0 and 1
  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.5f, 0.5f, 0.0f, 0.0f)), // exact tie between c0 and c1
    (4L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // ties where cnorm2 ties
    (5L, Array(-1.0f, 2.0f, 0.25f, -0.125f)),
    (6L, Array(0.1f, 0.2f, 0.3f, 0.4f))
  ).toDF("id", "v")

  private val centroids: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0), // same norm as c0 — exercises the tie
    Array(0.0, 0.0, 1.0, 1.0),
    Array(0.25, 0.25, 0.25, 0.25))

  test("NearestCellBc equals the broadcast-join min(struct) argmin") {
    VectorExpressions.register(spark)
    val cdf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, c.map(x => x * x).sum) }
      .toSeq.toDF("__cell", "__cvec", "__cnorm2")
    val joined = vecs.crossJoin(broadcast(cdf))
      .withColumn("__d", col("__cnorm2") -
        lit(2.0) * VectorExpressions.dot(col("v"), col("__cvec")))
      .groupBy(col("id"), col("v"))
      .agg(min(struct(col("__d"), col("__cell")))
        .getField("__cell").as("__cell"))
      .select(col("id"), col("__cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bc = spark.sparkContext.broadcast(
      centroids.map(c => (c, c.map(x => x * x).sum)))
    val expr = vecs.select(col("id"),
        VectorExpressions.nearestCellBc(col("v"), bc).as("__cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(expr === joined)
    // exact-tie resolution: against the two equal-norm centroids alone,
    // the bisector vector and the zero vector are equidistant from
    // both — the argmin must take the LOWEST cell id, like the
    // lexicographic struct-min
    val bc2 = spark.sparkContext.broadcast(
      centroids.take(2).map(c => (c, c.map(x => x * x).sum)))
    val ties = vecs.filter(col("id").isin(3L, 4L))
      .select(col("id"),
        VectorExpressions.nearestCellBc(col("v"), bc2).as("__cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ties(3L) === 0)
    assert(ties(4L) === 0)
  }

  test("PqCodesBc equals the subvector-explode join argmin encode") {
    VectorExpressions.register(spark)
    // two 2-dim subspaces over the 4-dim fixture vectors, 3 codes each
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.5, 0.5)),
      Array(Array(0.0, 0.0), Array(0.25, -0.125), Array(1.0, 1.0)))
    val sd = 2
    val bdf = books.zipWithIndex.flatMap { case (cs, s) =>
      cs.zipWithIndex.map { case (c, i) =>
        (s, i, c.toSeq, c.map(x => x * x).sum) }
    }.toSeq.toDF("__sub", "__cell", "__cvec", "__cnorm2")
    val sub = vecs.select(col("id"), explode(expr(
        s"transform(sequence(0, 1), s -> " +
        s"struct(s AS sub, slice(v, s * $sd + 1, $sd) AS sv))")).as("__p"))
      .select(col("id"), col("__p.sub").as("__sub"),
        col("__p.sv").as("__v"))
    val joined = sub.join(broadcast(bdf), "__sub")
      .withColumn("__d", col("__cnorm2") -
        lit(2.0) * VectorExpressions.dot(col("__v"), col("__cvec")))
      .groupBy(col("id"), col("__sub"), col("__v"))
      .agg(min(struct(col("__d"), col("__cell")))
        .getField("__cell").as("__code"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(
        struct(col("__sub"), col("__code")))),
        s => s.getField("__code")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val bc = spark.sparkContext.broadcast(
      books.map(_.map(c => (c, c.map(x => x * x).sum))))
    val fused = vecs.select(col("id"),
        VectorExpressions.pqCodesBc(col("v"), bc).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fused === joined)
  }
}
