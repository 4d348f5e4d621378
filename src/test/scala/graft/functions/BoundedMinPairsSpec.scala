package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * [[BoundedMinPairs]] ↔ `row_number` window parity (the r10 verdict
 * wiring item + the r10 advice divergence): the aggregate replaces
 * every per-query top-k window in `SimilarityOps`, so its selection
 * AND order must equal the window formulation exactly — including
 * duplicate (score, id) input rows, which the original TreeSet buffer
 * collapsed where the window counts them.
 */
class BoundedMinPairsSpec extends SparkSpec {
  import spark.implicits._

  /** (key, id, score) fixture: a hot key with score ties across ids,
    * EXACT duplicate (score, id) rows (2× and 3×), a singleton key,
    * and a null-score row (skipped by the aggregate, ranked last by
    * the window — excluded from the compared cut while cap < group
    * size). */
  private lazy val fixture = Seq(
    (1L, 10L, Some(0.9)), (1L, 10L, Some(0.9)), (1L, 11L, Some(0.9)),
    (1L, 12L, Some(0.5)), (1L, 13L, Some(0.5)), (1L, 13L, Some(0.5)),
    (1L, 13L, Some(0.5)), (1L, 14L, Some(0.1)),
    (2L, 20L, Some(0.3)), (2L, 21L, Some(0.7)),
    (3L, 30L, Some(0.4))
  ).toDF("k", "id", "s")

  private def windowCut(df: org.apache.spark.sql.DataFrame, cap: Int,
                        descending: Boolean): Set[(Long, Long, Double, Int)] = {
    val ord = if (descending) col("s").desc else col("s").asc
    df.filter(col("s").isNotNull)
      .withColumn("rank", row_number().over(
        Window.partitionBy("k").orderBy(ord, col("id"))))
      .filter(col("rank") <= cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  private def aggCut(df: org.apache.spark.sql.DataFrame, cap: Int,
                     descending: Boolean): Set[(Long, Long, Double, Int)] = {
    val sk = if (descending) -col("s") else col("s")
    df.groupBy("k")
      .agg(VectorExpressions.boundedMinPairs(sk, col("id"), cap).as("top"))
      .select(col("k"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("k"), col("p.id"),
        (if (descending) -col("p.s") else col("p.s")).as("s"),
        (col("pos") + 1).cast("int").as("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  test("equals the window cut at every cap, both directions") {
    for (cap <- Seq(1, 2, 3, 4, 5, 100); desc <- Seq(true, false)) {
      // repartition(7) forces real partial buffers + reduce merges
      val df = fixture.repartition(7)
      assert(aggCut(df, cap, desc) == windowCut(df, cap, desc),
        s"cap=$cap descending=$desc")
    }
  }

  test("duplicate rows carry multiplicity like row_number") {
    // 3 copies of (0.5, 13): at cap 6 descending the window keeps
    // ranks 1..6 = {10,10,11,12,13,13} — the cut SPLITS the dup group,
    // which only a multiset buffer can reproduce
    val got = aggCut(fixture, 6, descending = true)
    val want = windowCut(fixture, 6, descending = true)
    assert(got == want)
    assert(got.count { case (k, id, _, _) => k == 1L && id == 13L } == 2)
  }

  test("null scores are skipped, null ids are skipped") {
    val withNulls = (fixture.collect().map(r =>
        (r.getLong(0), Option(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq ++
      Seq((1L, None, Some(0.95)), (1L, Some(99L), None)))
      .toDF("k", "id", "s")
    // null-bearing rows never enter the aggregate; the window replica
    // filters them for the comparison
    val got = aggCut(withNulls, 3, descending = true)
    val want = windowCut(withNulls.filter(col("id").isNotNull), 3,
      descending = true)
    assert(got == want)
    assert(!got.exists(_._2 == 99L))
  }

  test("random multisets: agg == driver replica across partitionings") {
    val rnd = new scala.util.Random(42)
    // small score/id domains force heavy duplication and ties
    val rows = Seq.fill(400)((rnd.nextInt(5).toLong,
      rnd.nextInt(8).toLong, rnd.nextInt(4) * 0.25))
    for (cap <- Seq(1, 3, 7); parts <- Seq(1, 5)) {
      val df = rows.toDF("k", "id", "s").repartition(parts)
      val got = aggCut(df, cap, descending = false)
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        rs.map(r => (r._3, r._2)).sorted.take(cap).zipWithIndex
          .map { case ((s, id), i) => (k, id, s, i + 1) }
      }.toSet
      assert(got == want, s"cap=$cap parts=$parts")
    }
  }
}
