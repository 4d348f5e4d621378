package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Physical-plan shape guards for the round-6 pipeline operators — the
 * same policy as gremlin's PlanSpec: the properties that keep these
 * viable at 100 TB are plan properties (partial aggregation, equi-join
 * candidates, bounded exchanges), invisible to result-equality gates.
 */
class OperatorPlanSpec extends SparkSpec {

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dedupTokenBlocks: partial-agg first occurrence, no cartesian") {
    val p = plan(DedupOps.dedupTokenBlocks(docs, blockSize = 4))
    // the winner-per-segment min(struct) must combine map-side — a hot
    // boilerplate paragraph then collapses per map task, not per key
    assert(p.contains("partial_min"), p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("bigramFit: map-side partial counts, equi-joins only") {
    val p = plan(graft.operators.TextOps.bigramFit(docs))
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("shardShuffle: one narrow projection + one window exchange") {
    val df = CurationOps.shardShuffle(docs, nShards = 8)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(1200))
    // a single hash exchange (the per-shard window); no global sort
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"$exchanges exchanges:\n${p.take(1200)}")
  }

  test("commonNeighbors salt cells join as equi-join on (src, chunks)") {
    val g = graft.sources.GraphStore.tpch(spark, "/root/testdata/sf0.001")
    val p = plan(GraphAlgos.commonNeighbors(g, "contains", k = 20))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("__ci") && p.contains("__cj"),
      "salt columns must be join keys")
  }

  test("compressionRatio plans with no shuffle") {
    val p = plan(TextOps.compressionRatio(docs))
    assert(!p.contains("Exchange"), p.take(1200))
  }
}
