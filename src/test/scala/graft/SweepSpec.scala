package graft

import org.apache.spark.sql.functions._

/** Sweep frees exactly the locally-checkpointed intermediates: cached
  * tables (the long-lived graph/index storage) must survive. */
class SweepSpec extends SparkSpec {

  test("transientStorage frees checkpoints, leaves cache() entries") {
    import spark.implicits._
    val cached = (1 to 100).toDF("n").cache()
    cached.count() // materialize the CacheManager entry

    val ck = (1 to 50).toDF("m").withColumn("sq", col("m") * col("m"))
      .localCheckpoint(false)
    ck.count() // materialize the lazy checkpoint blocks

    val before = spark.sparkContext.getPersistentRDDs.values
    assert(before.exists(org.apache.spark.rdd.RddIntrospection.isLocallyCheckpointed),
      "fixture: a locally-checkpointed RDD should be registered")

    val freed = Sweep.transientStorage(spark)
    assert(freed >= 1)
    val after = spark.sparkContext.getPersistentRDDs.values
    assert(!after.exists(org.apache.spark.rdd.RddIntrospection.isLocallyCheckpointed),
      "all locally-checkpointed RDDs should be unpersisted")

    // the cached table still answers from storage and is still cached
    assert(cached.count() == 100)
    assert(cached.storageLevel.useMemory, "cache() entry must survive the sweep")
    cached.unpersist()
  }
}
