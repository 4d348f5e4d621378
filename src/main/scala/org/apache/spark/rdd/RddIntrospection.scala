package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is private to Spark's rdd package;
  * graft.Sweep needs it to distinguish transient checkpoint blocks from
  * long-lived cache() storage. This accessor lives under
  * `org.apache.spark.rdd` solely to re-export that one flag — no other
  * internals are touched. */
object RddIntrospection {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
