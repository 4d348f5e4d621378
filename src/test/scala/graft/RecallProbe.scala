package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope probe: per-query ANN hit counts vs brute force at a
  * given sfDir, in the three recall-gate configurations — used to
  * pick (and re-check) the gates' safe floors. Floors must sit with
  * margin below the minimum printed here at the driver's verify sf. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val exact = operators.SimilarityOps.bruteForceTopK(q, e, k = 5)
      .select("query_id", "neighbor_id").cache()
    def hits(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val h = exact.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      println(s"$name: ${h.mkString(" ")}")
    }
    hits("lsh(floor=2)", operators.SimilarityOps.lshTopK(q, e, k = 5))
    val ivf = operators.SimilarityOps.fitIvfCentroids(e, k = 16, iters = 3)
    hits("ivf_nprobe8(floor=1)",
      operators.SimilarityOps.ivfTopK(q, e, ivf, nprobe = 8, k = 5))
    val pq = operators.SimilarityOps.fitPq(e, m = 8, k = 16, iters = 3)
    hits("pq_rerank50(floor=1)",
      operators.SimilarityOps.pqRerank(q, e, pq, k = 5, shortlist = 50))
    val ivfpq = operators.SimilarityOps.fitIvfPq(e, ivf, m = 8, k = 16,
      iters = 3)
    hits("ivfpq_nprobe8_rerank50(floor=1)",
      operators.SimilarityOps.ivfPqRerank(q, e, ivf, ivfpq, nprobe = 8,
        k = 5, shortlist = 50))
    hits("ivfpq_nprobe12_rerank100",
      operators.SimilarityOps.ivfPqRerank(q, e, ivf, ivfpq, nprobe = 12,
        k = 5, shortlist = 100))
    // OPQ face: rotate corpus+queries, fit PQ in the rotated space,
    // rerank — rotation preserves exact cosine, so the unrotated brute
    // force stays the ground truth
    val rot = operators.SimilarityOps.fitOpqRotation(e, dim = 64, m = 8)
    val er = operators.SimilarityOps.applyOpqRotation(e, rot).cache()
    val qr = er.filter(col("vec_id") < 10)
    val opqBooks = operators.SimilarityOps.fitPq(er, m = 8, k = 16, iters = 3)
    hits("opq_rerank50",
      operators.SimilarityOps.pqRerank(qr, er, opqBooks, k = 5,
        shortlist = 50))
    // PCA-truncation face: coarse-search in the top 16 of 64
    // components, exact rerank
    val prot = operators.SimilarityOps.fitPcaRotation(e, dim = 64)
    hits("pca16_rerank50",
      operators.SimilarityOps.pcaRerank(q, e, prot, dims = 16, k = 5,
        shortlist = 50))
    hits("pca16_rerank100",
      operators.SimilarityOps.pcaRerank(q, e, prot, dims = 16, k = 5,
        shortlist = 100))
    hits("binary_rerank100(floor=2)",
      operators.SimilarityOps.binaryRerank(q, e, k = 5, shortlist = 100))
    // MaxSim rerank face: ground truth is the EXACT MaxSim ranking,
    // not pooled brute force (late interaction ranks differently)
    val msExact = operators.SimilarityOps.maxSimTopK(q, e, k = 5)
      .select("query_id", "neighbor_id").cache()
    val msApprox = operators.SimilarityOps.maxSimRerank(q, e, k = 5)
    val msHits = msExact.join(
        msApprox.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    println(s"maxsim_token_rerank(floor=2): ${msHits.mkString(" ")}")
    spark.stop()
  }
}
