package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines, each designed
 * for the 100 TB case:
 *
 *  - [[exact]]: hash-groupBy — one shuffle on the text key, map-side
 *    partial aggregation.
 *  - [[minhashLsh]]: shingle → minhash → band → bucket-join. The only
 *    shuffles are the band-bucket self-join and the verification join;
 *    candidate volume is O(true-positive + collisions), never O(n²).
 *  - [[tokenJaccard]]: EXACT all-pairs Jaccard via prefix filtering
 *    (AllPairs/PPJoin): only each document's rarest
 *    (1-τ)·|d|+1 tokens are indexed, which prunes the candidate space
 *    while provably keeping every pair with similarity ≥ τ.
 *  - [[simhash]]: 64-bit SimHash + Hamming-≤k pairs via the pigeonhole
 *    band trick (k+1 blocks; any pair within distance k shares a block).
 *  - [[embeddingNearDup]]: cosine threshold pairs — brute-force
 *    (broadcast-nested-loop) baseline; LSH-bucketed scale path in
 *    [[SimilarityOps]].
 *
 * All signature computation is pure Column expressions (codegen'd).
 */
object DedupOps {

  /** Exact dedup: keep the smallest id per distinct text, plus the
    * duplicate count. One shuffle, partial-aggregated map-side. */
  def exact(df: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col(textCol), col("dup_count"))

  /**
   * Cross-snapshot INCREMENTAL exact dedup: each call persists the
   * increment's per-text partial aggregate `(text, min id, count)` —
   * [[exact]] over just the increment — under `statePath`
   * ([[StateStore]] committed dirs), and returns the MERGED corpus-wide
   * answer: `groupBy(text).agg(min(id), sum(count))` over all committed
   * partials, which equals [[exact]] on the union corpus exactly
   * (min and sum are associative — this is the map-side-combine shape,
   * each increment's rows reduced once, at ingest). Re-presenting an
   * ingested increment is a no-op: ids already in state are anti-joined
   * out (the id ledger is the stored docs themselves) and a fully
   * re-presented increment short-circuits without growing the state.
   * A crash before COMMIT leaves a dir the retry overwrites.
   */
  def exactIncremental(newDocs: DataFrame, statePath: String,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    val prior = StateStore.committed(spark, statePath)
    val incoming0 = newDocs.select(col(idCol).as("__id"),
      col(textCol).as("__text"))
    // the partial keeps only each text's MIN id, so idempotence needs
    // the ledger of EVERY ingested id (the stored docs themselves) —
    // a re-presented duplicate whose id lost the min would otherwise
    // re-count
    val incoming = if (prior.isEmpty) incoming0 else
      incoming0.join(
        spark.read.parquet(prior.map(_ + "/docs"): _*).select("__id"),
        Seq("__id"), "left_anti")
    val merged = (dirs: Seq[String]) =>
      spark.read.parquet(dirs.map(_ + "/partial"): _*)
        .groupBy(col("__text"))
        .agg(min(col("__id")).as(idCol), sum(col("__n")).as("dup_count"))
        .select(col(idCol), col("__text").as(textCol), col("dup_count"))
    // a fully-anti-joined-out re-run must not grow the state (a retry
    // loop would otherwise commit one empty dir per call)
    if (incoming.isEmpty && prior.nonEmpty) return merged(prior)
    if (incoming.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(idCol, newDocs.schema(idCol).dataType),
          StructField(textCol, newDocs.schema(textCol).dataType),
          StructField("dup_count", LongType))))
    // write the increment ONCE and derive the partial from the
    // read-back snapshot: one evaluation of the anti-join, and the
    // ledger and partial can never diverge even if newDocs is not
    // deterministic across evaluations
    val dir = StateStore.nextDir(spark, statePath)
    incoming.write.mode("overwrite").parquet(s"$dir/docs")
    spark.read.parquet(s"$dir/docs")
      .groupBy(col("__text"))
      .agg(min(col("__id")).as("__id"), count(lit(1)).as("__n"))
      .write.mode("overwrite").parquet(s"$dir/partial")
    StateStore.commit(spark, dir)
    merged(prior :+ dir)
  }

  /** Distinct word n-gram shingles of a text column (native
    * expression; register() required — operator entry points do it). */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.VectorExpressions.wordShingles(text, n)

  /** MinHash signature — native Catalyst expression (one FNV-1a base
    * hash per shingle + `numHashes` splitmix remixes in a tight JVM
    * loop; the HOF formulation interprets per element and dominated the
    * whole LSH runtime). Requires
    * [[graft.functions.VectorExpressions.register]] (callers here do it). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.VectorExpressions.minhashSig(shingles, numHashes)

  /** Exact Jaccard between two shingle-array columns (count-only
    * native intersection; inputs are distinct sets by construction). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.VectorExpressions
      .setIntersectSize(a, b).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }

  /**
   * MinHash + LSH near-duplicate pairs with exact verification.
   *
   * Returns `(id_a, id_b, jaccard)` for every pair the LSH bands
   * surface whose TRUE shingle Jaccard ≥ `tau` (id_a < id_b). With the
   * default 128 hashes in 32 bands of 4, the probability of missing a
   * pair at τ=0.8 is (1-0.8⁴)³² ≈ 5·10⁻⁸ — effectively exact recall at
   * the threshold, with candidate generation linear in collisions.
   *
   * Skew guard: a band bucket holding more than `maxBucket` postings
   * (a degenerate shingle population — boilerplate, empty-ish docs)
   * would alone contribute O(size²) candidates, so each bucket is
   * truncated to its `maxBucket` smallest ids. Truncation is NOT
   * silent: the number of truncated postings is published via
   * `Dataset.observe` and warn-logged by [[CapMetrics]] when nonzero
   * ([[CapMetrics.last]]("minhashLsh")). Recall note: a pair whose
   * bucket was truncated in one band survives only through OTHER bands
   * where its bucket is small — for a fully-degenerate group (identical
   * signatures, so the SAME oversized bucket in every band) pairs
   * outside the kept id prefix are genuinely dropped; that loss is
   * exactly what the observed `capped_postings` metric reports.
   */
  def minhashLsh(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", shingleN: Int = 3,
                 numHashes: Int = 128, bands: Int = 32,
                 tau: Double = 0.8, maxBucket: Int = 4096): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.functions.VectorExpressions.register(df.sparkSession)
    val docs = shingleDocs(df, idCol, textCol, shingleN)
    val banded0 = bandHashes(docs, numHashes, bands)
    // rank within bucket; the (band, bh) shuffle this needs is the same
    // distribution the self-join below uses, so it is not an extra pass
    val ranked = banded0.withColumn("__brn", row_number().over(
      Window.partitionBy(col("__band"), col("__bh")).orderBy(col("__id"))))
    // The bucket-join is a SELF-join of the ranked postings; a lazy
    // localCheckpoint computes the 128-hash signatures and the bucket
    // window ONCE, and both sides read the narrow (id, band, bucket,
    // rank) rows. The observe must sit ABOVE the checkpoint (and on one
    // side only): metrics surface through the main action's
    // QueryExecutionListener, which checkpoint materialization bypasses.
    val ranked1 = ranked.localCheckpoint(false)
    val observed = CapMetrics.observe(ranked1, "minhashLsh",
      sum(when(col("__brn") > maxBucket, 1L).otherwise(0L))
        .as("capped_postings"),
      max(col("__brn")).as("max_bucket_size"))
    val l = observed.filter(col("__brn") <= maxBucket)
      .select(col("__band"), col("__bh"), col("__id").as("id_a"))
    val r = ranked1.filter(col("__brn") <= maxBucket)
      .select(col("__band"), col("__bh"), col("__id").as("id_b"))
    val candidates = l.join(r, Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    verifyPairs(candidates, docs, tau)
  }

  /** Shingle projection shared by the one-shot and incremental LSH
    * paths: `(__id, __sh)`, empty-shingle docs dropped (they cannot
    * pair). */
  private def shingleDocs(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int): DataFrame =
    df.select(col(idCol).as("__id"),
      wordShingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)

  /** Band projection shared by the one-shot and incremental LSH paths:
    * one `(__id, __band, __bh)` posting per (doc, band), the band hash
    * folding that band's signature slice. */
  private def bandHashes(docs: DataFrame, numHashes: Int,
                         bands: Int): DataFrame = {
    val rows = numHashes / bands
    docs.withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .select(col("__id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("__sig"), b * rows + 1, rows))): _*))
          .as(Seq("__band", "__bh")))
  }

  /**
   * Cross-snapshot INCREMENTAL MinHash+LSH dedup — the nightly-crawl
   * shape: each call persists the increment's rows and raw band
   * postings under `statePath` (via [[StateStore]]'s committed
   * increment dirs) and emits only the near-dup pairs that TOUCH the
   * increment (new-new and new-old); old-old pairs were emitted when
   * their increment was ingested. The union of outputs across a run
   * sequence equals one [[minhashLsh]] recompute over the union corpus
   * (the equality gate), because the pair query is a pure function of
   * the committed state: stored postings are UNCAPPED, and each call
   * ranks the touched buckets by id before applying `maxBucket` — a
   * bucket's rank depends on that bucket's postings alone, so this is
   * exactly the ranking the one-shot run computes on those buckets.
   * (Under actual truncation an EARLIER run may have emitted pairs the
   * union-run cap would cut — increment ids interleaving old ids shift
   * the kept prefix — so the run-sequence union is a superset there; a
   * degenerate bucket past `maxBucket` postings is already an
   * observed/warn-logged recall loss in the one-shot path — see
   * [[minhashLsh]].)
   *
   * Restart-idempotent twice over: ids already in state are anti-joined
   * out (re-presenting an ingested increment is a no-op returning zero
   * pairs), and a crash between the parquet writes and the COMMIT
   * marker leaves an uncommitted dir the retry overwrites.
   *
   * Scale: per increment the archive pays one narrow columnar scan of
   * its (id, band, bucket) postings probed by a broadcast semi-join on
   * the increment's bucket keys — never a full-archive shuffle; the
   * rank window, bucket self-join, and exact verify all run on
   * increment-touched buckets only, so a nightly crawl pays for its
   * increment, not the archive.
   */
  def minhashLshIncremental(newDocs: DataFrame, statePath: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      tau: Double = 0.8, maxBucket: Int = 4096): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = newDocs.sparkSession
    graft.functions.VectorExpressions.register(spark)
    val prior = StateStore.committed(spark, statePath)

    val incoming0 = newDocs.select(col(idCol).as("__id"),
      col(textCol).as("__text"))
    val incoming = if (prior.isEmpty) incoming0 else
      incoming0.join(
        spark.read.parquet(prior.map(_ + "/docs"): _*).select("__id"),
        Seq("__id"), "left_anti")
    val idType = newDocs.schema(idCol).dataType
    if (incoming.isEmpty) // re-presented increment: no-op
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id_a", idType),
          StructField("id_b", idType),
          StructField("jaccard", DoubleType))))

    // ingest: rows + RAW (uncapped) postings; COMMIT only after both
    val dir = StateStore.nextDir(spark, statePath)
    incoming.write.mode("overwrite").parquet(s"$dir/docs")
    val incRead = spark.read.parquet(s"$dir/docs")
    bandHashes(shingleDocs(incRead, "__id", "__text", shingleN),
      numHashes, bands)
      .write.mode("overwrite").parquet(s"$dir/postings")
    StateStore.commit(spark, dir)

    // pair query over the committed state: only buckets the increment
    // TOUCHES can produce new pairs, and a bucket's id-rank is a
    // function of that bucket's postings alone — so the archive side
    // is a (broadcast) semi-join probe on the increment's bucket keys,
    // never a full-archive shuffle, and ranking the touched buckets
    // reproduces the one-shot run's cap on them exactly. Per nightly
    // increment the archive pays one narrow columnar posting scan;
    // everything downstream is increment-sized. The ranked postings
    // back BOTH sides of the self-join (lazy-cache invariant).
    val all = prior :+ dir
    val unionPost = spark.read.parquet(all.map(_ + "/postings"): _*)
    // increment ≪ archive is the operating regime, so the touched-key
    // set broadcasts; on the FIRST ingest it would be archive-sized
    // and the semi-join a no-op — skip it
    val pruned = if (prior.isEmpty) unionPost else
      unionPost.join(
        broadcast(spark.read.parquet(s"$dir/postings")
          .select("__band", "__bh").distinct()),
        Seq("__band", "__bh"), "left_semi")
    val ranked = pruned
      .withColumn("__brn", row_number().over(
        Window.partitionBy(col("__band"), col("__bh"))
          .orderBy(col("__id"))))
      .localCheckpoint(false)
    // truncation is never silent (the minhashLsh invariant): observed
    // on ONE side above the filter, names freshened by CapMetrics
    val observed = CapMetrics.observe(ranked, "minhashLshIncremental",
      sum(when(col("__brn") > maxBucket, 1L).otherwise(0L))
        .as("capped_postings"),
      max(col("__brn")).as("max_bucket_size"))
    val freshIds = spark.read.parquet(s"$dir/docs").select("__id")
    val l = observed.filter(col("__brn") <= maxBucket)
      .join(freshIds, Seq("__id"), "left_semi")
      .select(col("__band"), col("__bh"), col("__id").as("id_a"))
    val r = ranked.filter(col("__brn") <= maxBucket)
      .select(col("__band"), col("__bh"), col("__id").as("id_b"))
    // the candidate set feeds BOTH the verify join and the doc-side
    // pruning below (lazy-cache invariant for reused intermediates)
    val candidates = l.join(r, Seq("__band", "__bh"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
      .localCheckpoint(false)
    // shingle only the docs that appear in a candidate pair — without
    // this the exact-verify side re-shingles the WHOLE archive per
    // increment (the shingle kernel over every stored text), which at
    // archive ≫ increment dwarfs the increment's own work
    val candIds = candidates.select(col("id_a").as("__id"))
      .union(candidates.select(col("id_b"))).distinct()
    val docsNeeded = spark.read.parquet(all.map(_ + "/docs"): _*)
      .join(broadcast(candIds), Seq("__id"), "left_semi")
    verifyPairs(candidates,
      shingleDocs(docsNeeded, "__id", "__text", shingleN), tau)
  }

  /** Join candidate pairs back to shingle sets and keep true-Jaccard ≥ τ. */
  private def verifyPairs(candidates: DataFrame, docs: DataFrame,
                          tau: Double): DataFrame = {
    val da = docs.select(col("__id").as("id_a"), col("__sh").as("__sha"))
    val db = docs.select(col("__id").as("id_b"), col("__sh").as("__shb"))
    candidates.join(da, "id_a").join(db, "id_b")
      .withColumn("__j", jaccard(col("__sha"), col("__shb")))
      .filter(col("__j") >= tau) // filter on raw value; round for display
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
  }

  /**
   * EXACT token-set Jaccard ≥ τ via prefix filtering.
   *
   * Tokens are globally ordered by (document frequency, token); each doc
   * indexes only its first `|d| - ⌈τ·|d|⌉ + 1` tokens in that order.
   * Two docs with Jaccard ≥ τ must share an indexed prefix token
   * (AllPairs bound), so the candidate join over the prefix index is
   * lossless — and far smaller than an all-pairs product because
   * prefixes are the RAREST tokens. Verification recomputes true
   * Jaccard on the full sets.
   */
  def tokenJaccard(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   tau: Double = 0.9): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val docs = df.select(col(idCol).as("__id"),
      array_distinct(split(trim(col(textCol)), " ")).as("__sh"))
      .filter(size(col("__sh")) > 0)

    // set size is size(__sh) — __sh is already distinct, so carrying it
    // through the explode is exactly the per-doc count the former
    // count-over-Window computed, minus one Window pass (§2.4)
    val tokenDf = docs.select(col("__id"), size(col("__sh")).as("__n"),
      explode(col("__sh")).as("__tok"))
    val freq = tokenDf.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val perDoc = Window.partitionBy("__id")
    val withSize = tokenDf.join(freq, "__tok")
      .withColumn("__rank", row_number().over(
        perDoc.orderBy(col("__df"), col("__tok"))))
    // the candidate join below is a self-join of this prefix index;
    // lazy checkpoint computes the freq-join + rank window once and
    // serves both sides the narrow (token, id, size, rank) rows
    val prefix = withSize.filter(
      col("__rank") <= col("__n") - ceil(lit(tau) * col("__n")) + 1)
      .localCheckpoint(false)

    // Self-join skew guard: joining the two prefix sides on __tok alone
    // puts EVERY pair for a hot token in one task (a posting list of f
    // entries builds f²/2 pairs there — observed 8→47 s swings on a
    // 31-token corpus). Salt the join: split each token's posting list
    // into chunks of `chunk` ids (ordered by id, so chunk order follows
    // id order) and join on (token, left chunk, right chunk) with the
    // left side emitting its chunk × every later chunk and the right
    // side every earlier chunk × its chunk. Each unordered pair matches
    // exactly once (twice when both ids share a chunk — the id_a < id_b
    // filter keeps one), pairs-per-task is bounded by chunk², and the
    // duplication factor is m = ⌈f/chunk⌉ per side — sub-linear in the
    // f² pair count it spreads out.
    val chunk = 512
    val byTok = Window.partitionBy("__tok")
    val chunked = prefix
      .withColumn("__c", ((row_number().over(byTok.orderBy("__id")) - 1)
        / chunk).cast("int"))
      .withColumn("__m", ceil(count(lit(1)).over(byTok) / lit(chunk.toDouble))
        .cast("int"))
    // EXPLICIT width on both join sides (r14, measured: the whole
    // chunk-pair join + verify chain ran at 1-2 tasks — 10.9 taskSec
    // over 19 tasks on a 4.4 s wall — because AQE coalesces the tiny-
    // BYTE exchanges while the pair work grows superlinearly; the
    // widenSmall disease on the dedup side). Keyed repartition at the
    // session width pre-distributes exactly the join's requirement, so
    // no extra exchange is planned and AQE cannot coalesce an explicit
    // user repartition; hash-by-(tok, chunk-pair) is the salted key,
    // designed to spread.
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val l = chunked.select(col("__tok"), col("__id").as("id_a"),
        col("__n").as("__na"), col("__rank").as("__pa"),
        col("__c").as("__ci"),
        explode(sequence(col("__c"), col("__m") - 1)).as("__cj"))
      .repartition(width, col("__tok"), col("__ci"), col("__cj"))
    val r = chunked.select(col("__tok"), col("__id").as("id_b"),
        col("__n").as("__nb"), col("__rank").as("__pb"),
        explode(sequence(lit(0), col("__c"))).as("__ci"),
        col("__c").as("__cj"))
      .repartition(width, col("__tok"), col("__ci"), col("__cj"))
    // two lossless prunes on top of the prefix guarantee:
    //  - size band: J ≥ τ requires τ·max(|a|,|b|) ≤ min(|a|,|b|)
    //  - PPJoin position bound: overlap o ≥ ⌈τ/(1+τ)·(|a|+|b|)⌉, and a
    //    match at doc-local ranks (pa, pb) can contribute at most
    //    min(|a|-pa, |b|-pb)+1 overlap. The pair's FIRST shared token
    //    (global order) always satisfies the bound when J ≥ τ, so
    //    keeping pairs where ANY entry passes is exact.
    val candidates = l.join(r, Seq("__tok", "__ci", "__cj"))
      .filter(col("id_a") < col("id_b") &&
        greatest(col("__na"), col("__nb")) * tau <=
          least(col("__na"), col("__nb")) &&
        least(col("__na") - col("__pa"), col("__nb") - col("__pb")) + 1 >=
          ceil(lit(tau / (1 + tau)) * (col("__na") + col("__nb"))))
      .select("id_a", "id_b")
      // explicit-width repartition + dropDuplicates instead of
      // distinct(): the dedup's required distribution is satisfied by
      // the repartition, so no second exchange is planned and the
      // verify's per-pair exact-jaccard stage keeps the width (AQE
      // would coalesce a plain distinct's exchange to 1-2 partitions
      // on byte estimates and serialize the verify)
      .repartition(width, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    verifyPairs(candidates, docs, tau)
  }

  /**
   * EXACT asymmetric token-set CONTAINMENT join: emit `(a, b)` when
   * `|A∩B| / |A| ≥ τ` — doc `a`'s vocabulary (near-)inside doc `b`'s.
   * [[tokenJaccard]]'s symmetric cousin catches same-size twins; this
   * catches the quote/subset shapes Jaccard is blind to (a tweet
   * quoted in an article, a paragraph lifted into a larger page, a
   * doc re-issued with a long appendix), where the size imbalance
   * drives Jaccard to ~|A|/|B| no matter how completely `a` is copied.
   *
   * Sets are word `shingleN`-grams (default 3): on a bounded-
   * vocabulary corpus unigram sets saturate (every short doc is
   * "contained" in every long one), while shingle sets keep word
   * ORDER, which is what a quote actually preserves — the same
   * substrate as [[minhashLsh]]. `shingleN = 1` gives the raw
   * token-set face.
   *
   * Prefix filter, containment form: `|A∩B| ≥ o := ⌈τ·|A|⌉` forces the
   * FIRST shared element (global (df, element) order) to sit within
   * A's first `|A|−o+1` elements — so only A-side prefixes join, but
   * they join against B's FULL posting lists (containment has no size
   * band: B may be arbitrarily large). The PPJoin position bound still
   * applies on both ranks and stays lossless for the same
   * first-shared-element reason. Verification recomputes the exact
   * intersection on the full sets and thresholds on INTEGERS
   * (`o·denom ≥ num·|A|`); the reported fraction is one final division.
   *
   * Skew: the container side carries full posting lists, so the hot
   * keys live there — its lists are chunked by id order and each
   * probe-side row fans out over the container's chunks (join key
   * `(token, chunk)`, pairs-per-task ≤ probe-rows·chunk; duplication
   * = ⌈f_b/chunk⌉ per probe row, sublinear in the pair mass it
   * spreads). Probe-side lists are RAREST-token prefixes and stay
   * small by construction.
   */
  def containmentPairs(df: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       tau: Double = 0.9,
                       shingleN: Int = 3): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val (num, denom) = rational(tau)
    val docs = df.select(col(idCol).as("__id"),
      (if (shingleN == 1) array_distinct(split(trim(col(textCol)), " "))
       else wordShingles(col(textCol), shingleN)).as("__sh"))
      .filter(size(col("__sh")) > 0)

    val tokenDf = docs.select(col("__id"), explode(col("__sh")).as("__tok"))
    // feeds the size join AND the chunk fan-out — checkpoint so the
    // corpus explode + aggregate runs once (self-joined-intermediate
    // invariant)
    val freq = tokenDf.groupBy("__tok").agg(count(lit(1)).as("__df"))
      .localCheckpoint(false)
    val perDoc = Window.partitionBy("__id")
    val withSize = tokenDf.join(freq, "__tok")
      .withColumn("__rank", row_number().over(
        perDoc.orderBy(col("__df"), col("__tok"))))
      .withColumn("__n", count(lit(1)).over(perDoc))
      // both join sides below read this projection — one computation
      .localCheckpoint(false)
    // o = ceil(tau*n) on integers; prefix = n - o + 1 first tokens
    val oA = -floor(-(lit(num) * col("__n")) / denom)
    val probe = withSize
      .filter(col("__rank") <= col("__n") - oA + 1)
      .select(col("__tok"), col("__id").as("id_a"),
        col("__n").as("__na"), col("__rank").as("__pa"))
    val byTok = Window.partitionBy("__tok")
    val chunk = 512
    val container = withSize
      .withColumn("__c", ((row_number().over(byTok.orderBy("__id")) - 1)
        / chunk).cast("int"))
    // chunks per token = ceil(df/chunk); freq already carries df, so
    // the fan-out join needs no second per-token window
    val chunkCounts = freq.select(col("__tok"),
      ceil(col("__df") / lit(chunk.toDouble)).cast("int").as("__m"))
    val probeFanned = probe.join(chunkCounts, "__tok")
      .select(col("__tok"), col("id_a"), col("__na"), col("__pa"),
        explode(sequence(lit(0), col("__m") - 1)).as("__c"))
    val candidates = probeFanned
      .join(container.select(col("__tok"), col("__c"),
        col("__id").as("id_b"), col("__n").as("__nb"),
        col("__rank").as("__pb")), Seq("__tok", "__c"))
      .filter(col("id_a") =!= col("id_b") &&
        // position bound: the first shared token leaves at least
        // min(|A|-pa, |B|-pb)+1 possible overlap, which must reach o
        (least(col("__na") - col("__pa"), col("__nb") - col("__pb")) + 1) *
          denom >= lit(num) * col("__na"))
      .select("id_a", "id_b").distinct()

    val da = docs.select(col("__id").as("id_a"), col("__sh").as("__sha"))
    val db = docs.select(col("__id").as("id_b"), col("__sh").as("__shb"))
    candidates.join(da, "id_a").join(db, "id_b")
      .withColumn("__o", graft.functions.VectorExpressions
        .setIntersectSize(col("__sha"), col("__shb")))
      // integer-exact threshold; the fraction is ONE final division
      .filter(col("__o") * denom >= lit(num) * size(col("__sha")))
      .select(col("id_a"), col("id_b"),
        round(col("__o").cast(DoubleType) / size(col("__sha")), 4)
          .as("containment"))
  }

  /** `tau` as an exact small rational (per-mille is plenty for a
    * similarity threshold and keeps every comparison in int64). */
  private def rational(tau: Double): (Int, Int) =
    (math.round(tau * 1000).toInt, 1000)

  /** 64-bit SimHash of the token multiset: per bit, the sign of the
    * weighted vote of token-hash bits — native Catalyst expression
    * (64 interpreted HOF aggregates per doc otherwise). */
  def simhashBits(text: Column): Column =
    graft.functions.VectorExpressions.simhash64(split(trim(text), " "))

  /**
   * SimHash near-duplicate pairs with Hamming distance ≤ `maxDist`.
   * Pigeonhole blocking: the 64 bits are cut into `maxDist+1` blocks;
   * any pair within distance `maxDist` agrees on ≥1 whole block, so the
   * per-block equi-join is lossless. Verification uses
   * `bit_count(a XOR b)`.
   */
  def simhash(df: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", maxDist: Int = 3): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val blocks = maxDist + 1
    val width = 64 / blocks
    val sigs = df.select(col(idCol).as("__id"),
      simhashBits(col(textCol)).as("__sim"))

    // self-joined below: checkpoint so each doc's 64-bit signature and
    // block decomposition compute once for both sides
    val blocked = sigs.select(col("__id"), col("__sim"),
      posexplode(array((0 until blocks).map { b =>
        // top block takes the remainder bits; w=64 (maxDist=0) needs
        // the all-ones mask — (1L << 64) wraps to 1 in the JVM
        val w = if (b == blocks - 1) 64 - width * (blocks - 1) else width
        val mask = if (w >= 64) -1L else (1L << w) - 1L
        shiftrightunsigned(col("__sim"), b * width)
          .bitwiseAND(mask)
      }: _*)).as(Seq("__blk", "__bv")))
      .localCheckpoint(false)

    val l = blocked.select(col("__blk"), col("__bv"),
      col("__id").as("id_a"), col("__sim").as("__sa"))
    val r = blocked.select(col("__blk"), col("__bv"),
      col("__id").as("id_b"), col("__sim").as("__sb"))
    l.join(r, Seq("__blk", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("__sa").bitwiseXOR(col("__sb"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /**
   * Cosine-threshold near-duplicate pairs over an embedding column —
   * the DEFAULT path is LSH-bucketed: candidates come from an equi-join
   * on multi-table sign-bit bucket ids (with multi-probe flips on one
   * side), then every candidate is verified with the exact cosine. Work
   * is O(n · tables · probes + collisions), never O(n²) — the 100 TB
   * shape. The surfaced pairs are a subset of the exact answer scored
   * with the identical dot/norm arithmetic; [[embeddingNearDupExact]]
   * is the O(n²) oracle.
   *
   * Tuning: the probed fraction of each table's bucket space is
   * Σ C(nBits, ≤probeBits) / 2^nBits — that fraction times n is the
   * expected RANDOM-pair candidate rate per element, so `nBits` must
   * grow with corpus size (rule of thumb: ≥ log₂(n)). `nBits = 0`
   * (the default) auto-sizes by that rule from one `count()` of the
   * corpus — see [[autoBits]] — so calling it on 10⁸ vectors without
   * tuning gets 27-bit buckets instead of an all-pairs trap; 16 bits
   * × 12 tables × ≤2-bit probes (the auto floor) covers 2·10⁻³ of
   * bucket space and misses a true τ=0.9 pair with p≈2·10⁻⁵
   * (per-table hit rate 0.59 from the angle-collision bound).
   * Dropping τ demands coarser buckets: the sf-fixture gate runs an
   * explicit `nBits = 6` because its planted pairs sit at cosine
   * ≈0.45 — fine for thousands of vectors.
   */
  /** Auto-sizing rule for sign-bit LSH bucket width: ⌈log₂(n)⌉ bits
    * (each table's bucket space then has ≥ n cells, so the expected
    * random-collision rate per element stays O(1) as the corpus
    * grows), floored at 16 — the documented default geometry — and
    * capped at 30 to keep bucket ids in positive int range. */
  def autoBits(n: Long): Int = {
    val log2n = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    math.min(30, math.max(16, log2n))
  }

  def embeddingNearDup(df: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", tau: Double = 0.9,
                       dim: Int = 64, nBits: Int = 0, nTables: Int = 12,
                       probeBits: Int = 2): DataFrame = {
    require(probeBits >= 0 && probeBits <= 2,
      s"probeBits must be 0..2 (got $probeBits): raise recall with more " +
        "tables, not wider probes — probe volume grows C(nBits, p)")
    val bits = if (nBits > 0) nBits else autoBits(df.count())
    graft.functions.VectorExpressions.register(df.sparkSession)
    val withNorm = df.select(col(idCol).as("__id"),
      col(vecCol).as("__v"),
      SimilarityOps.l2norm(col(vecCol)).as("__n"))
    // probe and corpus sides SELF-JOIN the same signature set; without
    // materialization each side re-evaluates the scan lineage and every
    // row's nTables·nBits·dim-flop signature is computed twice. Lazy
    // localCheckpoint materializes (id, nTables longs) — far smaller
    // than the vectors — once at execution, and its storage is released
    // with the DataFrame (cache() would leak a CacheManager entry per
    // call in a long-running service).
    // widened BEFORE the checkpoint (SimilarityOps.widenSmall): the
    // single-row-group scan otherwise pins the checkpoint to ONE
    // partition, and both sides' bucket/probe explosions inherit that
    // width for their whole map stage
    val sigs = SimilarityOps.widenSmall(
        withNorm.select(col("__id"), col("__v")))
      .select(col("__id"),
        SimilarityOps.signBuckets(col("__v"), dim, bits, nTables)
          .as("__bs")).localCheckpoint(false)

    val corpusSide = sigs.select(col("__id").as("id_b"),
      explode(col("__bs")).as("__bucket"))
    // probe side: own bucket plus every <=probeBits-bit flip, expanded
    // by a native kernel (one tight loop per row instead of ~137
    // interpreted HOF expressions per bucket). Flips are symmetric, so
    // probing from one side of the pair is enough: if sig_a and sig_b
    // differ in <=probeBits bits in ANY table, the (probe_a, bucket_b)
    // join row exists.
    val probeSide = sigs.select(col("__id").as("id_a"),
      explode(graft.functions.VectorExpressions
        .lshProbes(col("__bs"), bits, probeBits)).as("__bucket"))

    val candidates = probeSide.join(corpusSide, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val a = withNorm.select(col("__id").as("id_a"), col("__v").as("__va"),
      col("__n").as("__na"))
    val b = withNorm.select(col("__id").as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"))
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("__c", SimilarityOps.dot(col("__va"), col("__vb")) /
        (col("__na") * col("__nb")))
      .filter(col("__c") >= tau) // filter on raw value; round for display
      .select(col("id_a"), col("id_b"), round(col("__c"), 4).as("cosine"))
  }

  /**
   * Bitwise-identical embedding vectors (duplicated docs produce
   * byte-equal embeddings): keep the smallest id per distinct vector
   * plus the duplicate count — [[exact]] for the vector column. One
   * shuffle on the array key, map-side partial aggregation.
   */
  def exactVectors(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    df.groupBy(col(vecCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("dup_count"))

  /**
   * Exact cosine-threshold pairs — brute force over all n² pairs (the
   * small side broadcasts; Spark picks BroadcastNestedLoopJoin). The
   * correctness oracle for [[embeddingNearDup]]; only viable when n is
   * modest.
   */
  def embeddingNearDupExact(df: DataFrame, idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            tau: Double = 0.9): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val withNorm = df.select(col(idCol).as("__id"),
      col(vecCol).as("__v"),
      SimilarityOps.l2norm(col(vecCol)).as("__n"))
    // the theta self-join streams one side through a broadcast
    // nested-loop scan: widen it (SimilarityOps.widenSmall — the
    // single-row-group scan otherwise runs the whole n²/2 dot stage
    // on one task)
    val a = SimilarityOps.widenSmall(
      withNorm.select(col("__id").as("id_a"), col("__v").as("__va"),
        col("__n").as("__na")))
    val b = withNorm.select(col("__id").as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("__c", SimilarityOps.dot(col("__va"), col("__vb")) /
        (col("__na") * col("__nb")))
      .filter(col("__c") >= tau) // filter on raw value; round for display
      .select(col("id_a"), col("id_b"), round(col("__c"), 4).as("cosine"))
  }

  /**
   * Near-duplicate CLUSTERING — the step a production dedup pipeline
   * runs after pair generation: [[minhashLsh]] pairs → undirected
   * connected components → canonical (smallest) doc id per cluster,
   * emitted for EVERY document (singletons canonicalise to
   * themselves). Downstream keeps `doc_id == canonical` rows.
   *
   * Scale shape: the component computation runs only over documents
   * that appear in a pair (collision-bounded, tiny vs the corpus); the
   * corpus-wide answer is a left join + coalesce. Transitive closure
   * matters — A~B, B~C puts A and C in one cluster even when A~C is
   * below τ, which per-pair filtering would miss.
   */
  def nearDupClusters(df: DataFrame, tau: Double = 0.8,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val pairs = minhashLsh(df, idCol, textCol, tau = tau)
    val verts = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b")))
      .distinct().withColumn("label", lit("doc"))
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .withColumn("label", lit("neardup"))
    val cc = GraphAlgos.connectedComponents(
      graft.sources.GraphStore(verts, edges))
      .withColumnRenamed("id", "__ccid")
    df.select(col(idCol))
      .join(cc, col(idCol) === col("__ccid"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical"))
  }

  /**
   * SemDeDup (Abbas et al., 2023) — cluster-scoped SEMANTIC dedup over
   * an embedding column: every vector is assigned to its nearest
   * fitted centroid's cluster, cosine ≥ `tau` pairs form WITHIN
   * clusters only, pairs connect into components, and the smallest id
   * per component is the canonical survivor (singletons canonicalise
   * to themselves). Cluster scoping is what makes semantic dedup
   * tractable at 100 TB: the quadratic term drops from n² to
   * Σ(cluster size)², every cluster's pairs compute independently,
   * and the centroid count k is the knob that bounds it — while the
   * recall loss vs exact all-pairs is exactly the near-dups the
   * coarse quantizer already separates (spec documents the
   * cross-cluster caveat explicitly). The within-cluster self-join is
   * chunk-salted like [[tokenJaccard]]'s posting lists (the hot-key
   * self-join invariant): each cluster's members chunk in id order
   * and join on (cluster, chunk pair), so pairs-per-task ≤ chunk² —
   * lossless. Similarity filters on the RAW cosine (cross-engine
   * float invariant); the centroid model is data
   * ([[SimilarityOps.fitIvfCentroids]]), so gates stay rows-only
   * (engine-seeded fit) with driver-model-equality specs.
   * Output: `(idCol, cluster, canonical)` for EVERY input row;
   * downstream keeps `idCol == canonical`.
   */
  def semanticDedup(df: DataFrame, centroids: Array[Array[Double]],
                    tau: Double = 0.95, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    chunkSize: Int = 1024): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val cells = SimilarityOps
      .clusterEmbeddings(df, centroids, idCol, vecCol)
      .select(col(idCol).as("__id"), col("cluster"))
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .join(cells, "__id")
    val byCell = Window.partitionBy("cluster")
    // lazy cache: the chunked table feeds BOTH sides of the self-join
    // (the self-joined-intermediates invariant)
    val chunked = v
      .withColumn("__c",
        ((row_number().over(byCell.orderBy("__id")) - 1) / chunkSize)
          .cast("int"))
      .withColumn("__m",
        ceil(count(lit(1)).over(byCell) / lit(chunkSize.toDouble))
          .cast("int"))
      .localCheckpoint(false)
    val l = chunked.select(col("cluster"), col("__id").as("id_a"),
      col("__v").as("__va"), col("__c").as("__ci"),
      explode(sequence(col("__c"), col("__m") - 1)).as("__cj"))
    val r = chunked.select(col("cluster"), col("__id").as("id_b"),
      col("__v").as("__vb"),
      explode(sequence(lit(0), col("__c"))).as("__ci"),
      col("__c").as("__cj"))
    val pairs = l.join(r, Seq("cluster", "__ci", "__cj"))
      .filter(col("id_a") < col("id_b") &&
        SimilarityOps.cosine(col("__va"), col("__vb")) >= tau)
      .select(col("id_a"), col("id_b"))
    val verts = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b")))
      .distinct().withColumn("label", lit("vec"))
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .withColumn("label", lit("semdup"))
    val cc = GraphAlgos.connectedComponents(
        graft.sources.GraphStore(verts, edges))
      .withColumnRenamed("id", "__ccid")
    df.select(col(idCol))
      .join(cells.select(col("__id").as(idCol), col("cluster")), Seq(idCol))
      .join(cc, col(idCol) === col("__ccid"), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("component"), col(idCol)).as("canonical"))
  }

  /** APPLY the near-dup dedup: keep the full rows of cluster-canonical
    * documents only (one survivor per near-duplicate cluster, smallest
    * id — deterministic). The left-semi join keeps the corpus schema
    * untouched, so the survivor set drops straight into downstream
    * pipeline stages. */
  def dedupNearDups(df: DataFrame, tau: Double = 0.8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val canonicals = nearDupClusters(df, tau, idCol, textCol)
      .filter(col(idCol) === col("canonical"))
      .select(col(idCol))
    df.join(canonicals, Seq(idCol), "left_semi")
  }

  /**
   * Multi-signal entity resolution (record linkage): rows sharing ANY
   * key value — canonical-text hash, URL, content fingerprint — are
   * the same entity; the signals' equality groups close transitively
   * into components (doc A links to B by text, B to C by URL ⇒ one
   * entity). Edges use STAR topology per (key, value) group: every
   * member links to the group's min id, ONE edge per row, so a hot
   * key with 10⁹ members contributes 10⁹ edges — never the 10¹⁸
   * pairwise closure with the same components. Each key costs one
   * partial-aggregable min + one equi-join; null/empty key values
   * never link (a missing signal is not a match).
   * Output: `(idCol, canonical)` for EVERY input row.
   */
  def multiKeyResolve(df: DataFrame, keys: Seq[(String, Column)],
                      idCol: String = "doc_id"): DataFrame = {
    require(keys.nonEmpty, "multiKeyResolve needs at least one key")
    val keyed = df.select(
      (col(idCol) +: keys.map { case (n, c) => c.as(n) }): _*)
      .localCheckpoint(false) // feeds one star-edge pass per key
    val edges = keys.map { case (n, _) =>
      val rows = keyed
        .filter(col(n).isNotNull && col(n).cast("string") =!= "")
      val hubs = rows.groupBy(col(n))
        .agg(min(col(idCol)).as("__hub"))
      rows.join(hubs, Seq(n))
        .filter(col(idCol) =!= col("__hub"))
        .select(col(idCol).as("src"), col("__hub").as("dst"))
    }.reduce(_ unionByName _).distinct()
      .withColumn("label", lit("same"))
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst")))
      .distinct().withColumn("label", lit("row"))
    val cc = GraphAlgos.connectedComponents(
        graft.sources.GraphStore(verts, edges))
      .withColumnRenamed("id", "__ccid")
    df.select(col(idCol))
      .join(cc, col(idCol) === col("__ccid"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical"))
  }

  /**
   * Quality-aware survivor selection: one survivor per near-dup
   * cluster like [[dedupNearDups]], but the survivor is the cluster's
   * BEST document by an integer quality key (ties to the smallest id)
   * instead of the smallest id — the production choice when
   * near-duplicates differ in extraction quality (keep the longest /
   * highest-scoring copy, drop the mangled ones). The argmax is
   * `min(struct(-quality, id))` per cluster — partial-aggregable, so
   * a boilerplate cluster with 10⁹ members combines map-side (the
   * `dedupSegments` first-occurrence move; never a per-cluster
   * row_number window). Quality must be integer-valued: float scores
   * would put the cross-engine float invariant inside a compared
   * keep/drop decision.
   */
  def dedupBestOf(df: DataFrame, quality: Column, tau: Double = 0.8,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val best = df.select(col(idCol), quality.cast("long").as("__q"))
      .join(nearDupClusters(df, tau, idCol, textCol), Seq(idCol))
      .groupBy(col("canonical"))
      .agg(min(struct((-col("__q")).as("nq"), col(idCol).as("id")))
        .as("__b"))
      .select(col("__b.id").as(idCol))
    df.join(best, Seq(idCol), "left_semi")
  }

  /**
   * Sub-document exact dedup over (doc_id, position, segment) rows:
   * the FIRST occurrence of each distinct segment in (doc_id, pos)
   * order survives; every later repeat — within one document or across
   * the corpus — is dropped, and each document is re-assembled from
   * its surviving segments in original order (the corpus-wide face of
   * what `pruneFrequentTokens` does per token).
   *
   * First-occurrence selection is `min(struct(id, pos))` per segment —
   * a PARTIAL-aggregable min, so a boilerplate paragraph repeated 10⁹
   * times combines map-side and the reduce sees one candidate per map
   * task, where a row_number window would drag every copy of the hot
   * segment into one task. Re-assembly is one keyed aggregation per
   * doc. Documents whose every segment loses stay in the output with
   * empty text (right join on the corpus ids).
   */
  private def dedupSegments(df: DataFrame, segs: DataFrame,
                            idCol: String, joinSep: String): DataFrame = {
    val winners = segs.groupBy(col("__para"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__w"))
      .select(col("__w").getField(idCol).as(idCol),
        col("__w").getField("__pos").as("__pos"), col("__para"))
    val reassembled = winners.groupBy(col(idCol))
      .agg(array_join(array_sort(collect_list(struct(col("__pos"),
          col("__para")))).getField("__para"), joinSep).as("text"),
        count(lit(1)).as("kept"))
    val totals = segs.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("kept"), lit(0L)).as("kept"),
        (coalesce(col("__n"), lit(0L)) -
          coalesce(col("kept"), lit(0L))).as("dropped"))
  }

  /**
   * Paragraph-granularity exact dedup: split each document on
   * `sepPattern` (default blank lines), drop every repeat of a
   * paragraph already seen earlier in the corpus, re-assemble with
   * `joinSep`. The production path for template boilerplate (headers,
   * footers, license blocks) that document-level near-dup cannot
   * touch because the surrounding text differs.
   */
  def dedupParagraphs(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      sepPattern: String = "\\n{2,}",
                      joinSep: String = "\n\n"): DataFrame = {
    val segs = df.select(col(idCol),
        posexplode(split(col(textCol), sepPattern))
          .as(Seq("__pos", "__para")))
      .filter(length(trim(col("__para"))) > 0)
      .withColumn("__para", trim(col("__para")))
    dedupSegments(df, segs, idCol, joinSep)
  }

  /**
   * Exact substring-span dedup — the rolling-window face of
   * sub-document dedup (the "dedup training data" pattern): every
   * `windowTokens`-token OVERLAPPING window is keyed; for each
   * distinct window content only the corpus-wide first occurrence (by
   * (doc_id, window pos)) stays, and every token covered by any LATER
   * duplicate window is dropped; documents re-assemble from surviving
   * tokens in original order. Catches long verbatim spans that
   * paragraph/block boundaries split and doc-level near-dup misses.
   *
   * Scale shape: window keys travel as md5 digests (32 chars) rather
   * than k-token strings, so shuffle width is constant in
   * `windowTokens`; first-occurrence per key is the same
   * partial-aggregable min(struct) as [[dedupParagraphs]]; duplicate
   * windows explode into at most dup·k covered-position rows
   * (bounded by the duplication actually present); every join is an
   * equi-join. md5 is engine-universal, so grouping is identical in
   * the SQL oracle.
   */
  def dedupSubstrings(df: DataFrame, windowTokens: Int = 50,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val k = windowTokens
    val wins = tokenWindows(df, k, idCol, textCol)
    val firsts = wins.groupBy(col("__wh"))
      .agg(min(struct(col(idCol), col("__wpos"))).as("__f"))
      .select(col("__wh"), col("__f").getField(idCol).as("__fid"),
        col("__f").getField("__wpos").as("__fpos"))
    val dups = wins.join(firsts, "__wh")
      .filter(col(idCol) =!= col("__fid") || col("__wpos") =!= col("__fpos"))
    val covered = mergeRuns(dups, k, idCol, gap = k - 1)
      .select(col(idCol),
        explode(sequence(col("__start"), col("__end") + (k - 1)))
          .as("__pos"))
    cutCovered(df, covered, idCol, textCol)
  }

  /** Stride-1 overlapping `k`-token window keys per (doc, window
    * start): `(idCol, __wpos, __wh)`. Window keys travel as md5
    * digests (32 chars) so shuffle width is constant in `k`; md5 is
    * engine-universal, so grouping is identical in SQL oracles. */
  private def tokenWindows(df: DataFrame, k: Int, idCol: String,
                           textCol: String): DataFrame =
    df.select(col(idCol), split(trim(col(textCol)), " ").as("__w"))
      .filter(size(col("__w")) >= k).select(col(idCol),
        explode(transform(sequence(lit(0), size(col("__w")) - k),
          s => struct(s.as("wpos"),
            md5(array_join(slice(col("__w"), s + 1, lit(k)), " "))
              .as("wh")))).as("__x"))
      .select(col(idCol), col("__x.wpos").as("__wpos"),
        col("__x.wh").as("__wh"))

  /** Merge each doc's matched window starts into DISJOINT runs before
    * any per-position expansion: inside a long duplicated span every
    * token is covered by up to k overlapping windows, so a naive
    * explode+distinct carries a k× duplicated shuffle. A window starts
    * a new run iff it begins more than `gap` past the previous start
    * (`gap = k-1`: strictly-overlapping coverage; `gap = k`: adjacent
    * windows also merge, giving contiguous covered text one maximal
    * run). The window function runs over matched windows only —
    * already bounded by the dup mass. Output `(idCol, __start, __end)`
    * with `__end` the run's LAST window start (last covered token is
    * `__end + k - 1`). */
  private def mergeRuns(matched: DataFrame, k: Int, idCol: String,
                        gap: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__wpos"))
    matched.select(col(idCol), col("__wpos"))
      .withColumn("__prev", lag(col("__wpos"), 1).over(byDoc))
      .withColumn("__newRun",
        (col("__prev").isNull || col("__wpos") > col("__prev") + gap)
          .cast("int"))
      .withColumn("__run", sum(col("__newRun")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__run"))
      .agg(min(col("__wpos")).as("__start"), max(col("__wpos")).as("__end"))
  }

  /** Drop `covered` `(idCol, __pos)` token positions from every doc
    * and re-assemble the survivors in original order; docs losing all
    * tokens stay with empty text. `(idCol, text, kept, dropped)`. */
  private def cutCovered(df: DataFrame, covered: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(split(trim(col(textCol)), " ")).as(Seq("__pos", "__tok")))
    val kept = toks.join(covered, Seq(idCol, "__pos"), "left_anti")
    val reassembled = kept.groupBy(col(idCol))
      .agg(array_join(array_sort(collect_list(struct(col("__pos"),
          col("__tok")))).getField("__tok"), " ").as("text"),
        count(lit(1)).as("kept"))
    df.select(col(idCol),
        size(split(trim(col(textCol)), " ")).cast("long").as("__n"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("kept"), lit(0L)).as("kept"),
        (col("__n") - coalesce(col("kept"), lit(0L))).as("dropped"))
  }

  /**
   * Maximal repeated spans — the suffix-array guarantee (Lee et al.,
   * "Deduplicating Training Data Makes Language Models Better")
   * expressed Spark-first: report, per document, every maximal token
   * run covered by SOME substring of ≥ `minTokens` tokens that occurs
   * at least twice corpus-wide (any document, any alignment;
   * self-repeats count). The window face makes this exact without a
   * suffix array: a substring of length ≥ k repeats iff each of its
   * stride-1 k-windows repeats at the aligned offset, so the union of
   * `[p, p+k)` over duplicated window starts `p` is EXACTLY the text
   * covered by repeated substrings ≥ k — found at arbitrary alignment
   * because every start offset has its own window. Adjacent and
   * overlapping matches merge (`gap = k`) into maximal runs, so each
   * output row is one maximal repeated region, with its text sliced
   * from the original (never reassembled from hashes).
   *
   * Scale: one corpus-wide count per md5 window key (partial-agg),
   * one equi-join back, one bounded window function over matched
   * windows only. Every shuffle is on the window key or doc id.
   * Output: `(idCol, span_start, span_tokens, span_text)` —
   * `span_start` 0-based in tokens.
   */
  def repeatedSpans(df: DataFrame, minTokens: Int = 50,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val k = minTokens
    val wins = tokenWindows(df, k, idCol, textCol)
    val dupKeys = wins.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
      .select(col("__wh"))
    val runs = mergeRuns(wins.join(dupKeys, "__wh"), k, idCol, gap = k)
    val t = df.select(col(idCol), split(trim(col(textCol)), " ").as("__w"))
    runs.join(t, idCol)
      .select(col(idCol), col("__start").cast("long").as("span_start"),
        (col("__end") - col("__start") + k).cast("long").as("span_tokens"),
        array_join(slice(col("__w"), col("__start") + 1,
          col("__end") - col("__start") + lit(k)), " ").as("span_text"))
  }

  /**
   * ExactSubstr-style dedup: strip EVERY occurrence of every repeated
   * substring ≥ `minTokens` tokens (the Lee-et-al default — no
   * first-occurrence exemption; [[dedupSubstrings]] is the keep-first
   * variant). Covered regions are [[repeatedSpans]]' maximal runs;
   * survivors re-assemble in original order. The production shape for
   * "no memorized span survives anywhere" guarantees (e.g. benchmark
   * decontamination where both sides must lose the span).
   * Output: `(idCol, text, kept, dropped)`.
   */
  def dedupSuffix(df: DataFrame, minTokens: Int = 50,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val k = minTokens
    val wins = tokenWindows(df, k, idCol, textCol)
    val dupKeys = wins.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
      .select(col("__wh"))
    val covered = mergeRuns(wins.join(dupKeys, "__wh"), k, idCol, gap = k)
      .select(col(idCol),
        explode(sequence(col("__start"), col("__end") + (k - 1)))
          .as("__pos"))
    cutCovered(df, covered, idCol, textCol)
  }

  /**
   * Fixed-granularity variant for corpora without paragraph structure:
   * segments are consecutive `blockSize`-token blocks (last block may
   * be short). Same corpus-wide first-occurrence semantics and
   * re-assembly as [[dedupParagraphs]]; fully SQL-expressible, so this
   * is the oracle-gated instance.
   */
  def dedupTokenBlocks(df: DataFrame, blockSize: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(split(trim(col(textCol)), " ")).as(Seq("__tp", "__tok")))
    val segs = toks.groupBy(col(idCol),
        (col("__tp") / blockSize).cast("long").as("__pos"))
      .agg(array_join(array_sort(collect_list(struct(col("__tp"),
        col("__tok")))).getField("__tok"), " ").as("__para"))
    dedupSegments(df, segs, idCol, " ")
  }

  /**
   * Exact edit-distance similarity join (PassJoin/Ed-Join family,
   * Li et al. 2011): all pairs of strings within Levenshtein distance
   * `maxDist` — the fuzzy-match primitive for titles, product names,
   * URLs, OCR variants, where token-set similarity (tokenJaccard) is
   * blind to character-level noise.
   *
   * Candidate generation is the PIGEONHOLE partition: each string
   * splits into `maxDist+1` contiguous segments; if `ed(s,t) ≤ d`
   * (with `|s| ≤ |t|`), some segment of `s` is edit-free in the
   * alignment and therefore occurs EXACTLY in `t`, displaced by at
   * most the net indels before it — `|shift| ≤ d`. So `t` only
   * extracts substrings at the segment positions of partner lengths
   * `m ∈ [|t|−d, |t|]` shifted by `±d` — `(d+1)²·(2d+1)` windows per
   * string, constant in corpus size — and candidates are the exact
   * (segIdx, partnerLen, substring) key matches, verified with one
   * `levenshtein` call. Lossless: the segment-in-window containment is
   * implied by the alignment, never assumed.
   *
   * Scale shape: two narrow explodes (constant fan-out) → one
   * equi-join on the segment key → distinct candidate pairs → verify.
   * A corpus-hot segment (shared prefix boilerplate) concentrates its
   * key like any similarity self-join — AQE skew-join territory, and
   * candidates stay output-bounded because verification prunes to
   * true near-pairs. Output: `(id_a, id_b, dist)` with `id_a < id_b`.
   */
  def editDistancePairs(df: DataFrame, maxDist: Int = 1,
                        idCol: String = "id",
                        strCol: String = "str"): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist
    val k = d + 1
    val base = df.select(col(idCol).as("id"), col(strCol).as("str"),
      length(col(strCol)).as("len"))
    def segStruct(mExpr: String, i: Int, shift: Int) = struct(
      lit(i).as("i"), expr(mExpr).as("m"),
      (expr(s"$i * (($mExpr) div $k)") +
        least(lit(i), expr(s"($mExpr) % $k")) + lit(1 + shift)).as("p"),
      (expr(s"($mExpr) div $k") +
        when(lit(i) < expr(s"($mExpr) % $k"), 1).otherwise(0)).as("l"))
    // segment side: the (shorter) partner's own d+1 segments
    val segs = base
      .withColumn("sg", explode(array(
        (0 until k).map(i => segStruct("len", i, 0)): _*)))
      .select(col("id").as("id_s"), col("sg.i").as("i"),
        col("sg.m").as("m"), expr("substr(str, sg.p, sg.l)").as("seg"))
    // window side: substrings at partner-length segment positions ± d
    val triples = for {o <- 0 to d; i <- 0 until k; sh <- -d to d}
      yield (o, i, sh)
    val wins = base
      .withColumn("w", explode(array(triples.map { case (o, i, sh) =>
        segStruct(s"len - $o", i, sh) }: _*)))
      .filter(col("w.m") >= 1 && col("w.p") >= 1 && col("w.l") >= 0 &&
        col("w.p") + col("w.l") - 1 <= col("len"))
      .select(col("id").as("id_t"), col("w.i").as("i"),
        col("w.m").as("m"), expr("substr(str, w.p, w.l)").as("seg"))
    val cands = segs.join(wins, Seq("i", "m", "seg"))
      .filter(col("id_s") =!= col("id_t"))
      .select(least(col("id_s"), col("id_t")).as("id_a"),
        greatest(col("id_s"), col("id_t")).as("id_b"))
      .distinct()
    val sa = base.select(col("id").as("id_a"), col("str").as("__sa"))
    val sb = base.select(col("id").as("id_b"), col("str").as("__sb"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Canonical text rendering for near-exact dedup: lowercase, every
    * non-alphanumeric to a space, whitespace collapsed, trimmed — the
    * C4-style normalization under which case/punctuation/formatting
    * variants of one document collapse to one key. Both regexes are
    * RE2-safe and global (the replace-all invariant). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /**
   * Near-exact dedup on the [[normalizeText]] canonical key: identical
   * to [[exact]] but blind to case, punctuation, and whitespace noise
   * (re-encoded copies, trailing-punctuation variants, double-spaced
   * scans). Same scale shape as `exact`: one partial-aggregable
   * groupBy, min-id winner. Output: `(idCol, norm_text, dup_count)`.
   */
  def dedupNormalized(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    df.select(col(idCol), normalizeText(col(textCol)).as("norm_text"))
      .groupBy(col("norm_text"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("norm_text"), col("dup_count"))

  /** Deterministic formatting-noise synthesis for the normalized-dedup
    * gate: every document ships as-is (id `2·doc_id`); every third
    * document also plants a NOISY TWIN (id `2·doc_id+1`) — uppercased,
    * double-spaced, with trailing `" !!"` — that must collapse onto its
    * original under [[normalizeText]]. */
  def withFormattingNoise(df: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val orig = df.select((col(idCol) * 2).as("id"),
      col(textCol).as("text"))
    val twin = df.filter(col(idCol) % 3 === 0)
      .select((col(idCol) * 2 + 1).as("id"),
        concat(upper(replace(col(textCol), lit(" "), lit("  "))),
          lit(" !!")).as("text"))
    orig.unionByName(twin)
  }

  /** Deterministic fuzzy-pair synthesis for the edit-distance gate:
    * each document contributes its lowercased 24-char prefix as id
    * `2·doc_id`; every third document also plants a TYPO TWIN (id
    * `2·doc_id+1`) with the character at position `doc_id % 20 + 1`
    * replaced by `'q'` — a known planted population of distance ≤ 1
    * pairs the oracle reconstructs with brute-force `levenshtein`. */
  def withTypoPayload(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val u = lower(substring(col(textCol), 1, 24))
    val orig = df.select((col(idCol) * 2).as("id"), u.as("str"))
    val twin = df.filter(col(idCol) % 3 === 0)
      .select((col(idCol) * 2 + 1).as("id"),
        concat(
          expr(s"substr(lower(substr($textCol, 1, 24)), 1, cast($idCol % 20 as int))"),
          lit("q"),
          expr(s"substr(lower(substr($textCol, 1, 24)), cast($idCol % 20 as int) + 2)"))
          .as("str"))
    orig.unionByName(twin)
  }
}
