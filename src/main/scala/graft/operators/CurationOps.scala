package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-curation operators a large-scale training-data pipeline runs
 * between ingestion and tokenization. All narrow maps or single
 * equi-joins — nothing here is worse than one shuffle at 100 TB:
 *
 *  - [[redact]] / [[scrubPii]]: regex redaction (URLs, emails) with
 *    per-doc hit counts — codegen'd `regexp_replace`, no UDF.
 *  - [[repetitionRatio]]: duplicate word-n-gram fraction (the
 *    Gopher/C4-style "repetitious text" signal) — pure Columns over
 *    the native shingle kernel.
 *  - [[qualityFilters]]: named boolean Gopher-style gates with
 *    integer-exact thresholds (no float compare drift across engines).
 *  - [[decontaminate]]: train/eval n-gram overlap — exploded-shingle
 *    equi-join, distinct-pruned on the (small) held-out side.
 *  - [[langIdEval]] / [[sourceStats]]: per-language confusion counts
 *    and per-source corpus monitoring aggregates.
 */
object CurationOps {

  /** Replace every `pattern` match and count hits per doc (count from
    * the ORIGINAL text). */
  def redact(df: DataFrame, pattern: String,
             replacement: String = "<REDACTED>",
             idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    df.select(col(idCol),
      regexp_replace(col(textCol), lit(pattern), lit(replacement))
        .as("clean_text"),
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0)))
        .as("hits"))

  /** RE2-safe (works in Spark's Java regex AND DuckDB/RE2 dialects). */
  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Scrub URLs then emails; counts are measured on the original text. */
  def scrubPii(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    df.select(col(idCol),
      regexp_replace(
        regexp_replace(col(textCol), lit(UrlPattern), lit("<URL>")),
        lit(EmailPattern), lit("<EMAIL>")).as("clean_text"),
      size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)))
        .as("url_count"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .as("email_count"))

  /** Fraction of word n-grams that are repeats of an earlier n-gram in
    * the same doc: `1 - distinct/total`, 0 for docs shorter than n
    * words. Single division + round(4) — cross-engine float-safe. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(size(split(trim(text), " ")) - (n - 1), lit(0))
    val uniq = size(graft.functions.VectorExpressions.wordShingles(text, n))
    when(total <= 0, lit(0.0))
      .otherwise(round((total - uniq).cast(DoubleType) / total, 4))
  }

  /** Per-doc repetition stats (requires the shingle kernel to be
    * registered; this does it). */
  def repetitionStats(df: DataFrame, n: Int = 3,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.select(col(idCol),
      repetitionRatio(col(textCol), n).as("rep_ratio"))
  }

  /**
   * Gopher-style named quality gates. Thresholds compare integer
   * products only (`chars < minWordLen·words`), never float ratios, so
   * the booleans are bit-identical across engines:
   *  - too_short / too_long: word-count bounds
   *  - word_len_low / word_len_high: mean word length outside
   *    [minWordLen, maxWordLen] via cross-multiplication
   *  - keep: passes every gate
   */
  def qualityFilters(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", minWords: Int = 5,
                     maxWords: Int = 5000, minWordLen: Int = 2,
                     maxWordLen: Int = 12): DataFrame = {
    val words = size(split(trim(col(textCol)), " ")).cast(LongType)
    val chars = length(regexp_replace(col(textCol), lit(" "), lit("")))
      .cast(LongType)
    val tooShort = (words < minWords).as("too_short")
    val tooLong = (words > maxWords).as("too_long")
    val lenLow = (chars < words * minWordLen).as("word_len_low")
    val lenHigh = (chars > words * maxWordLen).as("word_len_high")
    df.select(col(idCol), tooShort, tooLong, lenLow, lenHigh)
      .withColumn("keep", !col("too_short") && !col("too_long") &&
        !col("word_len_low") && !col("word_len_high"))
  }

  /**
   * Deterministic noisy-page synthesis for the line-filter gate (the
   * `withWavPayload`/`withHtmlPayload` pattern): each document becomes
   * an 8-line "page" whose keepable content is known by construction —
   * line 1 is the document text with a terminal period and line 8 is a
   * constant clean sentence; lines 2-7 plant one violation each
   * (javascript boilerplate, a short fragment, lorem ipsum filler,
   * a code/JSON line, missing terminal punctuation, a policy notice).
   * [[lineFilters]] over the synthesized page must recover EXACTLY
   * lines 1 and 8, which the SQL oracle reconstructs from the raw text.
   */
  def withNoisyLines(df: DataFrame, textCol: String = "text",
                     outCol: String = "page"): DataFrame =
    df.withColumn(outCol, concat_ws("\n",
      concat(col(textCol), lit(".")),
      lit("Please enable JavaScript and cookies to continue"),
      concat_ws(" ", slice(split(trim(col(textCol)), " "), 1, 2)),
      lit("Lorem ipsum dolor sit amet."),
      lit("{ \"consent\": true }"),
      col(textCol),
      lit("See our Privacy Policy and Terms of Use."),
      lit("all tokens pass these line rules okay.")))

  /**
   * C4-style LINE-level filtering (Raffel et al. 2020 §2.2): documents
   * are cleaned line-by-line BEFORE any document-level gate — a line is
   * kept only if it ends in terminal punctuation, has at least
   * `minWords` words, and contains none of the boilerplate phrases
   * (javascript/cookie notices, lorem ipsum filler, policy pages) or a
   * curly brace (code/JSON leakage). Surviving lines are re-joined in
   * original order; documents whose every line is dropped surface with
   * an empty `clean_text` (the document-level `too_short` gate should
   * see them, not lose them).
   *
   * Pure per-row Column work (split → filter HOF → array_join): a
   * narrow map with zero shuffle at any corpus size. Output:
   * `(idCol, clean_text, kept_lines, dropped_lines)`.
   */
  def lineFilters(df: DataFrame, minWords: Int = 5,
                  idCol: String = "doc_id",
                  textCol: String = "page"): DataFrame = {
    val phrases = Seq("javascript", "lorem ipsum", "privacy policy",
      "terms of use", "cookie policy", "uses cookies")
    def keep(l: Column): Column = {
      val t = trim(l)
      val words = when(t === "", lit(0))
        .otherwise(size(split(t, " +")))
      val lower_ = lower(t)
      t.rlike("[.!?\"]$") && words >= minWords &&
        !phrases.map(p => lower_.contains(p)).reduce(_ || _) &&
        !t.contains("{")
    }
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, keep _)
    df.select(col(idCol),
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast(LongType).as("kept_lines"),
      (size(lines) - size(kept)).cast(LongType).as("dropped_lines"))
  }

  /**
   * Fit a naive-Bayes-style token quality model from a labeled seed
   * (the fastText/C4 "quality classifier" curation stage: label a
   * seed corpus — reference pages vs crawl noise — fit per-token
   * evidence, score everything). Per token the weight is the
   * Laplace-smoothed document-frequency odds ratio in MICRO-units,
   * computed with 64-bit integer division only:
   *
   *   weight_micro = ((pos_docs + 1) * 1,000,000) div (neg_docs + 1)
   *
   * so weights are bit-identical across engines (no float log-odds;
   * `div` truncation == floor for nonnegative int64). A token seen
   * only in positive docs gets a large weight, only in negative a
   * small one, balanced evidence ≈ 1,000,000 (odds 1). Presence is
   * per-DOCUMENT (binarized NB), partial-aggregable counts; output is
   * vocab-bounded. Output: `(token, pos_docs, neg_docs,
   * weight_micro)`.
   */
  def fitQualityWeights(df: DataFrame, labelCol: String,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    df.select(col(idCol), col(labelCol).cast(BooleanType).as("__pos"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .select(col(idCol), col("__pos"), col("token")).distinct()
      .groupBy(col("token"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("pos_docs"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("neg_docs"))
      .withColumn("weight_micro",
        expr("((pos_docs + 1L) * 1000000L) div (neg_docs + 1L)"))

  /**
   * Score documents against a fitted [[fitQualityWeights]] model: the
   * doc score is the sum of its token-INSTANCE weights (micro-units),
   * unseen tokens count as neutral evidence (1,000,000). `above_prior`
   * flags docs whose mean token weight exceeds odds 1 — the
   * cross-multiplied integer test `score_micro > 1e6 * n_tokens`, so
   * the verdict is float-free. The model is vocab-bounded and
   * broadcast; the corpus-side token explode is the only wide work,
   * and the per-doc aggregation is partial-aggregable — the shape
   * that survives a 100 TB corpus. Docs with no tokens score 0 and
   * never pass. Output: `(idCol, n_tokens, score_micro,
   * above_prior)`.
   */
  def scoreQuality(df: DataFrame, weights: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val w = weights.select(col("token"), col("weight_micro"))
    val stats = df.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .join(broadcast(w), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("weight_micro"), lit(1000000L)))
          .as("score_micro"))
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      .withColumn("above_prior",
        col("score_micro") > lit(1000000L) * col("n_tokens"))
  }

  /**
   * Training/eval contamination: corpus docs sharing at least one word
   * n-gram with the held-out set, with the count of distinct shared
   * n-grams. One equi-join on the shingle; the held-out side is
   * distinct-pruned and usually broadcastable (eval sets are small
   * next to a training corpus).
   */
  def decontaminate(corpus: DataFrame, heldout: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 8): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    def sh(df: DataFrame): DataFrame = df.select(col(idCol).as("__id"),
      explode(graft.functions.VectorExpressions
        .wordShingles(col(textCol), n)).as("__s"))
    val h = sh(heldout).select(col("__s")).distinct()
    sh(corpus).join(h, "__s")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("shared_ngrams")) // corpus shingles distinct per doc
      .select(col("__id").as(idCol), col("shared_ngrams"))
  }

  /**
   * Bloom-filter decontamination — the broadcast face of
   * [[decontaminate]] for the 100 TB case: the held-out shingle set is
   * compressed into a `numBits` bloom filter (built distributed:
   * shingle-hash → k bit positions → one byte-index `bit_or`
   * aggregation; only the ≤ numBits/8-byte model reaches the driver,
   * broadcast back as DATA in a one-row DataFrame, never a plan
   * literal), and the corpus probes it with a native constant-time
   * expression instead of shuffling its full shingle stream into a
   * join. NEVER false-negative — every document the exact join flags
   * is flagged here — with false positives at the standard
   * (1-e^{-kn/m})^k rate, so it is the cheap first pass whose hits
   * feed the exact [[decontaminate]] on a tiny remainder. Sizing: ~10
   * bits per held-out shingle keeps FP under 1% at k=5 (default 2²²
   * bits = 512 KiB covers ~400k shingles).
   *
   * Engine-specific hashing (xxhash64 + splitmix schedule) → rows-only
   * gate; the spec proves the superset property against the exact
   * join and pins the FP count on a sized fixture.
   */
  def bloomDecontaminate(corpus: DataFrame, heldout: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text", n: Int = 8,
                         numBits: Int = 1 << 22,
                         numHashes: Int = 5): DataFrame =
    bloomProbe(corpus,
      bloomBuild(heldout, idCol, textCol, n, numBits, numHashes),
      idCol, textCol, n, numBits, numHashes)

  /** Shingle-hash stream of a corpus: one `(__id, __h)` row per
    * (doc, distinct word n-gram). */
  private def shingleHashes(df: DataFrame, idCol: String,
                            textCol: String, n: Int): DataFrame = {
    val VE = graft.functions.VectorExpressions
    df.select(col(idCol).as("__id"),
      explode(VE.wordShingles(col(textCol), n)).as("__s"))
      .select(col("__id"), xxhash64(col("__s")).as("__h"))
  }

  /** Distributed bloom build over a held-out set's shingle hashes:
    * positions → byte-index `bit_or` aggregation, only the ≤ numBits/8
    * bytes reach the driver. */
  private def bloomBuild(heldout: DataFrame, idCol: String,
                         textCol: String, n: Int, numBits: Int,
                         numHashes: Int): Array[Byte] =
    bloomFromHashes(shingleHashes(heldout, idCol, textCol, n)
      .select(col("__h")), numBits, numHashes)

  /** Distributed bloom build over any 64-bit hash column `__h`:
    * positions → byte-index `bit_or` aggregation, only the ≤ numBits/8
    * bytes reach the driver. Shared by the decontamination blooms and
    * [[JoinOps.bloomFilteredJoin]]'s key fingerprint. */
  private[operators] def bloomFromHashes(hashes: DataFrame, numBits: Int,
                                         numHashes: Int): Array[Byte] = {
    require(numBits % 8 == 0 && numBits > 0, "numBits must be a positive multiple of 8")
    val VE = graft.functions.VectorExpressions
    VE.register(hashes.sparkSession)
    val bytesSet = hashes
      .select(col("__h")).distinct()
      .select(explode(VE.bloomPositions(col("__h"), numBits, numHashes))
        .as("__p"))
      .select((col("__p") / 8).cast("int").as("__i"),
        // functions.shiftleft takes a literal shift; the SQL form
        // accepts a column one
        expr("cast(shiftleft(1, cast(__p % 8 as int)) as int)").as("__m"))
      .groupBy(col("__i")).agg(bit_or(col("__m")).as("__b"))
      .collect()
    val bloom = new Array[Byte](numBits / 8)
    bytesSet.foreach(r => bloom(r.getInt(0)) = r.getInt(1).toByte)
    bloom
  }

  /** Probe a corpus against bloom bytes carried as a `Broadcast`
    * handle (never a plan literal — the plan stays constant-size, and
    * unlike a bytes COLUMN the array is not copied out of the row per
    * probe; see [[graft.functions.VectorExpressions.BloomContainsBc]]). */
  private def bloomProbe(corpus: DataFrame, bloom: Array[Byte],
                         idCol: String, textCol: String, n: Int,
                         numBits: Int, numHashes: Int): DataFrame = {
    val VE = graft.functions.VectorExpressions
    VE.register(corpus.sparkSession)
    val bloomBc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val flagged = shingleHashes(corpus, idCol, textCol, n)
      .filter(VE.bloomContainsBc(col("__h"), bloomBc, numBits, numHashes))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("flagged_ngrams"))
    corpus.select(col(idCol))
      .join(flagged.select(col("__id").as(idCol), col("flagged_ngrams")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("flagged_ngrams"), lit(0L)).as("flagged_ngrams"))
  }

  /**
   * Persist (merge) a held-out increment's bloom bits under
   * `statePath` — the cross-snapshot face of [[bloomDecontaminate]]:
   * a nightly pipeline adds each new eval/benchmark drop to the stored
   * filter instead of rebuilding from every held-out set it has ever
   * seen. Each committed increment dir stores the MERGED bytes (bit_or
   * of the stored filter with the increment's); reads OR-fold every
   * stored row (associative — equal to the latest cumulative filter,
   * and it stays correct after [[StateStore.compact]] unions the
   * per-dir tables), and because bit positions are a pure function of
   * the shingle and `bit_or` is associative-commutative, the
   * incrementally-merged filter is BIT-IDENTICAL to one built over the
   * union of all held-out sets — same flags, same FP rate (spec
   * asserts byte equality). Re-adding an already-merged set is a no-op
   * by the same algebra, and a crash before COMMIT leaves the previous
   * version live ([[StateStore]] idempotence). Returns the merged
   * bytes.
   */
  def bloomStateAdd(heldout: DataFrame, statePath: String,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 8, numBits: Int = 1 << 22,
                    numHashes: Int = 5): Array[Byte] = {
    val spark = heldout.sparkSession
    val add = bloomBuild(heldout, idCol, textCol, n, numBits, numHashes)
    val prior = StateStore.committed(spark, statePath)
    val merged = if (prior.isEmpty) add else {
      val old = foldBloomState(spark, prior, numBits)
      Array.tabulate(old.length)(i => (old(i) | add(i)).toByte)
    }
    val dir = StateStore.nextDir(spark, statePath)
    import spark.implicits._
    Seq(Tuple1(merged)).toDF("__bloom").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/bloom")
    StateStore.commit(spark, dir)
    merged
  }

  /** Probe a corpus against the bloom state accumulated by
    * [[bloomStateAdd]] — equals [[bloomDecontaminate]] against the
    * union of every added held-out set. */
  def bloomDecontaminateStateful(corpus: DataFrame, statePath: String,
                                 idCol: String = "doc_id",
                                 textCol: String = "text", n: Int = 8,
                                 numBits: Int = 1 << 22,
                                 numHashes: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    val prior = StateStore.committed(spark, statePath)
    require(prior.nonEmpty, s"no committed bloom state under $statePath")
    bloomProbe(corpus, foldBloomState(spark, prior, numBits),
      idCol, textCol, n, numBits, numHashes)
  }

  /** OR-fold of every bloom row across the committed dirs. Each dir
    * stores the cumulative filter, so the fold equals the latest one —
    * but folding (not `last.head`) keeps reads correct after
    * [[StateStore.compact]] unions the per-dir tables into one (OR is
    * associative-commutative; the fold is the union contract every
    * state reader must follow). Filters are numBits/8 bytes and dirs
    * are few, so the driver-side fold is trivial. */
  private def foldBloomState(spark: org.apache.spark.sql.SparkSession,
                             dirs: Seq[String],
                             numBits: Int): Array[Byte] = {
    val rows = spark.read.parquet(dirs.map(_ + "/bloom"): _*)
      .collect().map(_.getAs[Array[Byte]](0))
    require(rows.nonEmpty, "bloom state dirs hold no filter rows")
    rows.foreach(b => require(b.length * 8 == numBits,
      s"stored bloom has ${b.length * 8} bits, caller asked $numBits"))
    rows.reduce((a, b) => Array.tabulate(a.length)(i => (a(i) | b(i)).toByte))
  }

  /** Confusion counts of the n-gram language heuristic against a
    * ground-truth label column. */
  def langIdEval(df: DataFrame, truthCol: String = "lang",
                 textCol: String = "text"): DataFrame =
    df.select(col(truthCol), TextOps.langId(col(textCol)).as("lang_pred"))
      .groupBy(col(truthCol), col("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /**
   * Deterministic per-group quota sample: keep each group's `n` rows
   * with the smallest `md5(id)` — a seedless pseudo-random sample any
   * engine reproduces bit-for-bit (md5 of the same string is
   * universal), so downsampling decisions are auditable and stable
   * across reruns.
   *
   * Scale shape: the cut rides [[graft.functions.BoundedMinIds]] — a
   * partial-aggregable bounded top-`n` (each map task keeps ≤n ids per
   * group, the shuffle carries ≤n entries per (partition, group)) —
   * NOT a `row_number` window, which would drag every row of a hot
   * group through one task's sort. The n·groups survivor set is then a
   * broadcastable semi-join back to the full rows.
   */
  def quotaSample(df: DataFrame, n: Int, groupCol: String = "source",
                  idCol: String = "doc_id"): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val idT = df.schema(idCol).dataType
    val kept = df
      .groupBy(col(groupCol))
      .agg(graft.functions.VectorExpressions.boundedMinIds(
        md5(col(idCol).cast(StringType)), col(idCol).cast(StringType), n)
        .as("__kept"))
      .select(col(groupCol), explode(col("__kept")).as("__id"))
      .select(col(groupCol), col("__id").cast(idT).as(idCol))
    df.join(kept, Seq(groupCol, idCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * Corpus snapshot diff — the audit step between two versions of a
   * dataset (nightly crawl N vs N+1, pre- vs post-curation): per
   * document id, whether it was `added`, `removed`, `changed`, or
   * `unchanged`. Both sides collapse to `(id, md5(text))` digests
   * before the FULL OUTER equi-join, so the shuffle carries 48-byte
   * rows, never documents; content equality is digest equality (the
   * same md5-as-fingerprint contract as the dedup ops).
   * Output: `(doc_id, status)` for every id present in either side.
   */
  def corpusDiff(before: DataFrame, after: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val a = before.select(col(idCol), md5(col(textCol)).as("__ha"))
    val b = after.select(col(idCol), md5(col(textCol)).as("__hb"))
    a.join(b, Seq(idCol), "full")
      .select(col(idCol),
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") === col("__hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * Deterministic WEIGHTED sampling without replacement (integer
   * weights): keep the `n` rows with the largest per-row ticket, where
   * a row of weight `w` draws `w` salted-md5 tickets and keeps its
   * maximum. The max of `w` iid uniforms has CDF `t^w` — exactly the
   * `u^(1/w)` key of Efraimidis–Spirakis A-ES weighted reservoir
   * sampling — so this IS A-ES for integer weights, with zero floats:
   * tickets are md5 hex strings compared lexicographically, identical
   * in any engine (the transcendental-free rendering of a weighted
   * sample; fractional weights should go through [[mixSources]]'
   * per-mille machinery instead).
   *
   * Scale shape: the ticket explode is a narrow map bounded by
   * `maxWeight`; the per-row max is a partial-aggregable `max(string)`
   * (weight is row-local, so the "group" is the row — no hot keys by
   * construction); the final cut is `orderBy(...).limit(n)` =
   * `TakeOrderedAndProject` (per-partition heaps, no global sort).
   * Output: the `idCol`, the clamped weight `w`, and the winning
   * `ticket` (kept so the selection order itself is auditable).
   */
  def weightedSample(df: DataFrame, n: Int, weight: Column,
                     maxWeight: Int = 16, idCol: String = "doc_id",
                     salt: String = "wsample"): DataFrame =
    df.withColumn("w",
        least(greatest(weight.cast("long"), lit(1L)), lit(maxWeight.toLong)))
      .select(col(idCol), col("w"),
        explode(sequence(lit(1L), col("w"))).as("__i"))
      .withColumn("__t",
        md5(concat_ws(":", lit(salt), col(idCol).cast(StringType),
          col("__i").cast(StringType))))
      .groupBy(col(idCol), col("w"))
      .agg(max(col("__t")).as("ticket"))
      .orderBy(col("ticket").desc, col(idCol))
      .limit(n)

  /**
   * Quantile-bucket normalization of an integer quality metric —
   * assign every doc a bucket 0..buckets-1 by where its metric falls
   * among the corpus quantiles (the "keep the top decile by score"
   * cut every filtering pipeline runs), WITHOUT a global sort:
   * `ntile()` over the corpus would range-shuffle every row through
   * a full ordering. Instead the cutpoints come from the
   * distinct-VALUE cumulative histogram (the
   * [[graft.streaming.EventStreamOps.exactQuantiles]] move — the
   * window scans distinct metric values, never raw docs), and
   * assignment is a broadcast theta-join against the ≤ buckets-1
   * cutpoint rows plus a partial-aggregable max. Ties share a bucket
   * (exact-quantile semantics), so equal scores can never straddle a
   * keep/drop boundary.
   *
   * Cutpoint `q_i` = smallest value with `cum*buckets >= i*n`;
   * bucket = #cutpoints strictly below the value.
   * Output: `(idCol, metricCol, bucket)`.
   */
  def quantileBuckets(df: DataFrame, buckets: Int = 10,
                      metricCol: String = "n_chars",
                      idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(metricCol).cast("long").as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val wcum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(lit(1))))
    val cuts = cum
      .crossJoin(broadcast((1 until buckets).toDF("__i")))
      .filter(col("__cum") * buckets >= col("__i") * col("__n"))
      .groupBy(col("__i")).agg(min(col("__v")).as("__q"))
    df.select(col(idCol), col(metricCol))
      .join(broadcast(cuts), col(metricCol) > col("__q"), "left")
      .groupBy(col(idCol), col(metricCol))
      .agg(max(coalesce(col("__i"), lit(0))).cast("int").as("bucket"))
  }

  /** Corpus-GLOBAL deterministic pseudo-random sample: the `n` rows
    * with the smallest salted md5(id) — eval-subset selection that any
    * engine reproduces and that is STABLE UNDER GROWTH in expectation
    * (a doc's rank only moves when smaller hashes arrive). A plain
    * `orderBy(...).limit(n)` = TakeOrderedAndProject: per-partition
    * top-n heaps, no global sort. */
  def globalSample(df: DataFrame, n: Int,
                   idCol: String = "doc_id",
                   salt: String = "sample"): DataFrame =
    df.withColumn("__h",
        md5(concat_ws(":", lit(salt), col(idCol).cast(StringType))))
      .orderBy(col("__h"), col(idCol)).limit(n).drop("__h")

  /**
   * Sequence packing for pretraining batches: lay each group's docs
   * out in id order and assign bin ids by cumulative token budget —
   * `bin = floor(tokens_before_this_doc / budget)` — so consecutive
   * docs fill ~`budget`-token bins. Grouped by `groupCol` (packing is
   * embarrassingly parallel across groups; a single global ordering
   * would serialise the window at scale).
   */
  def packSequences(df: DataFrame, budget: Int,
                    groupCol: String = "source",
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol),
      TextOps.tokenCount(col(textCol)).cast(LongType).as("token_count"))
      .withColumn("bin_id",
        floor(coalesce(sum(col("token_count")).over(w), lit(0L)) /
          lit(budget)))
  }

  /**
   * TOKEN-EXACT block packing — the final pretraining layout step
   * [[packSequences]] stops short of: lay each group's token stream
   * out in (doc id, position) order and cut it into consecutive
   * `blockSize`-token blocks, documents SPILLING across block
   * boundaries (the GPT-style "concatenate with EOS, chop into fixed
   * windows" layout; packSequences bins whole docs). Every block but
   * each group's last has exactly `blockSize` tokens. Emits one row
   * per block with its token count, how many documents contribute to
   * it, and an md5 over the in-order space-joined tokens — the
   * content checksum a loader can verify shards against.
   *
   * Scale: the global position is one ranking window PER GROUP, so
   * groups are the parallelism unit — at 100 TB pack within
   * [[shardShuffle]] shards (pass `groupCol = "shard"`), which also
   * makes block layout independent of total corpus growth. The block
   * re-assembly is one grouped aggregation.
   * Output: `(groupCol, block_id, n_tokens, n_docs, block_md5)`.
   */
  def packTokenBlocks(df: DataFrame, blockSize: Int,
                      groupCol: String = "source",
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(groupCol), col(idCol),
        posexplode(split(trim(col(textCol)), " ")).as(Seq("__tp", "__tok")))
      .filter(length(col("__tok")) > 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(idCol), col("__tp"))
    toks
      .withColumn("block_id",
        ((row_number().over(w) - 1) / blockSize).cast(LongType))
      .groupBy(col(groupCol), col("block_id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"),
        md5(array_join(array_sort(collect_list(
            struct(col(idCol), col("__tp"), col("__tok"))))
          .getField("__tok"), " ")).as("block_md5"))
  }

  /**
   * Fraction of a doc's word n-grams occupied by its single most
   * common n-gram — the Gopher "most common n-gram" repetition signal
   * ([[repetitionRatio]] is the companion "any duplicate" signal).
   * Short docs (< n words) count one truncated whole-text gram
   * (fraction 1.0), mirroring the shingle kernel's convention.
   * A pure per-document signal, so it runs as a narrow map over the
   * native [[graft.functions.VectorExpressions.TopShingleFraction]]
   * kernel (one local count pass per row) — the explode + double
   * groupBy formulation shuffled every n-gram of the corpus only to
   * group it straight back by doc id.
   */
  def topNgramFraction(df: DataFrame, n: Int = 3,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.select(col(idCol),
      round(graft.functions.VectorExpressions
        .topShingleFraction(col(textCol), n), 4).as("top_ngram_frac"))
  }

  /** Per-source token-count distribution markers: exact interpolated
    * median and p90 (Spark `percentile` and DuckDB `quantile_cont`
    * share the R-7 linear-interpolation definition). */
  def sourceTokenQuantiles(df: DataFrame, sourceCol: String = "source",
                           textCol: String = "text"): DataFrame = {
    val tc = TextOps.tokenCount(col(textCol)).cast(DoubleType)
    df.groupBy(col(sourceCol))
      .agg(round(percentile(tc, lit(0.5)), 2).as("median_tokens"),
        round(percentile(tc, lit(0.9)), 2).as("p90_tokens"))
  }

  /** Per-source monitoring aggregates: doc count, total whitespace
    * tokens, mean char length (single division + round(2)). */
  def sourceStats(df: DataFrame, sourceCol: String = "source",
                  textCol: String = "text"): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        sum(TextOps.tokenCount(col(textCol)).cast(LongType))
          .as("total_tokens"),
        round(sum(length(col(textCol)).cast(LongType))
          .cast(DoubleType) / count(lit(1)), 2).as("avg_chars"))

  /**
   * Sliding-window token chunking with overlap — the RAG/pretraining
   * document splitter. Chunk starts are `0, step, 2·step, …` with
   * `step = chunkSize - overlap`; a trailing start is kept only when
   * its chunk contributes at least one token not already covered
   * (`start + overlap < n`). Emits one row per chunk with its token
   * count and boundary tokens (the full token slice is available via
   * the same expressions — boundary columns keep the gate output
   * narrow). A narrow map + explode: no shuffle at any scale; chunk
   * count per doc is `⌈(n - overlap) / step⌉`.
   */
  def chunkTokens(df: DataFrame, chunkSize: Int = 64, overlap: Int = 16,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val step = chunkSize - overlap
    val toks = split(trim(col(textCol)), " ")
    df.select(col(idCol), toks.as("__t"), size(toks).as("__n"))
      .select(col(idCol), col("__t"), col("__n"),
        explode(filter(sequence(lit(0), col("__n") - 1, lit(step)),
          s => s === 0 || (s + lit(overlap)) < col("__n"))).as("__s"))
      .select(col(idCol),
        (col("__s") / lit(step)).cast(LongType).as("chunk_id"),
        least(lit(chunkSize), col("__n") - col("__s")).cast(LongType)
          .as("n_tokens"),
        element_at(col("__t"), col("__s") + 1).as("first_tok"),
        element_at(col("__t"),
          least(col("__n"), col("__s") + chunkSize)).as("last_tok"))
  }

  /**
   * Deterministic train/val/test assignment by salted md5 bucket: the
   * first hex nibble of `md5(salt:id)` maps 13/16 → train, 2/16 → val,
   * 1/16 → test. Pure narrow map, reproducible bit-for-bit in any
   * engine (md5 of the same string is universal) — the split of a
   * given document never changes as the corpus grows, which is the
   * property a 100 TB pipeline needs (no global shuffle, no seed
   * coordination, stable across reruns and engines).
   */
  def assignSplits(df: DataFrame, idCol: String = "doc_id",
                   salt: String = "split"): DataFrame = {
    val nibble =
      substring(md5(concat_ws(":", lit(salt), col(idCol).cast(StringType))),
        1, 1)
    df.select(col(idCol),
      when(nibble.isin("d", "e"), lit("val"))
        .when(nibble === "f", lit("test"))
        .otherwise(lit("train")).as("split"))
  }

  /**
   * LEAKAGE-SAFE split assignment: like [[assignSplits]] but hashed on
   * a GROUP key (url domain, source, near-dup cluster id) so every
   * member of a group lands in the SAME split — the property that
   * keeps near-duplicates and same-site pages from straddling
   * train/test (the split-leakage failure mode document-level hashing
   * cannot prevent). Same salted-md5 nibble recipe: 13/16 train,
   * 2/16 val, 1/16 test; pure narrow map, growth-stable,
   * engine-reproducible. A NULL group key coalesces to a sentinel
   * BEFORE hashing — without it engines silently diverge (Spark's
   * concat_ws skips nulls and hashes the bare salt; SQL `||` yields
   * NULL and falls to the default arm), and all null-keyed docs still
   * land in ONE split, preserving the leakage guarantee.
   * Output: `(idCol, groupCol, split)`.
   */
  def groupSplits(df: DataFrame, idCol: String = "doc_id",
                  groupCol: String = "source",
                  salt: String = "split"): DataFrame = {
    val nibble = substring(
      md5(concat_ws(":", lit(salt),
        coalesce(col(groupCol).cast(StringType), lit("__null__")))),
      1, 1)
    df.select(col(idCol), col(groupCol),
      when(nibble.isin("d", "e"), lit("val"))
        .when(nibble === "f", lit("test"))
        .otherwise(lit("train")).as("split"))
  }

  /**
   * Deterministic shard-shuffle for training-data export: assign every
   * document a shard (salted-md5 hash mod `nShards`) and a
   * pseudo-random position within its shard (ordered by the full md5,
   * id tiebreak) — the global shuffle a data loader needs, without a
   * seed, reproducible bit-for-bit in any engine (same recipe as
   * [[assignSplits]]). Growth-stable: adding documents never moves an
   * existing document to a different shard (its hash is unchanged),
   * only positions after insertion points shift.
   *
   * Plan shape: a narrow hash projection + one row_number window
   * partitioned by shard — shard cardinality is the parallelism, so
   * pick `nShards` ≳ cluster cores for export (each shard's window
   * sorts only corpus/nShards rows). Downstream
   * `.write.partitionBy("shard")` lands one directory per shard.
   */
  def shardShuffle(df: DataFrame, nShards: Int,
                   idCol: String = "doc_id",
                   salt: String = "shard"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val full = md5(concat_ws(":", lit(salt), col(idCol).cast(StringType)))
    val hv = conv(substring(full, 1, 8), 16, 10).cast("long")
    df.select(col(idCol), (hv % nShards).as("shard"), full.as("__h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__h"), col(idCol))).cast("int"))
      .drop("__h")
  }

  /**
   * Weighted source mixing: replicate each document `weight(source)`
   * times — the up/down-sampling step that turns curated sources into
   * a training mixture (2.5 epochs of wiki, 0.3 of web, …). A weight
   * `w` emits every integer epoch `e < ⌊w⌋` unconditionally plus epoch
   * `⌊w⌋` for a deterministic `frac(w)` fraction of documents, so the
   * realized token share converges to the requested ratio without a
   * seed. Inclusion of (doc, epoch) is decided by a salted-md5 uniform
   * — growth-stable (a document's epochs never change as the corpus
   * grows), reproducible bit-for-bit in any engine, and INDEPENDENT
   * across epochs (each fractional epoch drops a fresh subset, not a
   * prefix of the previous one). Weights are held to per-mille
   * precision so the keep test is pure 64-bit integer arithmetic —
   * no float threshold to drift across engines.
   *
   * Plan shape: broadcast-join the (tiny) weight table, explode ≤⌈w⌉
   * epoch ordinals, one narrow filter — no shuffle at any corpus size.
   * Weights are DATA (a broadcast DataFrame), not plan literals, so
   * the compiled plan is weight-table-size independent.
   * Output: `(doc_id, source, epoch)`, one row per kept replica.
   */
  def mixSources(df: DataFrame, weights: Map[String, Double],
                 defaultWeight: Double = 1.0,
                 idCol: String = "doc_id", sourceCol: String = "source",
                 salt: String = "mix"): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mix weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    def permille(w: Double): Long = math.round(w * 1000)
    val wdf = weights.toSeq.map { case (s, w) => (s, permille(w)) }
      .toDF(sourceCol, "__wpm")
    val epochs = explode(sequence(lit(0),
      greatest(ceil(col("__wpm") / 1000.0).cast("int") - 1, lit(0))))
    // uniform in [0, 2³²) from the first 8 md5 hex digits (the
    // assignSplits/shardShuffle recipe); keep epoch e of weight w iff
    // u/2³² < w − e  ⟺  u·1000 < (wpm − e·1000)·2³²  — exact in int64
    val u = conv(substring(md5(concat_ws(":", lit(salt),
      col(idCol).cast(StringType), col("__e").cast(StringType))),
      1, 8), 16, 10).cast(LongType)
    df.join(broadcast(wdf), Seq(sourceCol), "left")
      .withColumn("__wpm", coalesce(col("__wpm"),
        lit(permille(defaultWeight))))
      .filter(col("__wpm") > 0)
      .withColumn("__e", epochs)
      .filter(u * 1000L < (col("__wpm") - col("__e") * 1000L) *
        4294967296L)
      .select(col(idCol), col(sourceCol),
        col("__e").cast(LongType).as("epoch"))
  }

  /**
   * Temperature-scaled source mixing at T=2 (α=1/2) — the multilingual
   * resampling rule (XLM-R / mT5: sample source s with probability
   * ∝ n_s^α, α<1 upsampling low-resource sources): integer source
   * weights w_s = ⌊√n_s⌋ (exact on both engines — IEEE sqrt is
   * correctly rounded and n_s < 2⁵² — unlike pow(n, α), which is NOT
   * correctly rounded and 1-ulp-fragile cross-engine; this is why the
   * temperature is fixed at 2 rather than a parameter), per-source
   * keep rate in exact per-mille
   * `wpm_s = (budget · w_s · 1000) div (Σw · n_s)` (int64 — document
   * bound: budget·w·1000 < 2⁶³), then the [[mixSources]] epoch/keep
   * machinery verbatim: rates > 1000‰ replicate via epochs, the
   * fractional epoch keeps by the md5 uniform test. Expected output
   * size ≈ `budget` with per-source shares ∝ √n_s.
   *
   * Scale shape: one partial-aggregable source count (broadcast back —
   * the source table is a mixing table, bounded by construction), a
   * broadcast rate join, and the narrow epoch explode. No shuffle over
   * the corpus beyond the count.
   */
  def temperatureMix(df: DataFrame, budget: Long,
                     idCol: String = "doc_id",
                     sourceCol: String = "source",
                     salt: String = "tmix"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast(LongType))
    val tot = counts.agg(sum(col("__w")).as("__tw"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__wpm",
        expr(s"(${budget}L * __w * 1000L) div (__tw * __n)"))
      .select(col(sourceCol), col("__wpm"))
    val epochs = explode(sequence(lit(0),
      greatest(ceil(col("__wpm") / 1000.0).cast("int") - 1, lit(0))))
    val u = conv(substring(md5(concat_ws(":", lit(salt),
      col(idCol).cast(StringType), col("__e").cast(StringType))),
      1, 8), 16, 10).cast(LongType)
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(col("__wpm") > 0)
      .withColumn("__e", epochs)
      .filter(u * 1000L < (col("__wpm") - col("__e") * 1000L) *
        4294967296L)
      .select(col(idCol), col(sourceCol),
        col("__e").cast(LongType).as("epoch"))
  }

  /**
   * Preference-pair mining for reward-model / DPO training data:
   * within each group (prompt cluster, domain, dedup canonical), pair
   * the highest-quality document (`chosen`) with the lowest-quality
   * one (`rejected`), with deterministic id-ascending tiebreaks and a
   * minimum quality margin (degenerate single-doc or equal-quality
   * groups never emit — `minMargin ≥ 1` enforced). Pure int64, fully
   * oracle-exact.
   *
   * Scale shape: both extremes are partial-aggregable `min(struct)`
   * folds in ONE aggregate pass — a hot group (a viral prompt with
   * 10⁸ responses) collapses map-side, never a per-group sort or
   * window.
   */
  def preferencePairs(df: DataFrame, group: Column, quality: Column,
                      minMargin: Long = 1,
                      idCol: String = "doc_id"): DataFrame = {
    require(minMargin >= 1, s"minMargin must be >= 1, got $minMargin")
    df.select(group.as("group_key"), quality.cast("long").as("__q"),
        col(idCol).as("__id"))
      .groupBy(col("group_key"))
      .agg(
        min(struct((-col("__q")).as("nq"), col("__id").as("id")))
          .as("__c"),
        min(struct(col("__q").as("q"), col("__id").as("id")))
          .as("__r"))
      .select(col("group_key"),
        col("__c.id").as("chosen_id"), (-col("__c.nq")).as("chosen_q"),
        col("__r.id").as("rejected_id"), col("__r.q").as("rejected_q"))
      .withColumn("margin", col("chosen_q") - col("rejected_q"))
      .filter(col("margin") >= minMargin)
  }

  /**
   * Cross-source contamination matrix — the dataset-governance report
   * ("which sources share verbatim text?") that catches mirror sites,
   * syndicated boilerplate, and benchmark leakage BETWEEN corpus
   * components before mixing: for every ordered source pair (a < b),
   * the number of distinct texts present verbatim in both. Texts
   * travel as md5 keys (narrow shuffle; deterministic on both engines,
   * so even a collision renders identically — oracle-exact).
   *
   * Scale shape: one distinct over (text-key, source) — a duplicated
   * text collapses to ≤|sources| rows no matter how many copies — then
   * a self-equi-join on the key whose per-key fan-out is bounded by
   * the SOURCE vocabulary (≤ |sources|² pairs per text, never copy
   * count²; no salt needed for exactly that reason), and a
   * partial-aggregable pair count. The distinct table is lazily
   * checkpointed (self-joined intermediates invariant).
   */
  def sourceOverlap(df: DataFrame, sourceCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val t = df.select(md5(col(textCol)).as("__k"),
        col(sourceCol).as("__s")).distinct()
      .localCheckpoint(false)
    val a = t.select(col("__k"), col("__s").as("source_a"))
    val b = t.select(col("__k"), col("__s").as("source_b"))
    a.join(b, Seq("__k"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_texts"))
  }

  /**
   * Token-span decontamination (the Llama-3-style refinement of
   * [[decontaminate]]): instead of flagging a whole document for one
   * shared n-gram, mark the CONTAMINATED TOKEN POSITIONS — every token
   * inside a held-out-matching n-gram window, dilated by `radius`
   * tokens each side — and report the per-document clean fraction, so
   * the pipeline can drop only documents that are mostly-contaminated
   * (`clean_frac < 0.8` in the Llama recipe) rather than everything an
   * eval n-gram grazes.
   *
   * All arithmetic is integer (position sets, counts) — fully
   * oracle-checkable. Plan shape: positional shingles (narrow), one
   * equi-join against the distinct-pruned (usually broadcastable)
   * held-out shingle set, dilated match windows expand through a
   * `sequence` explode bounded by `n + 2·radius`, and a distinct-count
   * per doc — one shuffle over matched positions only, never over the
   * full token stream.
   * Output: `(doc_id, n_tokens, covered, clean_frac)` per corpus doc,
   * clean_frac rounded(4) for cross-engine float display parity.
   */
  def contaminationSpans(corpus: DataFrame, heldout: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text", n: Int = 8,
                         radius: Int = 4): DataFrame = {
    val toks = split(trim(col(textCol)), " ")
    // (__id, __p, __s): n-gram starting at 1-based token position __p
    def sh(df: DataFrame): DataFrame =
      df.select(col(idCol).as("__id"), toks.as("__t"),
          size(toks).as("__n"))
        .filter(col("__n") >= n)
        .select(col("__id"), col("__n"), col("__t"),
          explode(sequence(lit(1), col("__n") - (n - 1))).as("__p"))
        .select(col("__id"), col("__n"), col("__p"),
          concat_ws(" ", slice(col("__t"), col("__p"), lit(n))).as("__s"))
    val dirty = sh(heldout).select(col("__s")).distinct()
    val covered = sh(corpus).join(dirty, "__s")
      .select(col("__id"), col("__n"),
        explode(sequence(greatest(col("__p") - radius, lit(1)),
          least(col("__p") + lit(n - 1 + radius), col("__n"))))
          .as("__pos"))
      .groupBy(col("__id"))
      .agg(count_distinct(col("__pos")).as("covered"))
    corpus.select(col(idCol),
        size(toks).cast(LongType).as("n_tokens"))
      .join(covered.select(col("__id").as(idCol), col("covered")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        round(lit(1.0) - coalesce(col("covered"), lit(0L)) /
          greatest(col("n_tokens"), lit(1L)), 4).as("clean_frac"))
  }

  /** Host part of every URL occurrence (capture group 1 of
    * [[UrlPattern]]'s host segment) — RE2-safe, shared with the oracle. */
  val DomainPattern = "https?://([^/ ]+)"

  /**
   * URL canonicalization — the crawl-dedup step between fetch and
   * text extraction: the same page arrives under mixed-case hosts,
   * `www.` aliases, default ports, tracking parameters, and trailing
   * slashes, and URL-level dedup only works after all of those
   * collapse. Rules (each one anchored or global regexp_replace, all
   * RE2-safe and mirrored verbatim in the oracle SQL):
   *  1. lowercase scheme+authority ONLY (paths are case-sensitive);
   *  2. strip a leading `www.`;
   *  3. drop default ports (`:80` http, `:443` https);
   *  4. drop the fragment;
   *  5. strip tracking params (`utm_*`, `fbclid`, `gclid`) — the one
   *     multi-match rule (Spark replaces all matches by default;
   *     DuckDB needs the `'g'` flag);
   *  6. repair the query separator (an anchored `^([^?&]*)&` can match
   *     at most once in ANY engine, so replace-first vs replace-all
   *     semantics agree) — dropping a leading `?utm_…=…` leaves the
   *     next param `&`-led;
   *  7. trim one trailing slash.
   * The column must HOLD URLs: rules 1-3 and 6 anchor on the scheme
   * and no-op on other strings, but 4, 5, and 7 are positional — free
   * text containing `#`, `?utm_…=`, or a trailing `/` is rewritten
   * like the URL tail it resembles. Pure Column expressions —
   * codegen'd narrow map, no shuffle; URL-level dedup is then
   * [[DedupOps.exact]] on the canonical column.
   */
  def canonicalUrl(u: Column): Column = {
    val lowered = concat(
      lower(regexp_extract(u, "(?i)^(https?://[^/]*)", 1)),
      regexp_replace(u, lit("(?i)^https?://[^/]*"), lit("")))
    val noWww = regexp_replace(lowered,
      lit("^(https?://)www\\."), lit("$1"))
    val noPort = regexp_replace(regexp_replace(noWww,
      lit("^(http://[^/:]+):80([/?#]|$)"), lit("$1$2")),
      lit("^(https://[^/:]+):443([/?#]|$)"), lit("$1$2"))
    val noFrag = regexp_replace(noPort, lit("#.*$"), lit(""))
    val noTrk = regexp_replace(noFrag,
      lit("[?&](utm_[a-z]+|fbclid|gclid)=[^&]*"), lit(""))
    val fixQ = regexp_replace(noTrk, lit("^([^?&]*)&"), lit("$1?"))
    regexp_replace(fixQ, lit("/$"), lit(""))
  }

  /** [[canonicalUrl]] over a column, keeping the original: output adds
    * `canonical_url`. */
  def canonicalizeUrls(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("canonical_url", canonicalUrl(col(urlCol)))

  /**
   * C4-style per-domain corpus monitoring: for every URL host appearing
   * in the text, the number of documents mentioning it and the total
   * mention count. Explode + one grouped aggregate (map-side partial);
   * the distinct-docs count is exact. The standard first step before
   * per-domain quotas/blocklists in a web-scale curation pipeline.
   */
  def domainStats(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(DomainPattern),
          lit(1))).as("domain"))
      .groupBy(col("domain"))
      .agg(countDistinct(col(idCol)).as("docs"),
        count(lit(1)).as("mentions"))

  /**
   * C4-style per-domain quota enforcement — the blocklist/cap step
   * that [[domainStats]] monitoring feeds: each document is keyed by
   * its PRIMARY domain (first URL host in the text; documents with no
   * URL pool under the empty domain), blocklisted domains drop
   * entirely, and every surviving domain keeps at most `cap`
   * documents — the ones with the smallest `md5(id)`, i.e.
   * [[quotaSample]]'s seedless deterministic sample, so the cut is
   * auditable and bit-reproducible in any engine. The blocklist is a
   * literal predicate (config-sized, like the stopword lists — never a
   * driver-side collect).
   *
   * Scale shape: the per-domain cut is [[graft.functions.BoundedMinIds]]
   * — a partial-aggregable bounded top-`cap` (map tasks keep ≤cap ids
   * per domain; the shuffle carries ≤cap entries per (partition,
   * domain)). A `row_number` window here would pull every document of
   * a mega-domain (wikipedia.org at crawl scale: 10^8-10^9 rows)
   * through ONE task's sort; with the bounded aggregate the hot-domain
   * work stays flat across map tasks.
   * Output: `(idCol, domain, quota_rank)` for kept documents.
   */
  def domainQuota(df: DataFrame, cap: Int,
                  blocklist: Seq[String] = Nil,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val idT = df.schema(idCol).dataType
    val dom = df.select(col(idCol),
      regexp_extract(col(textCol), DomainPattern, 1).as("domain"))
    val allowed =
      if (blocklist.isEmpty) dom
      else dom.filter(!col("domain").isin(blocklist: _*))
    allowed
      .groupBy(col("domain"))
      .agg(graft.functions.VectorExpressions.boundedMinIds(
        md5(col(idCol).cast(StringType)), col(idCol).cast(StringType), cap)
        .as("__kept"))
      .select(col("domain"), posexplode(col("__kept")).as(Seq("__pos", "__id")))
      .select(col("__id").cast(idT).as(idCol), col("domain"),
        (col("__pos") + 1).cast(LongType).as("quota_rank"))
  }

  /**
   * Sketch-based per-source corpus profile: approximate distinct-text
   * count (HyperLogLog++) and approximate token-count quantiles
   * (Greenwald-Khanna) alongside exact doc/char counts.
   *
   * This is the 100 TB monitoring pattern: every sketch is a
   * CONSTANT-SIZE partial aggregate merged map-side, so the shuffle
   * carries one sketch per (partition, source) regardless of corpus
   * size — where the exact `sourceTokenQuantiles` sorts full per-group
   * token counts. Accuracy knobs: `rsd` (relative std-dev of the HLL
   * distinct estimate), `accuracy` (1/ε of the quantile sketch).
   * Sketches are engine-specific, so the gate is rows-only; the spec
   * pins estimates to tolerance bands around the exact answers.
   */
  def approxSourceProfile(df: DataFrame, sourceCol: String = "source",
                          textCol: String = "text", rsd: Double = 0.02,
                          accuracy: Int = 10000): DataFrame = {
    val tokens = size(split(trim(col(textCol)), " "))
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        approx_count_distinct(xxhash64(col(textCol)), rsd)
          .as("approx_distinct_texts"),
        percentile_approx(tokens, array(lit(0.5), lit(0.9), lit(0.99)),
          lit(accuracy)).as("token_quantiles"),
        sum(length(col(textCol))).as("chars"))
      .select(col(sourceCol), col("docs"), col("approx_distinct_texts"),
        col("token_quantiles").getItem(0).as("tokens_p50"),
        col("token_quantiles").getItem(1).as("tokens_p90"),
        col("token_quantiles").getItem(2).as("tokens_p99"),
        col("chars"))
  }

  /**
   * Deterministic count-min sketch over corpus tokens — the
   * engine-portable face of [[approxSourceProfile]]'s monitoring: a
   * `depth × width` counter matrix where row j counts tokens by
   * `md5(j:token)`'s first 32 bits mod `width`. Every estimate the
   * sketch yields is an ADMISSIBLE overestimate (each row ≥ the true
   * count; collisions only add), the classic Cormode-Muthukrishnan
   * guarantee. Unlike HLL/GK sketches, the hash is md5-based and the
   * counters are int64 sums, so the ENTIRE sketch is bit-identical
   * across engines and fully oracle-checkable — the same trick as the
   * dedup hashes (32-bit halves stay clear of sign territory in both
   * engines).
   *
   * Scale shape: token instances fold to the vocab-BOUNDED distinct
   * table first (one partial-agg count), so the depth-way explode runs
   * over distinct terms, not occurrences; the sketch itself is a
   * `depth·width`-BOUNDED aggregate merged map-side — constant
   * shuffle width at any corpus size. Output: `(j, cell, cnt)` rows
   * for non-empty cells.
   */
  def countMinSketch(df: DataFrame, depth: Int = 4, width: Int = 1024,
                     textCol: String = "text"): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch dims $depth x $width")
    termCells(termCounts(df, textCol), depth, width)
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Exact distinct-term counts — vocab-bounded. */
  private def termCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** The deterministic md5 cell coordinate of a `(j, term)` row — the
    * engine-portable hash family shared by the batch sketch, the
    * streaming sketch, and the SQL oracle (unsigned-32-bit hex parse:
    * the cross-engine hash-travel invariant). */
  private[graft] def cmCellExpr(width: Int): Column = expr(
    "cast(conv(substring(md5(concat(cast(j as string), ':', term))," +
      s" 1, 8), 16, 10) as bigint) % $width")

  /** The `depth` sketch coordinates of every term in `counts`. */
  private def termCells(counts: DataFrame, depth: Int,
                        width: Int): DataFrame =
    counts
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("term"), col("cnt"))
      .withColumn("cell", cmCellExpr(width))

  /**
   * Heavy hitters with their count-min estimates: the exact top-`topK`
   * tokens (count desc, token asc — a TakeOrdered, never a global
   * sort) joined against the [[countMinSketch]] row minima. The gate
   * face of the sketch: `est_cnt ≥ exact_cnt` always (admissibility),
   * with equality whenever the token's `depth` cells are
   * collision-free. At 100 TB the exact top-k here is the verification
   * harness (small and bounded); production reads estimates straight
   * from the bounded sketch without it.
   * Output: `(term, exact_cnt, est_cnt)`.
   */
  def countMinHeavyHitters(df: DataFrame, depth: Int = 4,
                           width: Int = 1024, topK: Int = 20,
                           textCol: String = "text"): DataFrame = {
    // counts feed both the sketch and the top-k — lazy checkpoint so
    // the corpus explode+aggregate lineage runs once per action
    val counts = termCounts(df, textCol).localCheckpoint(false)
    val sketch = termCells(counts, depth, width)
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("cnt")).as("__scnt"))
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(topK)
    termCells(top, depth, width)
      .join(sketch, Seq("j", "cell"))
      .groupBy(col("term"))
      .agg(max(col("cnt")).as("exact_cnt"), min(col("__scnt")).as("est_cnt"))
      .select(col("term"), col("exact_cnt"), col("est_cnt"))
  }

  /**
   * Deterministic KMV (k-minimum-values) distinct sketch per group —
   * the engine-portable face of [[approxSourceProfile]]'s
   * `approx_count_distinct`: where HLL is engine-seeded and
   * unverifiable across engines, KMV's whole chain is md5-based and
   * integer-exact, so the ESTIMATE itself is oracle-checkable. Each
   * group keeps its `k` smallest distinct 32-bit text-hash values
   * (Bar-Yossef et al.'s bottom-k estimator); with `h_k` the k-th
   * smallest hash, the distinct count estimates as
   * `(k-1)·2^32 div h_k` — exact integers until ONE final floor
   * division (the single-division rule). Groups with fewer than `k`
   * distinct hashes report the sketch size itself (exact by
   * construction).
   *
   * Scale shape: [[graft.functions.BoundedMinIds]] IS the bottom-k
   * structure — its TreeSet dedups equal hashes, so the sketch runs
   * straight over raw rows with NO distinct pre-shuffle: each map
   * task holds ≤k hashes per group, the shuffle carries ≤k entries
   * per (partition, group), constant state at any corpus size. The
   * `exact_distinct` column is the gate's verification harness (cheap
   * at gate scale); production reads the estimate alone.
   * Output: `(group, docs, exact_distinct, kmv_est)`.
   */
  def kmvDistinct(df: DataFrame, k: Int = 64, groupCol: String = "source",
                  textCol: String = "text",
                  withExact: Boolean = false): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    graft.functions.VectorExpressions.register(df.sparkSession)
    // fixed-width lowercase hex: lexicographic order == numeric order,
    // so the string-keyed bounded-min aggregate keeps the numerically
    // smallest hashes; the value travels as an unsigned 32-bit half
    // (the cross-engine hash invariant — never signed 64-bit)
    val hx = substring(md5(col(textCol)), 1, 8)
    // the sketch face is ONE bounded aggregate pass: a countDistinct
    // in the same agg would force Spark's distinct rewrite through a
    // full (group, value) pre-shuffle — exactly the shuffle KMV exists
    // to avoid (plan-guarded)
    val sketch = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("docs"),
        graft.functions.VectorExpressions.boundedMinIds(hx, hx, k)
          .as("__kmv"))
      .select(col(groupCol), col("docs"),
        // the k-th smallest of >= k distinct nonnegative integers is
        // >= k-1 > 0, so the division is always defined
        when(size(col("__kmv")) < k, size(col("__kmv")).cast(LongType))
          .otherwise(expr(s"${(k - 1).toLong * 4294967296L}L div " +
            s"cast(conv(element_at(__kmv, $k), 16, 10) as bigint)"))
          .as("kmv_est"))
    if (!withExact) sketch
    else {
      // gate harness only: the true distinct count rides a SEPARATE
      // aggregate joined back on the (few) groups
      val exact = df.groupBy(col(groupCol))
        .agg(countDistinct(col(textCol)).as("exact_distinct"))
      sketch.join(exact, Seq(groupCol))
        .select(col(groupCol), col("docs"), col("exact_distinct"),
          col("kmv_est"))
    }
  }

  /**
   * Boilerplate-token pruning: drop every token whose document
   * frequency exceeds `maxDfRatio` of the corpus (ubiquitous
   * template/stopword tokens carry no signal and bloat shingle sets),
   * preserving the surviving tokens' original order.
   *
   * Plan shape: posexplode → one grouped count-distinct for the df
   * table (tiny: one row per distinct token, broadcast back) → ordered
   * re-assembly under a per-doc window. Two shuffles total (token
   * aggregate + per-doc regroup); the re-assembly window partitions by
   * doc id, so it scales like any keyed aggregation. Emits
   * `(doc_id, text, kept, dropped)` — pruned docs can go straight back
   * into the dedup/shingle operators upstream.
   */
  def pruneFrequentTokens(df: DataFrame, maxDfRatio: Double = 0.5,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val total = df.select(countDistinct(col(idCol)).as("__total"))
    val toks = df.select(col(idCol),
      posexplode(split(trim(col(textCol)), " ")).as(Seq("__pos", "__tok")))
    // DROP list, not keep list: tokens over the df ratio are few by
    // construction (Σdf ≤ total token occurrences bounds how many can
    // exceed ratio·N), so the broadcast side stays small at any corpus
    // size — the keep list is the rest of the vocabulary and is not
    // broadcastable at scale
    val dropList = toks.groupBy("__tok")
      .agg(countDistinct(col(idCol)).as("__df"))
      .crossJoin(broadcast(total))
      // integer-exact gate: df·1000000 > ratio·total·1000000 avoids a
      // float division both engines would have to round identically
      .filter(col("__df") * 1000000 >
        floor(lit(maxDfRatio * 1000000)) * col("__total"))
      .select(col("__tok"))
    val kept = toks.join(broadcast(dropList), Seq("__tok"), "left_anti")
    kept.groupBy(col(idCol))
      .agg(array_join(array_sort(collect_list(struct(col("__pos"),
          col("__tok")))).getField("__tok"), " ").as("text"),
        count(lit(1)).as("kept"))
      .join(df.select(col(idCol),
        size(split(trim(col(textCol)), " ")).as("__n")), Seq(idCol), "right")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("kept"), lit(0L)).as("kept"),
        (col("__n") - coalesce(col("kept"), lit(0L))).as("dropped"))
  }
}
