package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * token counting, language ID, quality scoring, fingerprinting.
 *
 * All pure `Column` expressions (whole-stage-codegen'd, no UDFs): each
 * operator is a narrow map over the documents table, embarrassingly
 * parallel at any scale — no shuffle, no driver state. Formulas are
 * deliberately SQL-mirrorable so the DuckDB oracle can replay them
 * exactly (see SparkEntry.oracleSql).
 */
object TextOps {

  /** Whitespace tokens (single-space tokenizer, mirroring the oracle's
    * `string_split(text, ' ')`). */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Plain whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs + single digits + punctuation
    * marks, the shape a byte-pair tokenizer's pre-tokenizer produces. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  // Per-language stopword marker lists for the n-gram/stopword language
  // heuristic. Shared with the SQL oracle — keep in sync.
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val StopDe = Seq("der", "die", "das", "und", "ist", "nicht")
  val StopFr = Seq("le", "la", "les", "et", "est", "une")
  val StopEs = Seq("el", "los", "las", "y", "es", "una")
  val CjkPattern = "[\\u4e00-\\u9fff]"

  /** Occurrences of any of `words` among the tokens (duplicates count). */
  def hits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => words.map(w => t === lit(w)).reduce(_ || _)))

  /**
   * Deterministic language-ID heuristic: CJK characters → zh, else the
   * language with the most stopword hits, ties broken en > de > fr > es;
   * no hits at all → "unknown". (A real model would be an n-gram
   * classifier; the *pipeline shape* — codegen'd scoring + argmax — is
   * identical.)
   */
  def langId(text: Column): Column = {
    val en = hits(text, StopEn); val de = hits(text, StopDe)
    val fr = hits(text, StopFr); val es = hits(text, StopEs)
    when(regexp_count(text, lit(CjkPattern)) > 0, lit("zh"))
      .when(en === 0 && de === 0 && fr === 0 && es === 0, lit("unknown"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /**
   * Quality score in [0,1]: length (0.4), mean word length (0.2),
   * punctuation ratio (0.2), stopword density (0.2) — the standard
   * cheap pre-filter shape for web-scale corpus cleaning.
   *
   * Computed as an exact integer in [0,10000] then scaled: every term
   * is one floored double division of small integers, which is
   * bit-identical across engines. (A float sum-of-weighted-terms lands
   * on half-rounding boundaries where DuckDB's FMA'd evaluation differs
   * from Spark in the last ulp — found at sf0.1, doc 918.)
   */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast(DoubleType)
    val cns = length(regexp_replace(text, lit(" "), lit("")))
      .cast(DoubleType)
    val pn = size(regexp_extract_all(text,
      lit("[^A-Za-z0-9 ]"), lit(0))).cast(DoubleType)
    val ln = length(text).cast(DoubleType)
    val st = hits(text, StopEn).cast(DoubleType)
    // greatest(…, 1): empty text would divide by zero → NaN in Spark
    // but NULL in DuckDB — guard identically on both sides
    val nG = greatest(n, lit(1.0))
    val lnG = greatest(ln, lit(1.0))
    val t1 = least(n, lit(100.0)) * 40.0            // exact: int ≤ 100 · 40
    val t2 = least(floor(lit(250.0) * cns / nG), lit(2000.0))
    val t3 = lit(2000.0) - floor(lit(2000.0) * pn / lnG)
    val t4 = least(floor(lit(10000.0) * st / nG), lit(2000.0))
    (t1 + t2 + t3 + t4) / 10000.0
  }

  /** Whole-document fingerprint: md5 (identical in DuckDB → oracle-checkable,
    * unlike xxhash64 whose seed constants differ across engines). */
  def docFingerprint(text: Column): Column = md5(text.cast(BinaryType))

  /**
   * Winnowing-style shingle fingerprint: the minimum md5 over all 8-char
   * sliding windows — a rolling-hash document sketch; equal sketches are
   * strong near-dup evidence. O(len) per doc, no shuffle.
   */
  def winnowFingerprint(text: Column, window: Int = 8): Column = {
    val idx = sequence(lit(1), greatest(length(text) - (window - 1), lit(1)))
    array_min(transform(idx,
      i => md5(text.substr(i, lit(window)).cast(BinaryType))))
  }

  /**
   * TF-IDF: per-document top-`k` terms by `tf·idf` with
   * `tf = count/doc_len` and `idf = ln(N/df)`.
   *
   * Shape: explode → two grouped aggregates (term counts per doc,
   * document frequency per term) → equi-join on term → per-doc top-k
   * window. Everything partial-aggregates map-side; the only shuffles
   * are the two groupBys and the df join (term-keyed, so a hot term is
   * AQE-skew territory, not a broadcast problem — df is |vocab|-sized
   * and joins term-to-term). The corpus size N is carried as DATA (a
   * broadcast 1-row aggregate, not a literal), so the plan is
   * N-independent and compiling runs no job.
   *
   * Ranking uses `round(score, 6)` (absorbs cross-engine 1-ulp noise in
   * `ln`) with the term string as tiebreak — deterministic, and exactly
   * mirrorable in the SQL oracle.
   */
  def tfidfTop(df: DataFrame, k: Int = 1, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__len"),
        explode(col("__toks")).as("term"))
    val counts = toks.groupBy(col(idCol), col("__len"), col("term"))
      .agg(count(lit(1)).as("__cnt"))
    val dfreq = counts.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = counts.join(dfreq, "term")
      .join(broadcast(n))
      .withColumn("score",
        (col("__cnt").cast("double") / col("__len")) *
          log(col("__n").cast("double") / col("__df")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("score"), 6).desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), round(col("score"), 4).as("tfidf"),
        col("rank").cast("int").as("rank"))
  }

  /**
   * Bigram corpus-fit score — the integer-exact face of perplexity
   * filtering: how "ordinary" a document's token transitions are
   * relative to the whole corpus. For every adjacent token pair the
   * corpus-wide bigram frequency is looked up; a document scores its
   * total and mean hit count (a low mean = transitions the corpus has
   * rarely seen = gibberish, boilerplate-free OCR noise, wrong-language
   * leakage — the same docs an LM-perplexity filter drops). All counts
   * are integers, so unlike a real LM score the result is bit-stable
   * across engines and fully oracle-checkable; `fit_mean` divides once
   * at the end (the single-division float rule).
   *
   * Scale shape: one explode (narrow) → one bigram groupBy count
   * (map-side partial agg — the bigram table is vocab²-BOUNDED, far
   * smaller than the corpus) → one join back on bigram (hot bigrams
   * are AQE skew territory; the join carries only (bigram, count)) →
   * one per-doc aggregation. Docs with fewer than 2 tokens score 0
   * over 0 bigrams (kept, mean 0 — the filter should see them).
   */
  def bigramFit(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val bigrams = toks.select(col(idCol),
        explode(zip_with(col("__toks"),
          slice(col("__toks"), lit(2),
            greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("__bg"))
      .filter(col("__bg").contains(" ")) // zip_with pads the tail with null
    val counts = bigrams.groupBy(col("__bg"))
      .agg(count(lit(1)).as("__cnt"))
    bigrams.join(counts, "__bg")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("fit_total"),
        count(lit(1)).as("n_bigrams"))
      .join(df.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("fit_total"), lit(0L)).as("fit_total"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("fit_total"), lit(0L)) /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)), 4)
          .as("fit_mean"))
  }

  /**
   * PMI collocation mining: the corpus's most strongly-associated
   * adjacent token pairs ("new york"-style multiword expressions),
   * the standard phrase-detection pass before tokenizer/vocab training
   * (Mikolov et al.'s word2vec phrase step uses the same statistic).
   * Ranking statistic: `exp(PMI) = p(xy) / (p(x)·p(y)) =
   * pair_n·N² / (M·left_n·right_n)` with `N` total tokens and `M`
   * total bigrams — the log is monotone, so ranking by the ratio is
   * ranking by PMI without a cross-engine transcendental. Every factor
   * is an exact int64 count and the score is ONE division of exact
   * integer products (single-division float rule), so both engines
   * compute bit-identical doubles. Overflow bound (ANSI mode throws
   * loudly rather than wrapping): `pair_n·N²` needs N ≲ 2M tokens per
   * fitted corpus — past that, fit on a deterministic document sample
   * (the statistic is a ratio of frequencies, not totals).
   *
   * Scale shape: unigram/bigram counts are vocab-bounded partial aggs;
   * the score computation joins only count rows (never the corpus);
   * the 1-row totals frame is a broadcast cross join (model-as-data);
   * top-k collapses to TakeOrderedAndProject — no global sort.
   */
  /**
   * TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): rank
   * words by a damped random walk over the word co-occurrence graph —
   * the unsupervised keyword stage of a document-understanding
   * pipeline, composed from the same substrate as [[collocations]]
   * (adjacent-token pair counts) and the same INT64 FIXED-POINT power
   * iteration as the graph module's PPR (integral division per edge,
   * pure int64 sums — bit-identical across engines and summation
   * orders, so a fixed iteration count unrolls into an exact oracle).
   *
   * Graph: words with unigram count ≥ `minCount` (vocab bound);
   * undirected adjacency edges (self-loops dropped) weighted by count;
   * each iteration moves `rank·85·w div (100·wdeg)` along every edge
   * and restarts with `scale·15/100`. Overflow bound (ANSI throws, not
   * wraps): max rank ≤ V·scale, so the per-edge product needs
   * `V·scale·85·w_max < 2⁶³` — the default scale 10⁴ holds to ~50k
   * vocab × 10⁸-count edges; larger corpora lower `scale` or raise
   * `minCount` (ranking uses relative order only).
   *
   * Scale shape: pair counts are vocab-bounded partial aggs; the edge
   * list is built once and localCheckpointed with the per-iteration
   * join riding its (u) key; ranks are vocab-sized rows (never corpus
   * rows); top-k collapses to TakeOrderedAndProject.
   */
  def textRank(df: DataFrame, minCount: Long = 5, iters: Int = 2,
               topK: Int = 30, textCol: String = "text",
               scale: Long = 10000L): DataFrame = {
    require(scale % 100 == 0, "scale must be divisible by 100 so the " +
      "restart and damping terms are exact integers")
    val toks = df.select(tokens(col(textCol)).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val vocab = uni.filter(col("n") >= minCount).select(col("w"))
    val bi = toks.select(
        explode(zip_with(col("__toks"),
          slice(col("__toks"), lit(2),
            greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .filter(col("__bg.w2").isNotNull &&
        col("__bg.w1") =!= col("__bg.w2"))
      .groupBy(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val und = bi.select(col("w1").as("u"), col("w2").as("v"), col("c"))
      .union(bi.select(col("w2").as("u"), col("w1").as("v"), col("c")))
      .groupBy(col("u"), col("v")).agg(sum(col("c")).as("w"))
      .join(vocab.select(col("w").as("u")), Seq("u"), "left_semi")
      .join(vocab.select(col("w").as("v")), Seq("v"), "left_semi")
    val wdeg = und.groupBy(col("u")).agg(sum(col("w")).as("wd"))
    // built once, partitioned on the per-iteration join key (LPA move)
    val edges = und.join(wdeg, Seq("u"))
      .select(col("u"), col("v"), col("w"), col("wd"))
      .repartition(col("u")).localCheckpoint(false)
    var ranks = vocab.select(col("w").as("word"),
      lit(scale).as("rank_q"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(ranks, edges("u") === ranks("word"))
        .select(col("v").as("word"),
          expr("(rank_q * 85 * w) div (100 * wd)").as("__c"))
        .groupBy(col("word")).agg(sum(col("__c")).as("__s"))
      ranks = vocab.select(col("w").as("word"))
        .join(contrib, Seq("word"), "left")
        .select(col("word"),
          (lit(scale / 100 * 15) + coalesce(col("__s"), lit(0L)))
            .as("rank_q"))
    }
    ranks.orderBy(col("rank_q").desc, col("word")).limit(topK)
  }

  def collocations(df: DataFrame, minCount: Long = 5, topK: Int = 50,
                   textCol: String = "text"): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val bi = toks.select(
        explode(zip_with(col("__toks"),
          slice(col("__toks"), lit(2),
            greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .filter(col("__bg.w2").isNotNull) // zip_with pads the tail
      .groupBy(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .agg(count(lit(1)).as("pair_n"))
    val totals = uni.agg(sum(col("n")).as("__N")).crossJoin(
      bi.agg(sum(col("pair_n")).as("__M")))
    bi.filter(col("pair_n") >= minCount)
      .join(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("n", "left_n"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("n", "right_n"), Seq("w2"))
      .join(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_n"), col("left_n"),
        col("right_n"),
        round((col("pair_n") * col("__N") * col("__N")).cast("double") /
          (col("__M") * col("left_n") * col("right_n")), 6).as("score"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /**
   * Deflate-compressibility quality signal: highly repetitive or
   * template text compresses far below natural prose, and random noise
   * barely compresses at all, so the compressed/raw ratio separates
   * both tails the way curation pipelines use it (alongside
   * [[CurationOps.repetitionRatio]], which counts n-grams instead).
   * One `Deflater` per partition, `reset()` between documents —
   * partition-local, no shuffle, the [[MultimodalOps.decodeMeta]]
   * batch shape. zlib output is implementation-defined, so the gate is
   * rows-only; specs pin the ordering invariants and determinism.
   */
  def compressionRatio(df: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       level: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](1 << 16)
        val mapped = rows.map { case (id, text) =>
          val raw = if (text == null) Array.empty[Byte]
            else text.getBytes("UTF-8")
          if (raw.isEmpty) (id, 0L, 0L, 1.0) // zlib wrapper alone is noise
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var compressed = 0L
            while (!deflater.finished())
              compressed += deflater.deflate(buf)
            (id, raw.length.toLong, compressed,
              math.rint(compressed.toDouble / raw.length * 10000) / 10000)
          }
        }
        // release the native zlib buffers when the partition drains —
        // GC finalization is too late for long-lived sessions (end()
        // is idempotent, so the extra hasNext probes are safe)
        new Iterator[(Long, Long, Long, Double)] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) deflater.end()
            h
          }
          def next(): (Long, Long, Long, Double) = mapped.next()
        }
      }
      .toDF(idCol, "raw_bytes", "compressed_bytes", "compression_ratio")
  }

  /**
   * Corpus vocabulary for tokenizer training: the `maxSize` most
   * frequent tokens with occurrence and document-frequency counts,
   * ranked by (count desc, token asc) so the cut is deterministic.
   * One grouped aggregation (map-side partial — the reduce side is
   * vocab-bounded, not corpus-bounded) plus a top-k that plans as
   * TakeOrderedAndProject, never a global sort. The BPE-prep
   * counterpart of [[bigramFit]]'s pair table.
   */
  /**
   * Inverted-index construction — the retrieval substrate BM25 / query
   * routing reads from: one row per token with its document frequency,
   * collection frequency, and the head of its posting list rendered as
   * `"doc:tf,…"` (the first `maxPostings` docs by id).
   *
   * Scale shape: everything is ONE grouped aggregation over the
   * (token, doc) term-frequency table — `df`/`cf` are plain
   * partial-aggregable counts, and the posting head rides
   * [[graft.functions.BoundedMinIds]] (each map task keeps ≤
   * `maxPostings` entries per token), so a stopword's 10⁹-doc posting
   * list never collects anywhere: full posting lists at scale are the
   * (token, doc, tf) TABLE itself, bucketed by token; this operator
   * materializes the bounded index SUMMARY. The tf is embedded in the
   * bounded entry's payload (`doc:tf`), so no second join re-attaches
   * it. Zero-padded sort keys make string order = numeric doc order.
   * Output: `(token, df, cf, postings)`.
   */
  def invertedIndex(df: DataFrame, maxPostings: Int = 5,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val tf = df.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        graft.functions.VectorExpressions.boundedMinIds(
          lpad(col(idCol).cast("string"), 12, "0"),
          concat_ws(":", col(idCol).cast("string"),
            col("tf").cast("string")),
          maxPostings).as("__p"))
      .withColumn("postings", array_join(col("__p"), ","))
      .select(col("token"), col("df"), col("cf"), col("postings"))
  }

  def vocabulary(df: DataFrame, maxSize: Int,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col(idCol)).as("docs"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(maxSize)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("occurrences").desc, col("token"))).cast("int"))
  }

  /**
   * Tokenize against the trained [[vocabulary]]: every whitespace
   * token maps to its vocab rank (1-based), out-of-vocabulary tokens
   * to `<unk>` (id 0) — the id-ification step between curation and
   * model ingestion. Emits per-document fertility/coverage stats the
   * pipeline monitors (`n_tokens`, `n_unk`, and `id_sum`, an integer
   * checksum of the emitted id stream): OOV rate is THE signal for
   * sizing `vocabSize`. Plan: one vocab aggregation (vocab-bounded),
   * broadcast-joined to the exploded token stream, one per-doc
   * aggregation — the token shuffle is the only corpus-wide exchange.
   */
  def tokenizeWithVocab(df: DataFrame, vocabSize: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val vocab = vocabulary(df, vocabSize, idCol, textCol)
      .select(col("token"), col("rank"))
    val toks = df.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val stats = toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("rank").isNull, 1L).otherwise(0L)).as("n_unk"),
        sum(coalesce(col("rank").cast(LongType), lit(0L))).as("id_sum"))
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }

  /**
   * First-iteration BPE pair statistics: adjacent character-pair
   * occurrence counts over the corpus, weighted by word frequency —
   * exactly the table the first merge of byte-pair-encoding training
   * reads. Computed on the word-FREQUENCY table, not the token stream
   * (the trick that makes BPE training corpus-size-independent: a
   * 100 TB corpus has bounded distinct words, and every later
   * iteration touches only that compact table). Top-`k` by
   * (occurrences desc, pair asc) so the cut is deterministic and
   * SQL-mirrorable.
   */
  def bpePairStats(df: DataFrame, k: Int = 50,
                   textCol: String = "text"): DataFrame = {
    val wf = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf.select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("f")).as("occurrences"))
      .orderBy(col("occurrences").desc, col("pair"))
      .limit(k)
  }

  /**
   * BPE merge training. Learns `numMerges` merges from the corpus by
   * the textbook loop — count adjacent symbol pairs weighted by word
   * frequency, merge the most frequent (count desc, pair asc tiebreak
   * keeps it deterministic), repeat — run ENTIRELY on the distributed
   * word-frequency table: one corpus-wide shuffle builds it, then each
   * iteration is an aggregation over distinct-word rows only (the
   * standard trick — Sennrich et al.'s reference trainer does the
   * same on a dict). Words are represented as space-joined symbol
   * strings ("h e l l o"), so a merge is one `regexp_replace` with
   * non-consuming boundary lookarounds — left-to-right greedy,
   * matching the BPE merge pass. Each round localCheckpoints (the
   * iterative-loop invariant). Returns merges in rank order.
   *
   * Per-MERGE scaling: the distributed loop costs ~2 Spark jobs per
   * merge, which is fine for data scale but pathological for a real
   * 32k-merge tokenizer run (~64k sequential jobs of pure scheduler
   * overhead). Since the word-frequency table is bounded by DISTINCT
   * words — corpus-size-independent, and small in practice — when it
   * has ≤ `driverSideLimit` rows it is collected ONCE (a single job)
   * and the merge loop runs in-process with incrementally-maintained
   * pair counts (the Sennrich reference trainer's structure),
   * producing the IDENTICAL merge sequence: same frequency-weighted
   * counts, same (count desc, pair asc) tiebreak compared as UTF-8
   * bytes (Spark orders strings by binary UTF-8, which differs from
   * Java's UTF-16 compareTo above the BMP), same left-to-right
   * non-overlapping merge application. Corpora whose distinct-word
   * table exceeds the limit fall back to the distributed loop.
   */
  def bpeTrain(df: DataFrame, numMerges: Int,
               textCol: String = "text",
               driverSideLimit: Long = 1000000L): Seq[(String, String)] = {
    var wf = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
      // spaced symbol string: "hello" -> "h e l l o"
      .select(expr("concat_ws(' ', transform(sequence(1, length(w))," +
        " i -> substring(w, i, 1)))").as("w"), col("f"))
      .localCheckpoint()
    if (wf.count() <= driverSideLimit) {
      val words = wf.collect().map(r =>
        (r.getString(0).split(" "), r.getLong(1)))
      return bpeTrainInProcess(words, numMerges)
    }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val top = wf.select(col("f"), explode(expr(
          "transform(slice(split(w, ' '), 1, size(split(w, ' ')) - 1)," +
          " (s, i) -> struct(s as a, element_at(split(w, ' '), i + 2) as b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val pat = "(?<=^| )" + java.util.regex.Pattern.quote(a) + " " +
          java.util.regex.Pattern.quote(b) + "(?= |$)"
        // quoteReplacement: a merged symbol containing `$`/`\` must not
        // be read as a group reference by the replacement engine
        val rep = java.util.regex.Matcher.quoteReplacement(a + b)
        // no Sweep here: operators may run under a concurrent server,
        // where freeing checkpoint blocks kills other in-flight plans;
        // the handful of per-round blocks are reclaimed by periodicGC
        wf = wf
          .select(regexp_replace(col("w"), pat, rep).as("w"), col("f"))
          .localCheckpoint()
      }
    }
    merges.toList
  }

  /** Unsigned lexicographic comparison of UTF-8 bytes — Spark's (and
    * DuckDB's) string ordering, which Java's UTF-16 `compareTo`
    * diverges from for supplementary characters. */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** The in-process BPE merge loop over a collected word-frequency
    * table: pair counts are maintained INCREMENTALLY (only words
    * containing the winning pair are re-scanned, found through a
    * lazily-validated pair→word index), so 32k merges cost minutes of
    * CPU, not 64k Spark jobs. Merge selection and application are
    * bit-compatible with the distributed loop (see [[bpeTrain]]). */
  private def bpeTrainInProcess(words: Array[(Array[String], Long)],
                                numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms = words.map(_._1.toBuffer)
    val freq = words.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair → word indices that contained the pair when last scanned;
    // entries go stale after merges and are re-validated on use
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def tally(i: Int, sign: Long): Unit = {
      val s = syms(i); val f = freq(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L) index.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    words.indices.foreach(tally(_, 1L))
    val merges = mutable.ListBuffer.empty[(String, String)]
    while (merges.size < numMerges && counts.nonEmpty) {
      var best: (String, String) = null
      var bc = Long.MinValue
      counts.foreach { case (p, c) =>
        if (c > bc || (c == bc && (utf8Less(p._1, best._1) ||
            (p._1 == best._1 && utf8Less(p._2, best._2))))) {
          best = p; bc = c
        }
      }
      merges += best
      val (a, b) = best
      val touched = index.remove(best).getOrElse(mutable.Set.empty)
      touched.foreach { i =>
        val s = syms(i)
        var has = false
        var j = 0
        while (!has && j < s.length - 1) {
          if (s(j) == a && s(j + 1) == b) has = true
          j += 1
        }
        if (has) {
          tally(i, -1L)
          // left-to-right non-overlapping, as the regexp pass
          val out = mutable.ArrayBuffer.empty[String]
          j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
              out += a + b; j += 2
            } else { out += s(j); j += 1 }
          }
          syms(i) = out
          tally(i, 1L)
        }
      }
    }
    merges.toList
  }

  /**
   * Apply trained BPE merges: per-document token segmentation counts.
   * The merge table is a closure-captured broadcast (model-as-data —
   * `numMerges` never changes the plan), applied per partition with a
   * per-partition word→segmentation memo, so a word repeated across a
   * partition encodes once. Emits `(idCol, n_words, n_bpe_tokens)` —
   * the fertility statistics a tokenizer-training pipeline monitors.
   * Narrow map, no shuffle.
   */
  def bpeEncode(df: DataFrame, merges: Seq[(String, String)],
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val src = df.select(col(idCol).cast(LongType),
      coalesce(col(textCol), lit("")).cast(StringType))
      .as[(Long, String)]
    src.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Int]
      def segments(word: String): Int = memo.getOrElseUpdate(word, {
        var syms = word.map(_.toString).toBuffer
        var more = syms.length > 1
        while (more) {
          // lowest-rank adjacent pair present
          var best = Int.MaxValue
          var at = -1
          var i = 0
          while (i < syms.length - 1) {
            val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < best) { best = r; at = i }
            i += 1
          }
          if (at < 0) more = false
          else {
            // merge EVERY occurrence of the winning pair, left to right
            val (a, b) = (syms(at), syms(at + 1))
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += a + b; j += 2
              } else { out += syms(j); j += 1 }
            }
            syms = out
            more = syms.length > 1
          }
        }
        syms.length
      })
      it.map { case (id, text) =>
        val words = text.trim.split(" ").filter(_.nonEmpty)
        (id, words.length.toLong,
          words.map(w => segments(w).toLong).sum)
      }
    }.toDF(idCol, "n_words", "n_bpe_tokens")
  }

  /**
   * CCNet-style perplexity bucketing on the integer-exact corpus-fit
   * score: documents are split into `head` / `middle` / `tail` buckets
   * by how ordinary their token transitions are ([[bigramFit]]'s
   * integer face of LM perplexity — CCNet buckets by a KenLM score; a
   * HIGH fit is a LOW perplexity, so high-fit docs land in `head`).
   * The cut value is RELATIVE — the document's per-mille mean bigram
   * hit count (`fit_total·1000 div max(n_bigrams,1)`) expressed in
   * per-mille of the CORPUS mean (`Σfit_total·1000 div Σn_bigrams`),
   * because the absolute score grows linearly with corpus size (every
   * bigram's count does) and a fixed absolute threshold would migrate
   * whole corpora between buckets across snapshots. Both divisions are
   * int64-exact in both engines. `tail` below `tailMax`, `head`
   * at/above `headMin` (both in per-mille of the corpus mean),
   * `middle` between.
   *
   * Scale shape: inherits [[bigramFit]]'s (bounded bigram table,
   * map-side partial aggs) plus one single-row broadcast (the corpus
   * mean) and a narrow projection — nothing new shuffles.
   * Output: `(doc_id, rel_pm, bucket)`, every input doc exactly once
   * (sub-2-token docs score 0 → `tail`).
   */
  /**
   * Hashing-trick feature vectors (Weinberger et al. 2009 — the
   * Vowpal-Wabbit featurizer): each document's tokens hash into a
   * fixed `dim`-bucket count vector, so the feature space needs NO
   * vocabulary pass, no model table, and never grows — the property
   * that lets a featurizer run on an unbounded stream of new corpora.
   * Bucket = md5-uint32 of the token mod `dim` (engine-reproducible,
   * seedless); counts are exact int64. One partial-aggregable pass
   * over the exploded tokens; output width is `dim`, independent of
   * vocabulary size.
   * Output: `(idCol, f0 … f{dim-1})`.
   */
  def hashedFeatures(df: DataFrame, dim: Int = 16,
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     salt: String = "feat"): DataFrame = {
    require(dim >= 2 && dim <= 256, s"dim out of range: $dim")
    val bucket = conv(substring(md5(concat_ws(":", lit(salt),
      col("__t"))), 1, 8), 16, 10).cast(LongType) % dim
    val feats = (0 until dim).map(j =>
      count(when(col("__b") === j, 1)).as(s"f$j"))
    df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .withColumn("__b", bucket)
      .groupBy(col(idCol))
      .agg(feats.head, feats.tail: _*)
  }

  /**
   * Fill-in-the-middle transformation (the FIM pretraining objective,
   * Bavarian et al. 2022): split each document's token stream at two
   * DETERMINISTIC pseudo-random points and emit the PSM rearrangement
   * `<PRE> prefix <SUF> suffix <MID> middle`. Cut points derive from
   * salted md5 uniforms (the mixSources/shardShuffle recipe — uint32
   * from the first 8 hex digits, engine-reproducible, seedless):
   * `c1 = 1 + h1 mod (n-1)` tokens of prefix (1..n-1),
   * `c2 = c1 + 1 + h2 mod (n-c1)` end of middle (c1+1..n) — middle
   * and prefix always non-empty, suffix possibly empty. Documents
   * under 3 tokens pass through unsplit (empty middle/suffix).
   * A pure narrow projection — codegen'd Columns, zero shuffle, so
   * the transform streams at scan speed over any corpus size.
   * Output: `(idCol, n_tokens, prefix, middle, suffix, psm)`.
   */
  def fimSplit(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text",
               salt: String = "fim"): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t)
    def u(tag: String): Column =
      conv(substring(md5(concat_ws(":", lit(salt),
        col(idCol).cast(StringType), lit(tag))), 1, 8), 16, 10)
        .cast(LongType)
    val c1 = (lit(1L) + u("1") % (n - 1).cast(LongType)).cast("int")
    val c2 = (c1.cast(LongType) + 1L +
      u("2") % (n.cast(LongType) - c1)).cast("int")
    val splittable = n >= 3
    val prefix = when(splittable,
      array_join(slice(t, lit(1), c1), " "))
      .otherwise(array_join(t, " "))
    val middle = when(splittable,
      array_join(slice(t, c1 + 1, c2 - c1), " ")).otherwise(lit(""))
    val suffix = when(splittable,
      array_join(slice(t, c2 + 1, n - c2), " ")).otherwise(lit(""))
    df.select(col(idCol), n.as("n_tokens"), prefix.as("prefix"),
      middle.as("middle"), suffix.as("suffix"),
      concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
        lit("<MID>"), middle).as("psm"))
  }

  def perplexityBuckets(df: DataFrame, tailMax: Long = 980L,
                        headMin: Long = 1005L, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(tailMax <= headMin,
      s"tailMax ($tailMax) must be <= headMin ($headMin)")
    val fit = bigramFit(df, idCol, textCol).localCheckpoint(false)
    val cm = fit.agg(
      expr("sum(fit_total) * 1000 div greatest(sum(n_bigrams), 1)")
        .as("__cm"))
    fit.join(broadcast(cm))
      .withColumn("rel_pm", expr(
        "(fit_total * 1000 div greatest(n_bigrams, 1)) * 1000 div " +
          "greatest(__cm, 1)"))
      .select(col(idCol), col("rel_pm"),
        when(col("rel_pm") < tailMax, lit("tail"))
          .when(col("rel_pm") >= headMin, lit("head"))
          .otherwise(lit("middle")).as("bucket"))
  }

  /**
   * BM25 ranked retrieval over the corpus — the classic inverted-index
   * scoring every retrieval/RAG pipeline runs, in an INTEGER-EXACT
   * variant so both engines agree bit-for-bit (the float-parity
   * invariant forbids weighted float sums in compared outputs, and
   * BM25 is exactly such a sum).
   *
   * Per query term t with document frequency df, and a document with
   * term frequency tf and length dl, classic BM25 (k1=6/5, b=3/4)
   * scores `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`.
   * Multiplying through by `20·A` (A = floor(avgdl)) makes the
   * saturation factor the exact integer ratio
   * `44·A·tf / (20·A·tf + 6·A + 18·dl)`, and the idf becomes the
   * rational surrogate `idf_pm = 1000·(N−df+1) div (df+1)` — strictly
   * monotone in the true BM25 idf (both decrease in df), so each
   * term's document ordering is preserved; magnitudes weight rare
   * terms more steeply than log-idf (documented trade for bit-exact
   * cross-engine sums). Each term contributes
   * `idf_pm · 44·A·tf div (20·A·tf + 6·A + 18·dl)` — a floor of an
   * int64 ratio — and a document's score is the int64 SUM of its
   * matched terms' contributions: summation-order-free by
   * construction. Duplicate query terms are deduplicated (a binary
   * query-term model).
   *
   * Scale shape: per-doc term counts are one explode + one partial
   * aggregation; the query-term join is a BROADCAST of q·|terms| rows
   * that semi-filters the posting scan; scoring aggregates map-side
   * per (query, doc); and the final per-query top-k rides
   * [[graft.functions.BoundedMinIds]] (map tasks keep ≤k candidates
   * per query) — NEVER a window over a query's full candidate set,
   * which at corpus scale would drag every matching document of a hot
   * query through one task. Int64 bounds hold to ~10^10 docs
   * (idf_pm·44·A·tf ≤ 1e13·5e4 at web-corpus shapes).
   * Output: `(query_id, doc_id, score, rank)`, rank 1..k per query by
   * (score desc, doc_id asc).
   */
  def bm25TopK(df: DataFrame, queries: Seq[(Int, String)], k: Int = 5,
               idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)

    val toks = df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
    val counts = toks.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = counts.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // N docs and A = floor(mean doc length) — one tiny broadcast row
    val stats = df.select(col(idCol), tokenCount(col(textCol)).as("__dl"))
      .agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__t"))
      .select(col("__n"), expr("__t div __n").as("__a"))
    val qterms = queries
      .flatMap { case (qid, q) =>
        q.trim.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t))
      }
      .toDF("query_id", "term")
    val scored = counts
      .join(broadcast(qterms), "term")
      .join(dfreq, "term")
      .join(broadcast(stats))
      .withColumn("__contrib", expr(
        "(1000 * (__n - df + 1) div (df + 1)) * (44 * __a * tf) div " +
          "(20 * __a * tf + 6 * __a + 18 * dl)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__contrib")).as("score"))
      // consumed twice (top-k cut + score re-attach) — lazy checkpoint
      // so the explode/join lineage runs once, not per join side
      .localCheckpoint(false)
    // bounded per-query top-k: sort key = (inverted zero-padded score,
    // zero-padded doc id) so ascending string order == (score desc, id
    // asc); 10^18 headroom exceeds any reachable int64 score above
    val topIds = scored
      .withColumn("__sk", concat(
        lpad((lit(1000000000000000000L) - col("score")).cast("string"),
          19, "0"),
        lpad(col("doc_id").cast("string"), 19, "0")))
      .groupBy(col("query_id"))
      .agg(graft.functions.VectorExpressions.boundedMinIds(
        col("__sk"), col("doc_id").cast("string"), k).as("__ids"))
      .select(col("query_id"), explode(col("__ids")).as("__id"))
      .select(col("query_id"), col("__id").cast("long").as("doc_id"))
    // rank/score re-attach over the ≤ q·k survivors — the window input
    // is bounded by the aggregate, so this sort never sees the corpus
    import org.apache.spark.sql.expressions.Window
    topIds.join(scored, Seq("query_id", "doc_id"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id").asc)).cast("int"))
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /**
   * Retrieval-quality metrics over a ranked run against relevance
   * judgments — the eval harness every retrieval stack (BM25, ANN,
   * rerankers) reports through: per query, the number of relevant
   * documents, hits in the top `k`, the first relevant rank, the
   * reciprocal rank in exact ppm (`1000000 div first_rank` — MRR is
   * its mean), and recall@k in exact per-mille. All integer arithmetic
   * (truncating div both engines), so the whole report is
   * oracle-exact; queries with no relevant retrieved render rank 0 /
   * rr 0 rather than dropping (the report must show the failure).
   *
   * Inputs: `run(query_id, doc_id, rank)` (any extra columns ignored),
   * `qrels(query_id, doc_id)`. Scale shape: one (query, doc) equi-
   * semi-join + partial-aggregable count/min per query — bounded by
   * run size (q·k rows), never corpus size; qrels side shuffles once.
   */
  def retrievalMetrics(run: DataFrame, qrels: DataFrame,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = qrels.groupBy(col("query_id"))
      .agg(count(lit(1)).as("rel_total"))
    val hit = run.select(col("query_id"), col("doc_id"), col("rank"))
      .filter(col("rank") <= k)
      .join(qrels.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__hits"), min(col("rank")).as("__fr"))
    run.select(col("query_id")).distinct()
      .join(rel, Seq("query_id"), "left")
      .join(hit, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("rel_total"), lit(0L)).as("rel_total"),
        coalesce(col("__hits"), lit(0L)).as("hits_at_k"),
        coalesce(col("__fr"), lit(0)).cast(IntegerType).as("first_rank"),
        when(col("__fr").isNull, lit(0L))
          .otherwise(expr("1000000L div __fr")).as("rr_ppm"),
        when(coalesce(col("rel_total"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(1000L * coalesce(__hits, 0L)) div rel_total"))
          .as("recall_pm"))
  }

  /**
   * Per-source n-gram diversity — the self-repetition metric behind
   * Self-BLEU-style generation/corpus diversity reports: for each
   * source, total bigram occurrences (repeats counted), distinct
   * bigrams, and the distinct ratio in exact per-mille (a templated /
   * boilerplate-heavy source scores low). A doc shorter than `n`
   * tokens contributes its whole text as one gram (both engines
   * render the same slice). All integer arithmetic — oracle-exact.
   *
   * Scale shape: narrow gram explode (no shuffle), then one two-phase
   * distinct aggregate per source — hot sources combine map-side.
   * Fixed at n=2: the slice construction is mirrored verbatim in the
   * DuckDB oracle, and bigrams are the standard diversity unit.
   */
  def ngramDiversity(df: DataFrame,
                     sourceCol: String = "source",
                     textCol: String = "text"): DataFrame =
    df.select(col(sourceCol).as("source"),
        split(trim(col(textCol)), " ").as("__w"))
      .select(col("source"), explode(expr(
        "transform(sequence(1, greatest(size(__w) - 1, 1)), " +
          "i -> concat_ws(' ', slice(__w, i, 2)))")).as("__g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("ngrams"),
        countDistinct(col("__g")).as("distinct_ngrams"))
      .withColumn("diversity_pm",
        expr("(1000L * distinct_ngrams) div ngrams"))

  /**
   * Word-level vocabulary profile per source: token count, type count
   * (distinct words), hapax legomena (words seen exactly once), and
   * type-token / hapax ratios in exact per-mille — the corpus
   * linguistics report (lexical richness, OCR-garbage and template
   * detection: templated sources show low TTR, OCR noise shows high
   * hapax). Two partial-aggregable passes: (source, word) counts
   * combine map-side, then one source-level fold — a giant source is
   * bounded by its vocabulary at the second pass, never its token
   * volume. Output: `(source, tokens, types, hapax, ttr_pm,
   * hapax_pm)`.
   */
  def vocabularyProfile(df: DataFrame, sourceCol: String = "source",
                        textCol: String = "text"): DataFrame =
    df.select(col(sourceCol).as("source"),
        explode(split(trim(col(textCol)), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("source"), col("__w"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("source"))
      .agg(sum(col("__c")).as("tokens"),
        count(lit(1)).as("types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("tokens"), col("types"), col("hapax"),
        expr("(1000 * types) div tokens").as("ttr_pm"),
        expr("(1000 * hapax) div types").as("hapax_pm"))

  /**
   * ROUGE-n overlap between candidate/reference text pairs — the
   * summarization/generation eval metric (Lin 2004), and the
   * verbatim-overlap audit a distillation pipeline runs between model
   * outputs and their sources. Per pair: the CLIPPED n-gram overlap
   * (Σ over distinct grams of min(candidate count, reference count) —
   * a repeated gram only matches as often as the reference carries
   * it), both gram totals, and precision / recall / F1 in exact
   * per-mille (`F1 = 2o/(c+r)` — the algebraic collapse of 2PR/(P+R),
   * so one integer division, no float chain). Gram construction
   * mirrors [[ngramDiversity]]'s slice convention (a document shorter
   * than `n` tokens contributes its single short slice, so totals are
   * ≥ 1 and the divisions are total).
   *
   * Scale shape: per-side gram counts are partial-aggregable
   * group-bys bounded by text length; the overlap is one
   * (pair-key, gram) equi-join; totals come straight off the token
   * array sizes (no second aggregation). No windows, no collects.
   * Output: `(keyCols…, overlap, cand_ngrams, ref_ngrams,
   * precision_pm, recall_pm, f1_pm)` — one row per input pair.
   */
  def rougeN(pairs: DataFrame, candCol: String, refCol: String,
             keyCols: Seq[String], n: Int = 2): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val k = keyCols.map(col)
    def grams(c: String): Column = expr(
      s"transform(sequence(1, greatest(size(split(trim($c), ' ')) " +
      s"- ${n - 1}, 1)), i -> " +
      s"concat_ws(' ', slice(split(trim($c), ' '), i, $n)))")
    def sideCounts(c: String, cnt: String): DataFrame = pairs
      .select(k :+ explode(grams(c)).as("__g"): _*)
      .groupBy(k :+ col("__g"): _*)
      .agg(count(lit(1)).as(cnt))
    val overlap = sideCounts(candCol, "__cc")
      .join(sideCounts(refCol, "__rc"), keyCols :+ "__g")
      .groupBy(k: _*)
      .agg(sum(least(col("__cc"), col("__rc"))).as("overlap"))
    pairs
      .select(k ++ Seq(
        expr(s"cast(greatest(size(split(trim($candCol), ' ')) " +
          s"- ${n - 1}, 1) as bigint)").as("cand_ngrams"),
        expr(s"cast(greatest(size(split(trim($refCol), ' ')) " +
          s"- ${n - 1}, 1) as bigint)").as("ref_ngrams")): _*)
      .join(overlap, keyCols, "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .select(k ++ Seq(col("overlap"), col("cand_ngrams"),
        col("ref_ngrams"),
        expr("(1000 * overlap) div cand_ngrams").as("precision_pm"),
        expr("(1000 * overlap) div ref_ngrams").as("recall_pm"),
        expr("(2000 * overlap) div (cand_ngrams + ref_ngrams)")
          .as("f1_pm")): _*)
  }

  /** Attach all text-analysis columns to a documents DataFrame. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("token_count", tokenCount(t))
      .withColumn("bpeish_count", bpeishCount(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", docFingerprint(t))
      .withColumn("winnow_fp", winnowFingerprint(t))
  }
}
