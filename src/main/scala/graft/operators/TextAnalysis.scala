package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{array_contains, broadcast, coalesce, col, count, explode, expr, lit, log, lower, posexplode, round, size, split, sum, when, filter => afilter}

/** Text-analysis operators over the `documents` table: quality stats,
  * language ID, token counting, fingerprinting. All pure narrow
  * projections built from codegen'd builtins — the ideal 100 TB shape:
  * one pass over the corpus, column-pruned to (doc_id, text). The
  * CPU-heavy ones go through Par.spread (a no-op when the scan is
  * already parallel) so per-word hashing isn't pinned to a few scan
  * tasks on low-split sources.
  */
object TextAnalysis {

  /** Stopword markers used by the quality/language heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")
  private def inList = stopwords.map(w => s"'$w'").mkString(", ")

  /** `count_in(ws, 'the', ...)` — the native one-pass stopword counter
    * (optimization r16), bit-identical to
    * `size(filter(ws, w -> w IN (...)))` whose lambda ran interpreted
    * per token on every corpus row (registered in GraftExtensions).
    */
  private def countStops = s"count_in(ws, $inList)"

  /** The shared word tokenizer of the retrieval/LM family (BM25, LM
    * scoring, inverted index): lowercased non-word-character split,
    * empties dropped. ONE definition so a tokenization change can never
    * silently diverge between operators — each paired DuckDB oracle
    * mirrors it as `list_filter(string_split_regex(lower(text), '\W+'),
    * x -> x <> '')`.
    *
    * `array_remove(..., '')` instead of `filter(ws, w -> w <> '')`
    * (optimization r16): identical result on split output (elements are
    * never null), but array_remove is a codegen'd builtin while the
    * filter lambda runs interpreted per token on every corpus row of the
    * retrieval/LM family.
    */
  private def wordTokens: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.array_remove(
      split(lower(col("text")), "\\W+"), "")

  /** Per-document quality statistics: token counts, type/token ratio,
    * average word length, stopword ratio.
    */
  def stats(docs: DataFrame): DataFrame =
    Par.spread(docs).selectExpr("doc_id", "split(text, ' ') AS ws", "text")
      .selectExpr(
        "doc_id",
        "length(text) AS char_len",
        "size(ws) AS n_words",
        "size(array_distinct(ws)) AS n_types",
        "size(array_distinct(ws)) / size(ws) AS ttr",
        "length(replace(text, ' ', '')) / size(ws) AS avg_word_len",
        s"$countStops / size(ws) AS stopword_ratio")

  /** N-gram-heuristic language ID: score = stopword-marker hits; the
    * prediction falls back to 'und' when no markers fire. (The testdata
    * corpus is synthetic English-ish vocabulary, so the discriminating
    * power is trivial — the operator shape is what scales.)
    */
  def langId(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "lang", "split(text, ' ') AS ws")
      .selectExpr(
        "doc_id", "lang",
        s"$countStops AS s_en",
        s"""CASE WHEN $countStops > 0
           |THEN 'en' ELSE 'und' END AS pred_lang""".stripMargin)

  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    * ([a-z]+ | digit runs), plus bytes-per-token.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      "size(split(text, ' ')) AS n_ws_tokens",
      "size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS n_re_tokens",
      "length(text) / size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS bytes_per_token")

  /** Document fingerprints: an order-insensitive content fingerprint
    * (md5 of the sorted distinct vocabulary) and a prefix fingerprint.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    Par.spread(docs).selectExpr(
      "doc_id",
      "md5(array_join(array_sort(array_distinct(split(text, ' '))), ' ')) AS vocab_fp",
      "md5(substring(text, 1, 32)) AS prefix_fp")

  /** Gopher-style repetition quality rules (Rae et al. 2021 §A1.1:
    * drop documents dominated by one word or by repeated n-grams):
    * per-document most-frequent-word fraction and duplicate-2-gram
    * fraction, plus the pass/fail flag at the given thresholds.
    *
    * Scale shape: the most-frequent-word count is computed INSIDE the
    * row — sort the word array, longest equal run via one aggregate()
    * fold (O(n log n) per doc, narrow, zero shuffle) — never an
    * explode + (doc_id, word) group-by, which would shuffle every word
    * occurrence in the corpus at 100 TB.
    */
  def repetition(docs: DataFrame, maxTopWordFrac: Double = 0.2,
                 maxDup2gramFrac: Double = 0.6): DataFrame =
    Par.spread(docs).selectExpr("doc_id", "split(text, ' ') AS ws")
      .filter("size(ws) >= 2")
      .selectExpr(
        "doc_id",
        "size(ws) AS n_words",
        // native max_run == the aggregate() run-length fold it replaces
        // (optimization r16, bit parity in NativeTextParitySpec); the
        // 2-gram census is the native WordShingles kernel (n = 2)
        "max_run(array_sort(ws)) AS top_word_n",
        "size(word_shingles(ws, 2)) AS distinct_2grams")
      .selectExpr(
        "doc_id", "n_words", "top_word_n",
        "top_word_n / n_words AS top_word_frac",
        "1 - distinct_2grams / (n_words - 1) AS dup_2gram_frac",
        s"""CASE WHEN top_word_n / n_words <= $maxTopWordFrac
           | AND 1 - distinct_2grams / (n_words - 1) <= $maxDup2gramFrac
           |THEN 1 ELSE 0 END AS passes""".stripMargin)

  /** Vocabulary coverage: what fraction of each `source`'s token
    * occurrences a size-`vocabSize` global vocabulary (top tokens by
    * corpus frequency, ties broken lexically) would cover — the
    * tokenizer-budget / OOV-rate audit run before committing to a vocab.
    *
    * Scale shape: classic wordcount. The explode shuffles (token)
    * occurrences hash-partitioned on token with map-side combine; the
    * frequency frame is vocabulary-sized (not corpus-sized), so the
    * top-k sort is cheap and the chosen vocab is broadcast back into a
    * map-side membership probe — the 100 TB corpus is shuffled once
    * (for the per-source group-by), never joined wide.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 20): DataFrame = {
    val toks = docs.select(col("source"),
        explode(split(lower(col("text")), "\\W+")).as("tok"))
      .where(col("tok") =!= "")
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("n_covered"))
  }

  /** Repeated-passage scrub: REWRITES each document with corpus-level
    * boilerplate removed — the repeated-content removal step of web-scale
    * pipelines (C4 removes any three-sentence span seen before, Lee et
    * al. 2022 "Deduplicating Training Data Makes Language Models Better"
    * dedups exact substrings): a word `gramLen`-gram occurring in more
    * than `maxDocFreq` distinct documents is boilerplate, and every word
    * position covered by an occurrence of a hot gram is dropped from the
    * rewritten text (spans merge naturally — overlapping hot grams union
    * their word ranges). Documents shorter than `gramLen` words pass
    * through untouched. Returns (doc_id, clean_text, n_words, n_dropped).
    *
    * Scale shape: TWO corpus passes, both the right kind. Pass 1 is the
    * wordcount-style hot-gram census: gram hashes explode and shuffle
    * once (map-side partial on (g, doc_id) distinctness), and only grams
    * with df > maxDocFreq survive — by the boilerplate contract a small
    * fraction of the corpus. Pass 2 re-explodes (doc_id, position, gram)
    * and probes the broadcast hot table through a broadcast HASH join —
    * O(1) per gram. (The first cut collapsed the hot set to a broadcast
    * ARRAY probed with array_contains inside a higher-order lambda: a
    * LINEAR scan per gram, O(|grams| × |hot|) — measured 18+ min at 10×
    * sf0.1 where the hash-join form takes seconds, because the hot set
    * grows WITH the corpus. Arrays are not hash tables; membership at
    * scale is a join.) Survivors are rare, so the per-doc hot-position
    * aggregate shuffles almost nothing, and the final mask is a narrow
    * higher-order projection over (words, hot positions). All hashing is
    * md5 on the joined words, so the oracle re-derives identical hashes.
    */
  def scrubRepeatedPassages(docs: DataFrame, gramLen: Int = 8,
                            maxDocFreq: Int = 1): DataFrame = {
    val k = gramLen
    // Native GramMd5s (optimization r16): the census' per-doc gram-hash
    // chain (transform/md5/concat_ws lambdas, interpreted) in one
    // compiled pass; short docs yield an empty array exactly like the
    // previous CASE guard. Bit-identical (NativeTextParitySpec).
    val grams = Par.spread(docs)
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .select(col("doc_id"),
        posexplode(graft.functions.GramMd5s(col("ws"), k, distinct = false))
          .as(Seq("p0", "g")))
    val hot = grams.select("g", "doc_id").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("g")
    // Hot-gram occurrence positions per doc (1-based starts). Docs with
    // no hot gram fall out here and rejoin with an empty list below.
    val hp = grams.join(broadcast(hot), "g")
      .groupBy("doc_id")
      .agg(expr("sort_array(collect_list(p0 + 1))").as("hp"))
    Par.spread(docs)
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .join(hp, Seq("doc_id"), "left")
      .withColumn("hp",
        coalesce(col("hp"), org.apache.spark.sql.functions
          .typedlit(Array.empty[Int])))
      // A word at position j is covered iff some hot start i has
      // i <= j < i + k. Native ScrubKeptWords (optimization r16): the
      // filter/exists/transform lambda chain ran interpreted
      // O(words × hot-starts) per doc; the kernel two-pointers the
      // sorted starts in one compiled O(words + hots) pass and emits
      // the kept WORDS directly (bit-identical — NativeTextParitySpec).
      .withColumn("kept",
        graft.functions.ScrubKeptWords(col("ws"), col("hp"), k))
      .select(col("doc_id"),
        expr("concat_ws(' ', kept)").as("clean_text"),
        expr("size(ws)").as("n_words"),
        expr("size(ws) - size(kept)").as("n_dropped"))
  }

  /** Model-based quality score: a fixed-weight logistic classifier over
    * engineered per-document features — the shape of the fastText /
    * linear quality filters web-scale pipelines run after the rule-based
    * gates (GPT-3's LR-against-WebText filter, Brown et al. 2020 §A;
    * CCNet's per-document scoring, Wenzek et al. 2020). The weights here
    * are nominal stand-ins for an offline-trained model; what ships is
    * the serving shape: every feature and the sigmoid fuse into ONE
    * codegen'd narrow projection — no UDF, no shuffle, the whole model
    * application rides the corpus scan at 100 TB.
    *
    * Features: log word count, type/token ratio, stopword ratio, average
    * word length (centered at 5), most-frequent-word fraction. All are
    * exact rationals of integers, so the sigmoid's input is bit-identical
    * cross-engine (exp() itself may differ in the last ulp — far inside
    * the gate's 1e-6 float tolerance).
    *
    * Returns (doc_id, q_score, passes) with passes = q_score >= 0.5.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    Par.spread(docs).selectExpr("doc_id", "split(text, ' ') AS ws", "text")
      .filter("size(ws) >= 2")
      .selectExpr(
        "doc_id",
        "size(ws) AS nw",
        "size(array_distinct(ws)) / size(ws) AS ttr",
        s"$countStops / size(ws) AS swr",
        "length(replace(text, ' ', '')) / size(ws) AS awl",
        // native max_run == the aggregate() fold (optimization r16)
        "max_run(array_sort(ws)) / size(ws) AS twf")
      .selectExpr("doc_id",
        "-2.5 + 0.5 * ln(nw) + 2.0 * ttr + 1.5 * swr + 0.1 * (awl - 5.0) - 3.0 * twf AS z")
      .selectExpr("doc_id",
        "1.0 / (1.0 + exp(-z)) AS q_score",
        "CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5 THEN 1 ELSE 0 END AS passes")

  /** BM25 keyword retrieval: top-`k` documents for a fixed bag of query
    * `terms` (Robertson–Walker BM25 with the +1 IDF floor, k1/b at the
    * Lucene defaults) — the exact-match retrieval baseline every curation
    * pipeline runs next to ANN, and the scorer behind retrieval-based
    * decontamination and targeted corpus audits.
    *
    * Scale shape: corpus statistics (N, Σdl, per-term document
    * frequencies) reduce to ONE row in a single narrow aggregation pass —
    * no explode, no per-token shuffle, because the term set is tiny and
    * fixed so each df is an `array_contains` flag summed map-side. That
    * row broadcasts back onto the scan and the whole score is a fused
    * narrow projection (tf via `filter(ws, ...)` inside the row); the
    * only ordering work is the distributed top-k
    * (TakeOrderedAndProject), never a global sort. Two passes over the
    * corpus total, both riding the column-pruned (doc_id, text) scan.
    *
    * Determinism contract: tf/dl/df/N are integers, avgdl is an exact
    * rational, so the score differs cross-engine only in ln()'s last
    * ulp — far inside the gate's 1e-6 float tolerance — and ties at the
    * k boundary are broken by doc_id.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms would double-count: $terms")
    val base = Par.spread(docs)
      .select(col("doc_id"),
        wordTokens.as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("ws"), t), 1L).otherwise(0L))
            .as(s"df$i")
        }
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      val tf = org.apache.spark.sql.functions
        .element_at(col("tc"), i + 1).cast("double")
      val idf = log(
        ((col("n") - col(s"df$i")).cast("double") + lit(0.5)) /
          (col(s"df$i").cast("double") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    // Single-pass term scoring (optimization r16): the per-term tf was
    // `size(filter(ws, w -> w = t))` — one interpreted lambda pass over
    // every token per term per row. TermCounts computes ALL tfs in one
    // compiled pass (bit-identical counts, NativeTextParitySpec), and
    // the scored projection then needs only (doc_id, dl, tc) — the token
    // array no longer flows into the scoring cross join.
    base.select(col("doc_id"), col("dl"),
        graft.functions.TermCounts(col("ws"), terms).as("tc"))
      .crossJoin(broadcast(stats))
      .withColumn("score", perTerm.reduceLeft(_ + _))
      .select(col("doc_id"), col("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Unigram language-model scoring: train an add-one-smoothed unigram
    * LM on the corpus itself, then score every document by mean negative
    * log-likelihood — the CCNet/KenLM-style perplexity filter (Wenzek et
    * al. 2020) in its simplest honest form: high nll = out-of-
    * distribution text, the standard quality-filter signal.
    *
    * Scale shape: the LM is a wordcount (one shuffle with map-side
    * combine, vocabulary-sized result). Scoring joins the exploded
    * tokens against the LM — deliberately UNhinted: the planner
    * broadcasts the vocabulary while it is small and shuffle-joins from
    * stats/AQE when it is not (Heaps' law puts web-scale vocabularies
    * near ~1e8 types) — and the per-doc aggregation partials map-side,
    * so the second shuffle carries one row per document, not per token.
    *
    * Determinism contract: per-token log-probabilities are quantized to
    * integer nano-nats (round(ln(p)·1e9)) so the per-document SUM is
    * exact integer arithmetic — order-independent and bit-stable across
    * runs and engines; the one division back to double at the end can
    * differ cross-engine by ~1e-9, far inside the 1e-6 gate tolerance.
    * Returns (doc_id, n_tokens, nll).
    */
  def lmUnigramNll(docs: DataFrame): DataFrame = {
    // Tokenize ONCE: the token stream feeds both the model build and
    // the scoring join; without the checkpoint each consumer re-scans
    // the text column and re-runs the tokenizer regex (the CPU cost
    // here), dedup'd only if ReuseExchange fires. The checkpoint
    // payload is the compact per-doc token array.
    val base = Par.spread(docs)
      .select(col("doc_id"), wordTokens.as("ws"))
      .localCheckpoint(eager = false)
    val toks = base.select(col("doc_id"), explode(col("ws")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum("c").as("t_tokens"),
      count(lit(1)).as("v_vocab"))
    val lm = counts.crossJoin(broadcast(tot))
      .select(col("tok"),
        round(log((col("c").cast("double") + lit(1.0)) /
          (col("t_tokens").cast("double") + col("v_vocab").cast("double")))
          * lit(1e9)).cast("long").as("lp9"))
    // Unhinted like the bigram scorer: a web-scale vocabulary (Heaps'
    // law: ~1e8 types at 100 TB) can outgrow the broadcast threshold;
    // the planner broadcasts while small, shuffle-joins from stats/AQE
    // when not.
    toks.join(lm, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp9").as("slp9"))
      .select(col("doc_id"), col("n_tokens"),
        (-col("slp9").cast("double") / lit(1e9) /
          col("n_tokens").cast("double")).as("nll"))
  }

  /** Document chunking into fixed-size overlapping token windows — the
    * embedding/RAG prep step (window = embedding-model context, stride <
    * window for overlap so no span falls on a boundary). Start positions
    * are 1, 1+stride, …, with one extra tail window whenever stride does
    * not land exactly, so every token is covered; documents shorter than
    * one window yield exactly one (possibly short) chunk.
    *
    * Scale shape: a pure narrow projection — windows are built in-row
    * with `transform`/`slice` and exploded; output size is bounded by
    * ~n_words/stride per document, no shuffle anywhere. Returns
    * (doc_id, n_words, start, chunk_words, chunk).
    */
  def chunkWindows(docs: DataFrame, windowTokens: Int = 32,
                   stride: Int = 24): DataFrame = {
    require(windowTokens > 0 && stride > 0, "window and stride must be > 0")
    // stride > window would leave stride-window tokens uncovered between
    // consecutive windows — the full-coverage contract above would be a lie.
    require(stride <= windowTokens,
      s"stride ($stride) must be <= windowTokens ($windowTokens) for full coverage")
    Par.spread(docs)
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id", "size(ws) AS n_words",
        s"""transform(
           |  sequence(0, greatest(0, CAST(ceil(
           |    (size(ws) - $windowTokens) / CAST($stride AS DOUBLE))
           |    AS INT))),
           |  i -> struct(i * $stride + 1 AS start,
           |    concat_ws(' ', slice(ws, i * $stride + 1, $windowTokens))
           |      AS chunk)) AS cw""".stripMargin)
      .select(col("doc_id"), col("n_words"), explode(col("cw")).as("c"))
      .select(col("doc_id"), col("n_words"),
        col("c.start").cast("long").as("start"),
        expr(s"CAST(least($windowTokens, n_words - c.start + 1) AS BIGINT)")
          .as("chunk_words"),
        col("c.chunk").as("chunk"))
  }

  /** Bigram language-model scoring: train a conditional add-one-smoothed
    * bigram LM on the corpus (p(w₂|w₁) = (c(w₁w₂)+1)/(h(w₁)+V), h = the
    * history count Σ_w c(w₁w), V = vocabulary size), score every ≥2-token
    * document by mean negative log-likelihood over its bigrams — the
    * order-sensitive upgrade of [[lmUnigramNll]]: reshuffled boilerplate
    * that fools a unigram filter scores high here.
    *
    * Scale shape: two censuses (bigram + history, each one shuffle with
    * map-side combine, results bigram-vocabulary-sized), the LM joined
    * small-to-small, then the same broadcast-join + map-side-partial
    * per-doc aggregation as the unigram scorer; the same nano-nat
    * quantization keeps per-doc sums exact integer arithmetic.
    */
  def lmBigramNll(docs: DataFrame): DataFrame = {
    // Tokenize ONCE (same rationale as lmUnigramNll): base feeds the
    // bigram stream twice (model build + scoring) and the vocabulary
    // count — 4 text scans and 4 tokenizer passes without the
    // checkpoint; the in-row bigram transform recomputed from the
    // token arrays is cheap by comparison.
    val base = Par.spread(docs)
      .select(col("doc_id"),
        wordTokens.as("ws"))
      .localCheckpoint(eager = false)
    val bigrams = base.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> struct(element_at(ws, i) AS w1,
          |              element_at(ws, i + 1) AS w2))""".stripMargin))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val hist = bc.groupBy("w1").agg(sum("cb").as("ch"))
    val v = base.select(explode(col("ws")).as("w"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("w"))
        .as("v_vocab"))
    val lm = bc.join(hist, "w1").crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        round(log((col("cb").cast("double") + lit(1.0)) /
          (col("ch").cast("double") + col("v_vocab").cast("double")))
          * lit(1e9)).cast("long").as("lp9"))
    // No broadcast hint here, deliberately: a BIGRAM vocabulary grows
    // with corpus diversity (1e8+ rows on web-scale text) and can
    // genuinely outgrow the broadcast threshold, unlike the unigram LM.
    // Left unhinted, Catalyst broadcasts it while small and falls back
    // to a shuffle join from stats/AQE when it is not.
    bigrams.join(lm, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp9").as("slp9"))
      .select(col("doc_id"), col("n_bigrams"),
        (-col("slp9").cast("double") / lit(1e9) /
          col("n_bigrams").cast("double")).as("nll"))
  }

  /** Inverted-index build: token → (document frequency, collection
    * frequency, bounded posting list of the `maxPostings` smallest
    * doc_ids) for tokens with df ≥ `minDf` — the index-construction
    * half of the retrieval stack whose query half is [[bm25TopK]].
    *
    * Scale shape: wordcount twice (cf on occurrences, df on distinct
    * (tok, doc) pairs — both one shuffle with map-side partials), and
    * the posting list is the native BoundedTopK aggregate (score =
    * −doc_id, so ascending doc_ids): a k-bounded heap per partition
    * whose shuffle carries k ids per token, NEVER a collect_list of a
    * hot token's full posting set — the unbounded-collect trap is what
    * kills index builds on stopword-frequency tokens at 100 TB. Real
    * index builds shard postings beyond the cap; the cap here is the
    * honest bounded kernel of that. Postings serialize to a
    * comma-joined string (the gate cannot hash array cells).
    */
  def invertedIndex(docs: DataFrame, minDf: Long = 2,
                    maxPostings: Int = 20): DataFrame = {
    val base = Par.spread(docs)
      .select(col("doc_id"),
        wordTokens.as("ws"))
    val cf = base.select(explode(col("ws")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cf"))
    // Distinct (tok, doc) pairs come from array_distinct INSIDE the row —
    // a narrow projection — never from a corpus-wide .distinct(), whose
    // extra occurrence-level shuffle tripled this operator's 100× time
    // before this form (78 s → the distinct-free shape; see BASELINE.md).
    val posts = base
      .select(col("doc_id"), explode(expr("array_distinct(ws)")).as("tok"))
      // The top-k score is −doc_id as DOUBLE; ids beyond 2^53 would
      // silently collide/misorder in the double, diverging the posting
      // list from its doc_id-ascending contract (hash-derived 64-bit ids
      // are a realistic source). Guarded in-row — one codegen'd branch,
      // fails loudly instead of slowly (r10, ADVICE finding).
      .withColumn("__score", expr(
        """IF(abs(doc_id) <= 9007199254740992,
          |   -CAST(doc_id AS DOUBLE),
          |   CAST(raise_error(
          |     'invertedIndex: |doc_id| exceeds 2^53; the double-keyed ' ||
          |     'posting order would lose precision') AS DOUBLE))""".stripMargin))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        graft.functions.topk(col("__score"), col("doc_id"), maxPostings)
          .as("tk"))
      .where(col("df") >= minDf)
      .select(col("tok"), col("df"),
        expr("array_join(transform(tk, s -> CAST(s.nn_id AS STRING)), ',')")
          .as("postings"))
    // both sides are vocabulary-sized; the equi-join is trivial at any SF
    posts.join(cf, "tok").select("tok", "df", "cf", "postings")
  }

  /** PII redaction: mask long digit runs (phone/account-number shaped)
    * and email-shaped tokens, reporting per-row hit counts alongside the
    * redacted text. Pure narrow projection (the 100 TB shape: one
    * codegen'd regexp pass, no shuffle). Patterns stay in the common
    * RE2/Java subset so any engine applies the same masks.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    require(df.columns.contains(textCol), s"missing column $textCol")
    val digits = "[0-9]{4,}"
    val emails = "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+"
    df.withColumn("n_digit_runs",
        size(expr(s"regexp_extract_all($textCol, '$digits', 0)")))
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all($textCol, '$emails', 0)")))
      .withColumn("redacted",
        expr(s"regexp_replace(regexp_replace($textCol, '$emails', '<EMAIL>'), '$digits', '<NUM>')"))
  }
}
