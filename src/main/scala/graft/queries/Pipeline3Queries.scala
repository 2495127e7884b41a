package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.catalog.Tables
import graft.operators.Bloom

/** Round-10 pipeline wave: Bloom-filter pre-filtered hygiene sweeps
  * (the no-broadcast-contract variants of decontamination and ingest
  * dedup) and corpus census queries (hot n-grams exact + sampled
  * two-pass, per-language profile). Results are exact on every query, so
  * each is fully hash-verified against DuckDB.
  */
object Pipeline3Queries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ------------------------------------------------------------- bloom

  /** Same fixture and same answer as `pipeline_decontaminate` — the
    * holdout gram set reaches the probe as a ~1 MB Bloom bitset instead
    * of a broadcast hash map, and the exact confirm join removes the
    * false positives, so the oracle is literally the same SQL.
    */
  val decontaminateBloom: QueryDef = QueryDef("pipeline_decontaminate_bloom",
    (s, dir) => {
      val d = docs(s, dir)
      Bloom.contaminationBloom(
        d.filter("doc_id % 5 != 0"), d.filter("doc_id % 5 = 0"))
    },
    PipelineQueries.decontaminate.oracle)

  /** Exact-duplicate ingest gate: incoming = doc_id % 3 = 0, existing =
    * doc_id % 2 = 0, so ids divisible by 6 are already in the corpus
    * (same text ⇒ same md5) and must be dropped; the rest pass. Both
    * Bloom paths are exercised: most new docs short-circuit on a Bloom
    * negative, the true dupes (and any false positives) go through the
    * confirm anti-join.
    */
  val bloomIngest: QueryDef = QueryDef("dedup_bloom_ingest",
    (s, dir) => {
      val d = docs(s, dir)
      Bloom.ingestDedupBloom(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 3 = 0"))
    },
    Some("""WITH ex AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
           |inc AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0)
           |SELECT doc_id, h FROM inc
           |WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.h = inc.h)""".stripMargin))

  /** Streaming twin of [[bloomIngest]] (see
    * [[graft.streaming.Streams.ingestBloomAvailableNow]]): the corpus
    * fingerprint bitset is built ONCE in batch and rides into the
    * unbounded query as a binary literal; each micro-batch probes it
    * map-side, and only probable rows reach the stream-static confirm
    * anti-join. Same kept set as the batch gate, verified by the same
    * oracle reduced to a compact aggregate.
    */
  val streamIngestBloom: QueryDef = QueryDef("stream_ingest_bloom",
    (s, dir) => graft.streaming.Streams.ingestBloomAvailableNow(s, dir),
    Some("""WITH ex AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
           |inc AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0),
           |kept AS (SELECT doc_id FROM inc
           |         WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.h = inc.h))
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
           |FROM kept""".stripMargin))

  // ------------------------------------------------------- gram census

  /** Corpus with planted boilerplate: half the docs get a navigation
    * blurb prepended, a third get a legal footer appended — the testdata
    * documents' own trigram distribution is flat (no doc-frequency
    * outliers), and a heavy-hitter census is only meaningful when heavy
    * hitters exist. `concat_ws` skips the NULL branches identically in
    * Spark and DuckDB, so one SQL string serves both engines.
    */
  private val bpA = "subscribe to our newsletter for the latest updates " +
    "and follow us on social media channels every day for more breaking news"
  private val bpB = "all rights reserved copyright notice terms of " +
    "service privacy policy applies to this page and all linked content herein"
  private val plantSql =
    s"""concat_ws(' ',
       |  CASE WHEN doc_id % 2 = 0 THEN '$bpA' END,
       |  text,
       |  CASE WHEN doc_id % 3 = 0 THEN '$bpB' END)""".stripMargin

  private[graft] def planted(d: DataFrame): DataFrame =
    d.select(col("doc_id"), expr(plantSql).as("text"))

  /** Distinct word trigrams per doc, Spark side. */
  private[graft] def grams3(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(0, size(ws) - 3),
          |  i -> concat_ws(' ', slice(ws, i + 1, 3))))""".stripMargin)).as("g"))

  /** Distinct word trigrams per doc over [[planted]] docs, DuckDB side
    * (mirrors [[grams3]]; `where` narrows the doc set, e.g. the sample).
    */
  private def grams3Sql(where: String = "TRUE") =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(string_split(text, ' ')) - 2),
       |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS g
       |  FROM (SELECT doc_id, $plantSql AS text FROM documents WHERE $where)
       |  WHERE len(string_split(text, ' ')) >= 3""".stripMargin

  /** Hottest trigrams by document frequency — the boilerplate census a
    * C4-style cleaner starts from. Grams are per-doc distinct, so
    * COUNT(*) is document frequency; the global top-k is a
    * TakeOrderedAndProject over the gram census (partial top-k per
    * partition, k rows per partition shuffled — never a global sort),
    * and the census itself partial-aggregates map-side.
    */
  val hotNgrams: QueryDef = QueryDef("text_hot_ngrams",
    (s, dir) => grams3(planted(docs(s, dir)))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("g")).limit(20),
    Some(s"""WITH g AS (${grams3Sql()})
            |SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM g
            |GROUP BY g ORDER BY df DESC, g LIMIT 20""".stripMargin))

  /** Two-pass sampled heavy hitters: pass 1 runs the census on a
    * deterministic 1-in-7 doc sample and keeps the top 100 candidate
    * grams; pass 2 exact-counts ONLY the candidates over the full corpus
    * (candidates are top-100 by construction — a bounded frame — so the
    * probe join is a pinned broadcast) and re-ranks. At 100 TB pass 1's
    * shuffle carries the sample's gram census and pass 2's carries
    * |candidates| × partials, vs the full gram census for the exact
    * query — the standard sample-then-rescore heavy-hitter sweep. On a
    * corpus where every top-20 gram has sample support (HotNgramsSpec
    * pins this for the fixture) the answer equals `text_hot_ngrams`.
    */
  val hotNgramsSampled: QueryDef = QueryDef("text_hot_ngrams_sampled",
    (s, dir) => {
      val d = planted(docs(s, dir))
      val cand = grams3(d.filter("doc_id % 7 = 0"))
        .groupBy("g").agg(count(lit(1)).as("sdf"))
        .orderBy(col("sdf").desc, col("g")).limit(100)
        .select("g")
      grams3(d).join(broadcast(cand), "g")
        .groupBy("g").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("g")).limit(20)
    },
    Some(s"""WITH g AS (${grams3Sql()}),
            |sg AS (${grams3Sql("doc_id % 7 = 0")}),
            |cand AS (SELECT g FROM sg GROUP BY g
            |         ORDER BY COUNT(*) DESC, g LIMIT 100)
            |SELECT g.g, CAST(COUNT(*) AS BIGINT) AS df
            |FROM g JOIN cand ON g.g = cand.g
            |GROUP BY g.g ORDER BY df DESC, g.g LIMIT 20""".stripMargin))

  /** Trigram-index substring search (`graft.operators.Search`): exact
    * `contains` semantics answered by probing the needle's posting
    * lists + one candidate-sized confirm, instead of the full LIKE
    * scan the oracle runs. "merge batch" hits a few dozen docs at
    * sf0.01 — non-vacuous at every gated scale.
    */
  val substringSearch: QueryDef = QueryDef("text_substring_search",
    (s, dir) => graft.operators.Search.substringSearch(
      docs(s, dir).select("doc_id", "text"), "merge batch"),
    Some("""SELECT doc_id FROM documents
           |WHERE contains(text, 'merge batch')""".stripMargin))

  /** Typo-tolerant search ([[graft.operators.Search.fuzzySearch]]): the
    * needle is "merge batch" with a planted typo ("batxh"); containment
    * τ = 0.7 of its 9 trigrams (≥ 7 shared) recovers the docs a literal
    * LIKE can no longer see. The oracle recomputes per-doc trigram
    * intersections from scratch; gram list and threshold are generated
    * from the same Scala values so the two sides cannot drift.
    */
  private val fuzzyNeedle = "merge batxh"
  private val fuzzyGrams = fuzzyNeedle.sliding(3).toSeq.distinct
  private val fuzzyNeed = math.ceil(0.7 * fuzzyGrams.size).toLong

  val fuzzySearchQ: QueryDef = QueryDef("text_fuzzy_search",
    (s, dir) => graft.operators.Search.fuzzySearch(
      docs(s, dir).select("doc_id", "text"), fuzzyNeedle, 0.7),
    Some {
      val lst = fuzzyGrams.map(g => s"'$g'").mkString("[", ", ", "]")
      s"""WITH dg AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, len(text) - 2), i -> text[i:i+2])) AS gs
         |  FROM documents WHERE len(text) >= 3)
         |SELECT doc_id,
         |  CAST(len(list_intersect(gs, $lst)) AS BIGINT) AS shared
         |FROM dg
         |WHERE len(list_intersect(gs, $lst)) >= $fuzzyNeed""".stripMargin
    })

  // ------------------------------------------------------------ census

  /** Per-language corpus profile with an EXACT median: the grouped
    * aggregates are one hash aggregate; the median is the classic
    * row_number/count middle-pick (integer arithmetic, no interpolation
    * ambiguity across engines), one shuffle on lang via the window, then
    * the two frames join on the (tiny) lang key.
    */
  val corpusProfile: QueryDef = QueryDef("stats_corpus_profile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val aggs = d.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        sum("n_chars").as("sum_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      val cw = Window.partitionBy("lang")
      val med = d.select(col("lang"), col("n_chars"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(cw).as("cnt"))
        .filter(col("rn") === expr("(cnt + 1) div 2") ||
          col("rn") === expr("(cnt + 2) div 2"))
        .groupBy("lang").agg(avg("n_chars").as("median_chars"))
      aggs.join(med, "lang")
    },
    Some("""WITH r AS (SELECT lang, doc_id, n_chars,
           |  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
           |  COUNT(*) OVER (PARTITION BY lang) AS cnt FROM documents),
           |med AS (SELECT lang, AVG(n_chars) AS median_chars FROM r
           |        WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
           |        GROUP BY lang)
           |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           |  ANY_VALUE(med.median_chars) AS median_chars
           |FROM documents d JOIN med ON d.lang = med.lang
           |GROUP BY d.lang""".stripMargin))

  /** Sketch twin of [[corpusProfile]] — HLL distinct (approx_count_
    * distinct) and a KLL/GK-style quantile (percentile_approx): the
    * bounded-memory single-pass answers a 100 TB profile job would
    * actually run. Estimates are engine-specific, so no DuckDB oracle
    * can exist; SketchSpec pins each estimate against the exact twin
    * within the sketches' documented error bounds.
    */
  val profileSketch: QueryDef = QueryDef("stats_profile_sketch",
    (s, dir) => docs(s, dir).groupBy("lang").agg(
      approx_count_distinct("source").as("n_sources_hll"),
      percentile_approx(col("n_chars"), lit(0.5), lit(10000))
        .as("median_chars_approx")),
    None)

  /** Single-pass certified heavy hitters over the planted-boilerplate
    * trigram stream (`graft.functions.heavyHitters`, mergeable
    * Misra-Gries): ≤ 256 items, each with a HARD count interval
    * [c_lo, c_hi], containing every gram whose instance count exceeds
    * n/(k+1) (n = TOTAL gram instances — k must be sized so that
    * threshold sits below the boilerplate df of interest; 256 puts it
    * at ~215 on this fixture vs the planted df 250). One corpus read,
    * shuffle = partitions × k counters — the bounded-memory member of
    * the census family (exact census shuffles all grams; the sampled
    * twin reads twice). Final counters depend on merge order, so no
    * cross-engine oracle exists; HeavyHitterSpec certifies the bounds
    * against the exact census.
    */
  val heavyHittersQ: QueryDef = QueryDef("text_heavy_hitters",
    // batched gram extraction (r11): one row per DOC into the aggregate,
    // grams slid zero-copy inside update() — same stream as
    // grams3+explode (HeavyHitterSpec proves single-partition equality),
    // ~2× less CPU at the 100× decade (BASELINE.md r11).
    (s, dir) => planted(docs(s, dir))
      .agg(graft.functions.heavyHittersWordGrams(col("text"), 256).as("hh"))
      .select(explode(col("hh")).as("r"))
      .select(col("r.item").as("g"), col("r.c_lo"), col("r.c_hi")),
    None)

  def defs: Seq[QueryDef] = Seq(
    decontaminateBloom, bloomIngest, streamIngestBloom, substringSearch,
    fuzzySearchQ, hotNgrams, hotNgramsSampled, corpusProfile)
}
