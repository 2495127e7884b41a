package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryDef
import graft.catalog.Tables
import graft.operators.{Dedup, Drift, Maintenance, TextAnalysis}
import Sql.dsum

/** Eighth coverage wave: retrieval and corpus-measurement operators —
  * BM25 keyword search, unigram-LM perplexity scoring (the CCNet-style
  * quality filter), and bottom-k-sketch corpus-overlap estimation. The
  * Spark side is the 100 TB plan (one-row stats broadcast, wordcount
  * shuffles with map-side combine, distributed top-k); the oracle
  * re-derives every score in portable DuckDB SQL, sharing the exact
  * floating-point constants via Scala's round-tripping Double.toString
  * so both engines evaluate bit-identical rationals.
  */
object Extra5Queries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Query terms for the BM25 headliner — mid-frequency members of the
    * synthetic corpus vocabulary, so tf/df are non-trivial.
    */
  val bm25Terms: Seq[String] = Seq("hash", "join", "stream", "window")
  private val bm25K1 = 1.2
  private val bm25B = 0.75
  private val bm25TopN = 20

  /** The BM25 oracle rebuilt term-by-term in the SAME order as
    * [[TextAnalysis.bm25TopK]]'s reduceLeft, with constants printed via
    * Double.toString (shortest round-tripping form) so DuckDB parses the
    * identical doubles Scala computed.
    */
  private def bm25Oracle: String = {
    val k1p1 = (bm25K1 + 1.0).toString
    val oneMinusB = (1.0 - bm25B).toString
    val dfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END) AS df$i"
    }.mkString(",\n    ")
    val score = bm25Terms.zipWithIndex.map { case (t, i) =>
      val tf = s"CAST(len(list_filter(ws, x -> x = '$t')) AS DOUBLE)"
      s"""(ln((CAST(n - df$i AS DOUBLE) + 0.5) /
         |      (CAST(df$i AS DOUBLE) + 0.5) + 1.0)
         |   * ($tf * $k1p1)
         |   / ($tf + $bm25K1 * ($oneMinusB + $bm25B * CAST(dl AS DOUBLE)
         |        / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))""".stripMargin
    }.mkString("\n + ")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\W+'),
       |      x -> x <> '') AS ws
       |  FROM documents),
       |d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM base),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dl) AS BIGINT) AS sumdl,
       |    $dfCols
       |  FROM d)
       |SELECT doc_id, dl,
       |$score AS score
       |FROM d, stats
       |ORDER BY score DESC, doc_id LIMIT $bm25TopN""".stripMargin
  }

  /** BM25 top-20 ([[TextAnalysis.bm25TopK]]): exact-match retrieval
    * baseline. Oracle replays the full scorer (corpus stats, IDF, length
    * normalization) in DuckDB list SQL.
    */
  val bm25TopK: QueryDef = QueryDef("text_bm25_topk",
    (s, dir) => TextAnalysis.bm25TopK(docs(s, dir), bm25Terms, bm25TopN,
      bm25K1, bm25B),
    bench = true,
    oracle = Some(bm25Oracle))

  /** Unigram-LM mean negative log-likelihood per document
    * ([[TextAnalysis.lmUnigramNll]]): the perplexity quality filter. The
    * oracle retrains the same add-one-smoothed LM and re-quantizes
    * per-token log-probs to integer nano-nats, so the per-doc sums are
    * exact on both engines.
    */
  val lmScore: QueryDef = QueryDef("text_lm_nll",
    (s, dir) => TextAnalysis.lmUnigramNll(docs(s, dir)),
    bench = true,
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tokens,
        |               CAST(COUNT(*) AS BIGINT) AS v_vocab FROM counts),
        |lm AS (
        |  SELECT tok,
        |    CAST(round(ln((CAST(c AS DOUBLE) + 1.0) /
        |      (CAST(t_tokens AS DOUBLE) + CAST(v_vocab AS DOUBLE)))
        |      * 1.0E9) AS BIGINT) AS lp9
        |  FROM counts, tot)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  -CAST(SUM(lp9) AS DOUBLE) / 1.0E9
        |    / CAST(COUNT(*) AS DOUBLE) AS nll
        |FROM toks t JOIN lm ON t.tok = lm.tok
        |GROUP BY t.doc_id""".stripMargin))

  /** Bottom-k corpus-overlap estimate between the even/odd doc_id halves
    * ([[Dedup.corpusOverlapSketch]]), exact Jaccard alongside as the
    * audit. The oracle replays the identical md5 bottom-k sketch.
    */
  val overlapSketch: QueryDef = QueryDef("dedup_overlap_sketch",
    (s, dir) => Dedup.corpusOverlapSketch(docs(s, dir), 128, 3),
    oracle = Some(
      """WITH g0 AS (
        |  SELECT doc_id % 2 AS side, string_split(text, ' ') AS ws
        |  FROM documents),
        |g1 AS (SELECT side, ws FROM g0 WHERE len(ws) >= 3),
        |grams AS (
        |  SELECT side,
        |    md5(array_to_string(list_slice(ws, i, i + 2), ' ')) AS h
        |  FROM g1, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
        |bygram AS (
        |  SELECT h, MAX(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_a,
        |         MAX(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_b
        |  FROM grams GROUP BY h),
        |bottom AS (SELECT * FROM bygram ORDER BY h LIMIT 128),
        |est AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_actual,
        |               CAST(SUM(in_a * in_b) AS BIGINT) AS k_both
        |        FROM bottom),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
        |              CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter
        |       FROM bygram)
        |SELECT k_actual, k_both,
        |  CAST(k_both AS DOUBLE) / CAST(k_actual AS DOUBLE) AS est_jaccard,
        |  n_union, n_inter,
        |  CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS exact_jaccard
        |FROM est, ex""".stripMargin))

  /** The 2-D probe both engines answer; Spark answers it over the
    * z-ordered rewrite, the oracle over the original table — layout
    * invariance is the contract (and OperatorSpec measures the
    * row-group pruning the layout buys).
    */
  private val zorderBox =
    "user_id BETWEEN 0 AND 10 AND value BETWEEN 50.0 AND 100.0"
  private def zorderProbe(table: String) =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_box,
       |  ${dsum("value")} AS box_value,
       |  CAST(SUM(user_id) AS BIGINT) AS sum_uid
       |FROM $table WHERE $zorderBox""".stripMargin

  /** Z-order layout rewrite + pruned 2-D probe
    * ([[Maintenance.zorderWrite]]): the OPTIMIZE ZORDER maintenance op
    * on vanilla parquet.
    */
  val zorder: QueryDef = QueryDef("maintenance_zorder",
    (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_zorder").toString
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "value")
      Maintenance.zorderWrite(ev, "user_id", "value", out, 16)
      s.read.parquet(out).createOrReplaceTempView("events_zorder")
      s.sql(zorderProbe("events_zorder"))
    },
    oracle = Some(zorderProbe("events")))

  /** Exact two-sample KS drift between the even/odd doc_id halves on
    * document length ([[Drift.ksDrift]]): the distribution-monitoring op
    * run on every new dump. Oracle re-derives the cumulative-fraction
    * supremum with DuckDB's window machinery.
    */
  val ksDrift: QueryDef = QueryDef("stats_ks_drift",
    (s, dir) => Drift.ksDrift(docs(s, dir), "n_chars", "doc_id % 2 = 0"),
    oracle = Some(
      """WITH pts AS (
        |  SELECT n_chars AS v,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ia
        |  FROM documents),
        |perv AS (
        |  SELECT v, SUM(ia) AS ca, SUM(1 - ia) AS cb FROM pts GROUP BY v),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |               CAST(SUM(cb) AS BIGINT) AS n_b FROM perv),
        |cum AS (
        |  SELECT v,
        |    SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cca,
        |    SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ccb
        |  FROM perv)
        |SELECT n_a, n_b, v AS ks_at,
        |  abs(CAST(cca AS DOUBLE) / CAST(nullif(n_a, 0) AS DOUBLE)
        |    - CAST(ccb AS DOUBLE) / CAST(nullif(n_b, 0) AS DOUBLE)) AS ks_stat
        |FROM cum, tot
        |ORDER BY ks_stat DESC, v LIMIT 1""".stripMargin))
        // nullif mirrors the Spark side's empty-side guard (Drift.scala) so
        // the paired queries agree on degenerate one-sided inputs too
        // (r10, ADVICE finding).

  /** Population Stability Index over the same split ([[Drift.psiDrift]]):
    * the binned-proportion drift score (PSI < 0.1 stable, > 0.25 action)
    * complementing KS's supremum form. Laplace add-one smoothing keeps
    * one-sided bins defined; both engines compute the identical
    * rationals-then-ln formula over the same integer bin counts.
    */
  val psiDrift: QueryDef = QueryDef("stats_psi_drift",
    (s, dir) => Drift.psiDrift(docs(s, dir), "n_chars", "doc_id % 2 = 0"),
    oracle = Some(
      """WITH pts AS (
        |  SELECT n_chars // 100 AS b,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ia
        |  FROM documents),
        |perb AS (
        |  SELECT b, SUM(ia) AS ca, SUM(1 - ia) AS cb FROM pts GROUP BY b),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta,
        |               CAST(SUM(cb) AS BIGINT) AS tb,
        |               CAST(COUNT(*) AS BIGINT) AS nb FROM perb)
        |SELECT ta AS n_a, tb AS n_b, nb AS n_bins,
        |  SUM(CAST(round((((ca + 1.0) / (ta + nb) - (cb + 1.0) / (tb + nb))
        |    * ln(((ca + 1.0) / (ta + nb)) / ((cb + 1.0) / (tb + nb))))
        |    * 1e9) AS BIGINT)) / 1e9 AS psi
        |FROM perb, tot GROUP BY ta, tb, nb""".stripMargin))

  /** Streaming windowed PSI
    * ([[graft.streaming.Streams.psiDriftWindowedAvailableNow]]):
    * per-6h-window drift of the event-value distribution vs the static
    * 'view' reference, streamed to completion. Oracle recomputes the
    * identical union-of-bins Laplace PSI per time bucket.
    */
  val psiDriftStream: QueryDef = QueryDef("stream_psi_drift",
    (s, dir) => graft.streaming.Streams.psiDriftWindowedAvailableNow(s, dir),
    oracle = Some(
      """WITH ref AS (
        |  SELECT CAST(floor(value / 10) AS BIGINT) AS b, COUNT(*) AS rc
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |win AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) AS w,
        |    CAST(floor(value / 10) AS BIGINT) AS b, COUNT(*) AS wc
        |  FROM events GROUP BY 1, 2),
        |univ AS (
        |  SELECT w, b FROM (SELECT DISTINCT w FROM win) CROSS JOIN
        |    (SELECT b FROM ref)
        |  UNION SELECT w, b FROM win),
        |j AS (
        |  SELECT u.w, u.b, coalesce(win.wc, 0) AS wc,
        |    coalesce(ref.rc, 0) AS rc
        |  FROM univ u
        |  LEFT JOIN win ON u.w = win.w AND u.b = win.b
        |  LEFT JOIN ref ON u.b = ref.b),
        |tot AS (SELECT w, SUM(wc) AS tw, COUNT(*) AS nb FROM j GROUP BY w),
        |tr AS (SELECT SUM(rc) AS tr FROM ref)
        |SELECT j.w AS w_start,
        |  SUM(CAST(round((((wc + 1.0) / (tw + nb) - (rc + 1.0) / (tr.tr + nb))
        |    * ln(((wc + 1.0) / (tw + nb)) / ((rc + 1.0) / (tr.tr + nb))))
        |    * 1e9) AS BIGINT)) / 1e9 AS psi
        |FROM j JOIN tot ON j.w = tot.w CROSS JOIN tr
        |GROUP BY 1""".stripMargin))

  /** Inverted-index build ([[TextAnalysis.invertedIndex]]): df/cf plus
    * the bounded posting list per token. Oracle re-derives postings with
    * DuckDB's ordered list aggregation over the same distinct pairs.
    */
  val invertedIndex: QueryDef = QueryDef("text_inverted_index",
    (s, dir) => TextAnalysis.invertedIndex(docs(s, dir), 2, 20),
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf
        |       FROM toks GROUP BY tok),
        |dist AS (SELECT DISTINCT tok, doc_id FROM toks),
        |posts AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
        |    array_to_string(
        |      list_slice(list(doc_id ORDER BY doc_id), 1, 20), ',')
        |      AS postings
        |  FROM dist GROUP BY tok HAVING COUNT(*) >= 2)
        |SELECT p.tok, p.df, c.cf, p.postings
        |FROM posts p JOIN cf c ON p.tok = c.tok""".stripMargin))

  /** Bigram-LM mean nll ([[TextAnalysis.lmBigramNll]]): the
    * order-sensitive perplexity filter. Oracle retrains the identical
    * conditional LM and replays the nano-nat quantization.
    */
  val lmBigram: QueryDef = QueryDef("text_lm_bigram_nll",
    (s, dir) => TextAnalysis.lmBigramNll(docs(s, dir)),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\W+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |b2 AS (SELECT doc_id, ws FROM base WHERE len(ws) >= 2),
        |bigrams AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM b2, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
        |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bigrams GROUP BY w1, w2),
        |hist AS (SELECT w1, SUM(cb) AS ch FROM bc GROUP BY w1),
        |toks AS (SELECT unnest(ws) AS w FROM base),
        |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v_vocab
        |      FROM toks),
        |lm AS (
        |  SELECT bc.w1, bc.w2,
        |    CAST(round(ln((CAST(cb AS DOUBLE) + 1.0) /
        |      (CAST(ch AS DOUBLE) + CAST(v_vocab AS DOUBLE)))
        |      * 1.0E9) AS BIGINT) AS lp9
        |  FROM bc JOIN hist ON bc.w1 = hist.w1, v)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  -CAST(SUM(lp9) AS DOUBLE) / 1.0E9
        |    / CAST(COUNT(*) AS DOUBLE) AS nll
        |FROM bigrams g JOIN lm ON g.w1 = lm.w1 AND g.w2 = lm.w2
        |GROUP BY g.doc_id""".stripMargin))

  /** RAG-prep chunking ([[TextAnalysis.chunkWindows]]): overlapping
    * 32-token windows at stride 24. Oracle rebuilds the identical
    * window grid with DuckDB list slicing.
    */
  val chunkWindows: QueryDef = QueryDef("text_chunk_windows",
    (s, dir) => TextAnalysis.chunkWindows(docs(s, dir), 32, 24),
    oracle = Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words,
        |    unnest(generate_series(0, greatest(0, CAST(ceil(
        |      (len(ws) - 32) / CAST(24 AS DOUBLE)) AS INT)))) AS i
        |  FROM w)
        |SELECT doc_id, n_words,
        |  CAST(i * 24 + 1 AS BIGINT) AS start,
        |  CAST(least(32, n_words - (i * 24 + 1) + 1) AS BIGINT)
        |    AS chunk_words,
        |  array_to_string(list_slice(ws, i * 24 + 1, i * 24 + 32), ' ')
        |    AS chunk
        |FROM g""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(bm25TopK, lmScore, overlapSketch, zorder, ksDrift, psiDrift,
      psiDriftStream, invertedIndex, lmBigram, chunkWindows)
}
