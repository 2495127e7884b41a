package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryDef
import graft.catalog.Tables
import graft.operators.{Dedup, Graph, Temporal, TextAnalysis}

/** Seventh coverage wave: relational graph analytics (co-occurrence
  * triangles, hub report), time-series gap-fill/resample, blocked
  * edit-distance dedup, and vocabulary-coverage auditing. Every oracle
  * re-derives the semantics in portable DuckDB SQL — the Spark side is
  * the plan that survives 100 TB (degree-oriented wedge join, banded
  * blocking, broadcast vocab), the oracle side is the naive quadratic
  * form DuckDB can afford at sf0.01.
  */
object Extra4Queries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def coEdges(s: SparkSession, dir: String): DataFrame =
    Graph.coOccurrenceEdges(
      Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey")

  private val edgesCte =
    """WITH e0 AS (
      |  SELECT DISTINCT l_orderkey AS g, l_partkey AS a FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT x.a AS a, y.a AS b
      |  FROM e0 x JOIN e0 y ON x.g = y.g WHERE x.a < y.a)""".stripMargin

  /** Exact triangle count on the parts-bought-together graph. The Spark
    * side is the degree-oriented compact-forward plan ([[Graph
    * .triangleCount]]: wedge cost sum-of-out-degree², hub-proof); the
    * oracle is the textbook three-way self-join DuckDB can afford at
    * sf0.01 — two independent algorithms agreeing on the count.
    */
  val graphTriangles: QueryDef = QueryDef("graph_triangles",
    (s, dir) => Graph.triangleCount(coEdges(s, dir)),
    bench = true,
    oracle = Some(
      s"""$edgesCte
         |SELECT CAST(COUNT(*) AS BIGINT) AS triangles FROM edges e1
         |JOIN edges e2 ON e1.b = e2.a
         |JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin))

  /** Hub report: top-10 parts by co-occurrence degree (deg desc, node —
    * a total order since node ids are unique).
    */
  val graphDegreeTopK: QueryDef = QueryDef("graph_degree_topk",
    (s, dir) => Graph.degreeTopK(coEdges(s, dir), 10),
    oracle = Some(
      s"""$edgesCte,
         |nodes AS (SELECT a AS node FROM edges
         |          UNION ALL SELECT b FROM edges)
         |SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM nodes
         |GROUP BY node ORDER BY deg DESC, node LIMIT 10""".stripMargin))

  /** Gap-filled hourly resample with forward fill over the purchase
    * stream ([[Temporal.resampleFfill]]). The oracle re-derives the
    * dense grid with generate_series and DuckDB's IGNORE NULLS window —
    * two engines' window machinery agreeing on every filled bucket.
    */
  val tsGapfill: QueryDef = QueryDef("ts_gapfill_ffill",
    (s, dir) => Temporal.resampleFfill(
      Tables.load(s, dir, "events").filter("event_type = 'purchase'"),
      "user_id", "ts", "value", "hour"),
    bench = true,
    oracle = Some(
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |         MAX(value) AS v_obs
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM b GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM span)
        |SELECT g.user_id, g.h,
        |  last_value(b.v_obs IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        |  b.v_obs IS NOT NULL AS observed
        |FROM grid g
        |LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h""".stripMargin))

  /** Blocked edit-distance near-dup pairs ([[Dedup
    * .blockedEditDistancePairs]]): prefix-block + length tolerance,
    * then bounded Levenshtein. The oracle runs DuckDB's unbounded
    * levenshtein over the same blocked candidates — verifying that the
    * 3-arg early-exit DP returns the exact distance for every kept pair.
    */
  val dedupEditDistance: QueryDef = QueryDef("dedup_edit_distance",
    (s, dir) => Dedup.blockedEditDistancePairs(docs(s, dir)),
    oracle = Some(
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.text, b.text) AS dist
        |FROM documents a JOIN documents b
        |  ON substr(a.text, 1, 16) = substr(b.text, 1, 16)
        | AND a.doc_id < b.doc_id
        |WHERE abs(length(a.text) - length(b.text)) <= 20
        |  AND levenshtein(a.text, b.text) <= 30""".stripMargin))

  /** Vocabulary coverage audit ([[TextAnalysis.vocabCoverage]]):
    * per-source token-occurrence coverage of the global top-20 vocab.
    */
  val vocabCoverage: QueryDef = QueryDef("text_vocab_coverage",
    (s, dir) => TextAnalysis.vocabCoverage(docs(s, dir), 20),
    oracle = Some(
      """WITH toks AS (
        |  SELECT source, lower(tok) AS tok FROM documents,
        |    unnest(string_split_regex(text, '\W+')) AS t(tok)
        |  WHERE tok <> ''),
        |freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |vocab AS (SELECT tok FROM freq ORDER BY c DESC, tok LIMIT 20)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered
        |FROM toks LEFT JOIN vocab v ON toks.tok = v.tok
        |GROUP BY source""".stripMargin))

  /** Local clustering coefficient, top-20 by triangle participation
    * ([[Graph.clusteringCoeffTopK]]): the per-node "how clique-like is
    * the neighborhood" graph feature. The oracle recomputes per-node
    * triangle corners from the naive triangle enumeration.
    */
  val graphClusteringCoeff: QueryDef = QueryDef("graph_clustering_coeff",
    (s, dir) => Graph.clusteringCoeffTopK(coEdges(s, dir), 20),
    oracle = Some(
      s"""$edgesCte,
         |tris AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM edges e1
         |  JOIN edges e2 ON e1.b = e2.a
         |  JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b),
         |pernode AS (
         |  SELECT tn AS node, COUNT(*) AS n_tri FROM (
         |    SELECT x AS tn FROM tris UNION ALL SELECT y FROM tris
         |    UNION ALL SELECT z FROM tris)
         |  GROUP BY tn),
         |deg AS (
         |  SELECT dn AS node, COUNT(*) AS deg FROM (
         |    SELECT a AS dn FROM edges UNION ALL SELECT b FROM edges)
         |  GROUP BY dn)
         |SELECT d.node AS node, CAST(COALESCE(p.n_tri, 0) AS BIGINT)
         |    AS n_tri,
         |  CAST(d.deg AS BIGINT) AS deg,
         |  2.0 * COALESCE(p.n_tri, 0) / (d.deg * (d.deg - 1)) AS coeff
         |FROM deg d LEFT JOIN pernode p ON d.node = p.node
         |WHERE d.deg > 1
         |ORDER BY n_tri DESC, node LIMIT 20""".stripMargin))

  private val clicksViewsCte =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts AS view_ts, MAX(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view'
      |  GROUP BY user_id, ts)""".stripMargin

  private def clicksViews(s: SparkSession,
                          dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, max}
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter("event_type = 'click'")
      .select("event_id", "user_id", "ts")
    val views = ev.filter("event_type = 'view'")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_event_id"))
    (clicks, views)
  }

  /** Forward as-of: every click matched to the EARLIEST view at-or-after
    * it (next-event attribution). The oracle is DuckDB's native forward
    * ASOF (`<=` comparator).
    */
  val joinAsofForward: QueryDef = QueryDef("join_asof_forward",
    (s, dir) => {
      val (clicks, views) = clicksViews(s, dir)
      Temporal.asofJoin(clicks, views, "user_id", "ts", "view_ts",
        forward = true)
    },
    oracle = Some(
      s"""$clicksViewsCte
         |SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_event_id
         |FROM clicks c
         |ASOF LEFT JOIN views v
         |  ON c.user_id = v.user_id AND c.ts <= v.view_ts""".stripMargin))

  /** Bounded-staleness as-of: backward match masked to null beyond a
    * 1-hour tolerance (pandas merge_asof semantics). The oracle
    * re-derives it with a bounded MAX + unique-key join-back.
    */
  val joinAsofTolerance: QueryDef = QueryDef("join_asof_tolerance",
    (s, dir) => {
      val (clicks, views) = clicksViews(s, dir)
      Temporal.asofJoin(clicks, views, "user_id", "ts", "view_ts",
        toleranceSql = Some("INTERVAL '1' HOUR"))
    },
    oracle = Some(
      s"""$clicksViewsCte,
         |best AS (
         |  SELECT c.event_id, MAX(v.view_ts) AS view_ts
         |  FROM clicks c LEFT JOIN views v
         |    ON c.user_id = v.user_id AND v.view_ts <= c.ts
         |   AND v.view_ts >= c.ts - INTERVAL '1' HOUR
         |  GROUP BY c.event_id)
         |SELECT c.event_id, c.user_id, c.ts, b.view_ts, v2.view_event_id
         |FROM clicks c JOIN best b ON c.event_id = b.event_id
         |LEFT JOIN views v2
         |  ON v2.user_id = c.user_id AND v2.view_ts = b.view_ts"""
        .stripMargin))

  /** Keyless interval-overlap join ([[Temporal.binnedOverlapJoin]]):
    * purchase windows × error windows that overlap, counted per
    * purchase. The oracle is DuckDB's plain quadratic range join —
    * the Spark side is the binned linear plan with canonical-bin dedup.
    */
  val joinIntervalOverlap: QueryDef = QueryDef("join_interval_overlap",
    (s, dir) => {
      import org.apache.spark.sql.functions.{col, count, expr}
      val ev = Tables.load(s, dir, "events")
      def windows(kind: String, idCol: String) =
        ev.filter(s"event_type = '$kind'")
          .select(col("event_id").as(idCol),
            col("ts").as(s"${idCol}_lo"),
            expr("ts + INTERVAL '30' MINUTE").as(s"${idCol}_hi"))
      Temporal.binnedOverlapJoin(
          windows("purchase", "purchase_id"), "purchase_id_lo",
          "purchase_id_hi",
          windows("error", "error_id"), "error_id_lo", "error_id_hi",
          binSeconds = 1800)
        .groupBy("purchase_id")
        .agg(count("*").as("n_overlap"))
    },
    oracle = Some(
      """WITH p AS (
        |  SELECT event_id AS purchase_id, ts AS lo,
        |    ts + INTERVAL '30' MINUTE AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT event_id AS error_id, ts AS lo,
        |    ts + INTERVAL '30' MINUTE AS hi
        |  FROM events WHERE event_type = 'error')
        |SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        |FROM p JOIN e ON p.lo < e.hi AND e.lo < p.hi
        |GROUP BY purchase_id""".stripMargin))

  /** STREAMING as-of attribution ([[graft.streaming.Streams
    * .asofAvailableNow]]): one latest-view state record per user,
    * flatMapGroupsWithState, AvailableNow over the bounded corpus —
    * verified against the same DuckDB ASOF oracle as the batch
    * `join_asof`, proving stream and batch semantics are one.
    */
  val streamAsof: QueryDef = QueryDef("stream_asof",
    (s, dir) => graft.streaming.Streams.asofAvailableNow(s, dir),
    oracle = Some(
      s"""$clicksViewsCte
         |SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_event_id
         |FROM clicks c
         |ASOF LEFT JOIN views v
         |  ON c.user_id = v.user_id AND c.ts >= v.view_ts""".stripMargin))

  val defs: Seq[QueryDef] = Seq(graphTriangles, graphDegreeTopK,
    tsGapfill, dedupEditDistance, vocabCoverage, graphClusteringCoeff,
    joinAsofForward, joinAsofTolerance, joinIntervalOverlap, streamAsof)
}
