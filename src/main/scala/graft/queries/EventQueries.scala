package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}
import Sql._

/** Event-stream analytics over `events` + statistical aggregates —
  * the semi-structured (JSON props) and sequence-analysis surface a
  * telemetry pipeline needs.
  */
object EventQueries {

  /** JSON extraction from the string `props` column (Spark
    * get_json_object vs DuckDB json_extract_string).
    */
  val json: QueryDef = sqlDef("expr_json",
    """SELECT event_id,
      |  CAST(GET_JSON_OBJECT(props, '$.k') AS INT) AS k_val
      |FROM events WHERE event_id <= 200""".stripMargin,
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
      |FROM events WHERE event_id <= 200""".stripMargin)

  /** Funnel step detection: view → click transitions per user via
    * lead() sequencing (deterministic total order: ts then event_id).
    */
  val funnel: QueryDef = sameSql("event_funnel",
    """SELECT COUNT(*) AS view_to_click
      |FROM (
      |  SELECT event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |WHERE event_type = 'view' AND next_type = 'click'""".stripMargin)

  /** Per-type event rollup with decimal-exact value sums. */
  val byType: QueryDef = sameSql("event_by_type",
    s"""SELECT event_type, COUNT(*) AS cnt,
       |  ${dsum("value")} AS total_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events GROUP BY event_type""".stripMargin)

  /** Exact interpolated percentiles (Spark percentile ≡ DuckDB
    * quantile_cont on the same sorted values).
    */
  val percentile: QueryDef = sqlDef("agg_percentile",
    """SELECT l_returnflag,
      |  PERCENTILE(l_quantity, 0.5) AS med,
      |  PERCENTILE(l_quantity, 0.9) AS p90
      |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med,
      |  quantile_cont(l_quantity, 0.9) AS p90
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** Correlation / covariance aggregates (rounded: both engines stream
    * in different orders; 6 dp is far above the drift).
    */
  val corr: QueryDef = sameSql("agg_corr",
    """SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS c_qp,
      |  ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cv_qd
      |FROM lineitem""".stripMargin)

  /** Approximate distinct (HLL) sanity gate: the sketch must land within
    * 5% of the exact count. The approx value itself is engine-specific,
    * so the verified output is the bound check, not the estimate.
    */
  val approxDistinct: QueryDef = QueryDef("approx_distinct_sanity",
    (s, dir) => {
      graft.catalog.Tables.registerAll(s, dir)
      // rsd 0.02: the 5% gate is ~2.5 sigma of the sketch error, which
      // holds on every testdata scale factor (checked sf0.001-0.1)
      s.sql("""SELECT
              |  (ABS(APPROX_COUNT_DISTINCT(user_id, 0.02) -
              |       COUNT(DISTINCT user_id)) <=
              |   0.05 * COUNT(DISTINCT user_id)) AS within_5pct
              |FROM events""".stripMargin)
    },
    Some("SELECT TRUE AS within_5pct"))

  /** Week-over-week retention cohorts: distinct active users per week
    * self-joined onto the next week — the telemetry retention report
    * (one shuffle on user_id for the distinct, one on the join key;
    * the events corpus spans ~a month, so weeks give real cohorts).
    */
  val retention: QueryDef = sameSql("event_retention",
    """WITH weekly AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
      |  FROM events)
      |SELECT a.w AS cohort_week, COUNT(*) AS retained
      |FROM weekly a JOIN weekly b
      |  ON a.user_id = b.user_id AND b.w = a.w + INTERVAL 7 DAY
      |GROUP BY a.w""".stripMargin)

  /** Gap-based batch sessionization: a new session starts after 30+
    * minutes of inactivity — the LAG-flag + running-SUM session-id
    * assignment (one shuffle on user_id; both windows share the same
    * sort). The batch twin of the streaming session_window queries.
    * Session ids are exact integer window sums (DuckDB widens window
    * sums of INTEGER to HUGEINT — cast keeps the gate's types aligned).
    */
  val sessionize: QueryDef = sameSql("event_sessionize",
    """WITH seq AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS sess_id
      |  FROM seq)
      |SELECT user_id, sess_id, COUNT(*) AS n_events,
      |  MIN(ts) AS sess_start, MAX(ts) AS sess_end
      |FROM sess GROUP BY user_id, sess_id""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    json, funnel, byType, percentile, corr, approxDistinct, retention,
    sessionize)
}
