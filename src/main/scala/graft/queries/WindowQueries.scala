package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}
import Sql._

/** Time-window + analytic-window corpus over the `events` table.
  *
  * The reference's streaming windows (`/root/reference/qpmodel/
  * Stream.cs:19-165`: tumble/hop as GROUP BY keys, session parsed but
  * unimplemented) are exercised here in bounded form via Spark's native
  * `window()` / `session_window()` grouping expressions — identical
  * semantics to the streaming path (same expressions run under
  * `readStream`, see graft.streaming). DuckDB oracles rebuild the windows
  * with `time_bucket` / gaps-and-islands SQL.
  *
  * Analytic (OVER) window functions are parity-plus: the reference lists
  * them as its top TPC-DS gap (README "we do not support window function").
  */
object WindowQueries {

  /** Tumbling window (reference `tumble()` Stream.cs:19-40): 6-hour
    * buckets, epoch-aligned in both engines.
    */
  val tumble: QueryDef = sqlDef("window_tumble",
    s"""SELECT window.start AS w_start, COUNT(*) AS cnt,
       |  ${dsum("value")} AS sum_v
       |FROM events
       |GROUP BY WINDOW(ts, '6 hours')""".stripMargin,
    s"""SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start, COUNT(*) AS cnt,
       |  ${dsum("value")} AS sum_v
       |FROM events
       |GROUP BY 1""".stripMargin)

  /** Hopping window (reference `hop()` SRF Stream.cs:116-150): size 12h,
    * slide 6h — each event lands in exactly 2 windows. DuckDB oracle
    * expands the two candidate starts per row.
    */
  val hop: QueryDef = sqlDef("window_hop",
    """SELECT window.start AS w_start, COUNT(*) AS cnt
      |FROM events
      |GROUP BY WINDOW(ts, '12 hours', '6 hours')""".stripMargin,
    """SELECT time_bucket(INTERVAL '6 hours', ts) - k * INTERVAL '6 hours' AS w_start,
      |  COUNT(*) AS cnt
      |FROM events, (SELECT unnest([0, 1]) AS k)
      |GROUP BY 1""".stripMargin)

  /** Session window (reference parses `session()` but never executes it,
    * Stream.cs:152-165 — real semantics here): per-user sessions with
    * 30-minute inactivity gap. DuckDB oracle: gaps-and-islands.
    */
  val session: QueryDef = sqlDef("window_session",
    """SELECT user_id, session_window.start AS s_start, COUNT(*) AS cnt
      |FROM events
      |WHERE user_id <= 20
      |GROUP BY user_id, SESSION_WINDOW(ts, '30 minutes')""".stripMargin,
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE user_id <= 20
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS cnt
      |FROM sessions GROUP BY user_id, sid""".stripMargin)

  /** Analytic ranking: row_number over partitions with total tiebreak. */
  val rank: QueryDef = sameSql("winfunc_rank",
    """SELECT c_custkey, c_nationkey, c_acctbal, rnk FROM (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer)
      |WHERE rnk <= 3""".stripMargin)

  /** Analytic running sum + lag (exact decimal accumulation both sides). */
  val running: QueryDef = sameSql("winfunc_running",
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE) AS run_tot,
      |  LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key
      |FROM orders WHERE o_custkey <= 50""".stripMargin)

  /** Reference-dialect window SQL: `tumble(ts, iv)` as the GROUP BY key
    * (qpmodel Stream.cs:19-40 surface), resolved via GraftExtensions'
    * injected functions onto Catalyst's TimeWindow.
    */
  val tumbleDialect: QueryDef = sqlDef("window_tumble_dialect",
    """SELECT window.start AS w_start, COUNT(*) AS cnt
      |FROM events
      |GROUP BY TUMBLE(ts, INTERVAL '6' HOUR)""".stripMargin,
    """SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start, COUNT(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin)

  /** Reference-dialect hop(ts, slide, size). */
  val hopDialect: QueryDef = sqlDef("window_hop_dialect",
    """SELECT window.start AS w_start, COUNT(*) AS cnt
      |FROM events
      |GROUP BY HOP(ts, INTERVAL '6' HOUR, INTERVAL '12' HOUR)""".stripMargin,
    """SELECT time_bucket(INTERVAL '6 hours', ts) - k * INTERVAL '6 hours' AS w_start,
      |  COUNT(*) AS cnt
      |FROM events, (SELECT unnest([0, 1]) AS k)
      |GROUP BY 1""".stripMargin)

  /** Reference-dialect session(ts, gap) (parsed-but-unimplemented in the
    * reference, Stream.cs:152-165 — executable here).
    */
  val sessionDialect: QueryDef = sqlDef("window_session_dialect",
    """SELECT user_id, session_window.start AS s_start, COUNT(*) AS cnt
      |FROM events
      |WHERE user_id <= 20
      |GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)""".stripMargin,
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE user_id <= 20
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS cnt
      |FROM sessions GROUP BY user_id, sid""".stripMargin)

  /** Frame-based analytics: dense_rank, ntile, first/last value over
    * explicit ROWS frames (all with total tiebreak orderings).
    */
  val frames: QueryDef = sameSql("winfunc_frames",
    """SELECT o_custkey, o_orderkey,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  FIRST_VALUE(o_orderkey) OVER
      |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best_key,
      |  COUNT(*) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighborhood
      |FROM orders
      |WHERE o_custkey <= 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin)

  val defs: Seq[QueryDef] = Seq(tumble, hop, session, rank, running,
    tumbleDialect, hopDialect, sessionDialect, frames)
}
