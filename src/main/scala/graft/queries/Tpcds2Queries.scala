package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}
import Sql._

/** Second TPC-DS analog wave: shapes from the reference's RUNNABLE list
  * (`/root/reference/test/UnitTest.cs:420-428`) not yet represented in
  * TpcdsQueries — scalar-aggregate cross joins (q28/q88), count-bounded
  * group joins (q34/q73), latency bucketing (q50/q62), coefficient-of-
  * variation pair joins (q39), promo ratios (q61), and week-over-week
  * day-of-week pivots (q2/q59). Adapted to the testdata schema per the
  * conventions in TpcdsQueries (exact scaled-BIGINT sums, deterministic
  * orderings, no row selection on inexact doubles).
  */
object Tpcds2Queries {

  /** q28 shape: independent per-bucket aggregates over disjoint quantity
    * bands, cross-joined into one row. Literal benchmark form — six
    * scalar-aggregate subqueries; Spark broadcasts the six single rows.
    * (The single-pass CASE rewrite is what you'd hand-tune at 100 TB;
    * the corpus tests that the composed literal form answers right.)
    */
  val q28Buckets: QueryDef = sameSql("tpcds_q28_bucket_aggs", {
    def bucket(i: Int, lo: Int, hi: Int) =
      s"""(SELECT ${davg("l_extendedprice", 2)} AS b${i}_avg,
         |  COUNT(*) AS b${i}_cnt,
         |  COUNT(DISTINCT l_extendedprice) AS b${i}_dist
         | FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi) b$i""".stripMargin
    s"""SELECT * FROM
       |${Seq((1, 1, 8), (2, 9, 16), (3, 17, 24), (4, 25, 32), (5, 33, 40),
          (6, 41, 50)).map { case (i, lo, hi) => bucket(i, lo, hi) }
         .mkString(",\n")}""".stripMargin
  })

  /** The 100 TB plan for q28: one scan bucketing every row, per-bucket
    * aggregates, then a tiny pivot to the wide row — replacing six
    * independent scans of the fact. Verified against the UNCHANGED
    * six-subquery oracle (the buckets partition l_quantity, and the
    * exact-sum averages reaggregate identically), so the rewrite is
    * hash-proven. Caveat the proof covers: an EMPTY bucket would yield
    * NULL counts here vs 0 in the subquery form — valid only while
    * every band is populated (any non-degenerate fact table).
    */
  val q28OnePass: QueryDef = QueryDef("tpcds_q28_onepass",
    (s, dir) => graft.QueryDef.run(s, dir, {
      val bkt = Seq((1, 1, 8), (2, 9, 16), (3, 17, 24), (4, 25, 32),
        (5, 33, 40), (6, 41, 50))
        .map { case (i, lo, hi) =>
          s"WHEN l_quantity BETWEEN $lo AND $hi THEN $i" }
        .mkString("CASE ", " ", " END")
      val wide = (1 to 6).flatMap { i => Seq(
        s"MAX(CASE WHEN bkt = $i THEN avgp END) AS b${i}_avg",
        s"MAX(CASE WHEN bkt = $i THEN cnt END) AS b${i}_cnt",
        s"MAX(CASE WHEN bkt = $i THEN dist END) AS b${i}_dist") }
        .mkString(",\n  ")
      s"""WITH b AS (
         |  SELECT $bkt AS bkt, l_extendedprice
         |  FROM lineitem),
         |a AS (
         |  SELECT bkt, ${davg("l_extendedprice", 2)} AS avgp,
         |    COUNT(*) AS cnt, COUNT(DISTINCT l_extendedprice) AS dist
         |  FROM b WHERE bkt IS NOT NULL GROUP BY bkt)
         |SELECT $wide FROM a""".stripMargin
    }),
    q28Buckets.oracle)

  /** q88 shape: eight time-slot counts over the clickstream, each an
    * independent scalar aggregate, cross-joined to a single wide row.
    */
  val q88Slots: QueryDef = sameSql("tpcds_q88_time_slots",
    (0 until 8).map { i =>
      val (lo, hi) = (i * 3, i * 3 + 2)
      s"""(SELECT COUNT(*) AS h${lo}_$hi FROM events
         | WHERE HOUR(ts) BETWEEN $lo AND $hi AND event_type = 'view') s$i"""
        .stripMargin
    }.mkString("SELECT * FROM\n", ",\n", ""))

  /** q34/q73 shape: orders whose line count falls in a band, joined back
    * to their customers — the "busy household" pattern. The count bound
    * is an exact integer, so row membership is deterministic.
    */
  val q73Lines: QueryDef = sameSql("tpcds_q73_lines_per_order",
    """WITH ln AS (
      |  SELECT l_orderkey, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT c_name, c_custkey, o_orderkey, cnt
      |FROM orders
      |JOIN ln ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |WHERE cnt BETWEEN 8 AND 13""".stripMargin)

  /** q50/q62 shape: order→ship latency bucketed by priority class.
    * DATEDIFF argument orders differ between the engines, hence the
    * dialect pair; the bucket sums are integer CASE counts (DuckDB sums
    * to HUGEINT — cast back to BIGINT for the gate).
    */
  val q62Latency: QueryDef = {
    def buckets(diff: String, castSum: String => String) = Seq(
      ("d30", s"$diff <= 30"), ("d60", s"$diff > 30 AND $diff <= 60"),
      ("d90", s"$diff > 60 AND $diff <= 90"),
      ("d120", s"$diff > 90 AND $diff <= 120"), ("dlate", s"$diff > 120"))
      .map { case (n, p) =>
        castSum(s"SUM(CASE WHEN $p THEN 1 ELSE 0 END)") + s" AS $n" }
      .mkString(",\n  ")
    def body(diff: String, castSum: String => String) =
      s"""SELECT o_orderpriority,
         |  ${buckets(diff, castSum)}
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin
    sqlDef("tpcds_q62_ship_latency",
      body("DATEDIFF(l_shipdate, o_orderdate)", identity),
      body("datediff('day', o_orderdate, l_shipdate)",
        s => s"CAST($s AS BIGINT)"))
  }

  /** q39 shape: per-(brand, month) demand statistics, consecutive months
    * paired to compare coefficients of variation. Pair membership is
    * decided by exact keys only; the stdev/mean values ride along as
    * display columns (both engines compute them from the same integral
    * quantities, agreeing far inside the gate's 6 dp rounding).
    */
  val q39Cov: QueryDef = sameSql("tpcds_q39_cov_pairs",
    """WITH stats AS (
      |  SELECT p_brand, MONTH(l_shipdate) AS m,
      |    COUNT(*) AS n,
      |    STDDEV_SAMP(l_quantity) / AVG(l_quantity) AS cov
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      |  GROUP BY p_brand, MONTH(l_shipdate)
      |  HAVING COUNT(*) >= 2)
      |SELECT a.p_brand, a.m AS m1, b.m AS m2,
      |  a.cov AS cov1, b.cov AS cov2
      |FROM stats a JOIN stats b
      |  ON a.p_brand = b.p_brand AND b.m = a.m + 1""".stripMargin)

  /** q61 shape: promotional share of revenue — two scalar aggregates
    * over different slices of the same fact, joined to one ratio row.
    * Exact sums make the ratio bit-identical.
    */
  val q61Promo: QueryDef = sameSql("tpcds_q61_promo_ratio",
    s"""WITH p AS (
       |  SELECT ${dsum("l_extendedprice * (1 - l_discount)", 6)} AS promo_rev
       |  FROM lineitem
       |  WHERE l_discount > 0.05
       |    AND l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'),
       |t AS (
       |  SELECT ${dsum("l_extendedprice * (1 - l_discount)", 6)} AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31')
       |SELECT promo_rev, total_rev,
       |  promo_rev * 100 / total_rev AS promo_pct
       |FROM p, t""".stripMargin)

  /** q2/q59 shape: weekly revenue pivoted by day-of-week, then the same
    * week a year later joined for week-over-week ratios. Two exact
    * aggregation levels (scaled BIGINT), ratios guarded by exact zero
    * tests (Spark's double division by zero yields NULL, DuckDB's yields
    * inf — never let the engines reach that divergence). Spark's
    * DAYOFWEEK is 1=Sunday..7; DuckDB's dayofweek is 0=Sunday..6.
    */
  val q59Wow: QueryDef = {
    def body(dow: String) = {
      def dsumDow(d: Int) =
        qsum(s"CASE WHEN $dow = $d THEN o_totalprice ELSE 0.0 END", 2)
      def ratio(c: String) =
        s"""CASE WHEN b.$c = 0 THEN NULL
           |    ELSE CAST(a.$c AS DOUBLE) / CAST(b.$c AS DOUBLE) END
           |  AS ${c}_ratio""".stripMargin
      s"""WITH wk AS (
         |  SELECT YEAR(o_orderdate) AS yr, WEEKOFYEAR(o_orderdate) AS wk,
         |    ${dsumDow(1)} AS sun, ${dsumDow(2)} AS mon,
         |    ${dsumDow(4)} AS wed, ${dsumDow(6)} AS fri
         |  FROM orders
         |  WHERE YEAR(o_orderdate) IN (1996, 1997)
         |  GROUP BY YEAR(o_orderdate), WEEKOFYEAR(o_orderdate))
         |SELECT a.wk, ${ratio("sun")}, ${ratio("mon")},
         |  ${ratio("wed")}, ${ratio("fri")}
         |FROM wk a JOIN wk b ON a.wk = b.wk
         |WHERE a.yr = 1997 AND b.yr = 1996""".stripMargin
    }
    sqlDef("tpcds_q59_wow_dow",
      body("DAYOFWEEK(o_orderdate)"),
      body("(dayofweek(o_orderdate) + 1)"))
  }

  /** q65 shape: (store, item) revenue against a fraction of the store's
    * average item revenue — a grouped aggregate joined back to its own
    * per-group average. Thresholds compare doubles derived from exact
    * integer sums, so row membership is deterministic.
    */
  val q65MinAvg: QueryDef = sameSql("tpcds_q65_below_avg",
    s"""WITH sp AS (
       |  SELECT l_suppkey, l_partkey,
       |    ${qsum("l_extendedprice * (1 - l_discount)", 6)} AS q_rev
       |  FROM lineitem GROUP BY l_suppkey, l_partkey),
       |sb AS (
       |  SELECT l_suppkey,
       |    CAST(SUM(q_rev) AS DOUBLE) / COUNT(*) AS avg_rev
       |  FROM sp GROUP BY l_suppkey)
       |SELECT s_name, p_name, ${unscale("q_rev", 6)} AS revenue
       |FROM sp
       |JOIN sb ON sp.l_suppkey = sb.l_suppkey
       |JOIN supplier ON s_suppkey = sp.l_suppkey
       |JOIN part ON p_partkey = sp.l_partkey
       |WHERE CAST(q_rev AS DOUBLE) <= 0.1 * avg_rev""".stripMargin)

  /** q81 shape: customers whose order total exceeds 1.2× their nation's
    * average — a correlated-threshold cohort over a two-level aggregate.
    */
  val q81AboveAvg: QueryDef = sameSql("tpcds_q81_above_avg",
    s"""WITH ct AS (
       |  SELECT c_custkey, c_name, c_nationkey,
       |    ${qsum("o_totalprice", 2)} AS q_total
       |  FROM customer JOIN orders ON o_custkey = c_custkey
       |  GROUP BY c_custkey, c_name, c_nationkey),
       |na AS (
       |  SELECT c_nationkey,
       |    CAST(SUM(q_total) AS DOUBLE) / COUNT(*) AS avg_total
       |  FROM ct GROUP BY c_nationkey)
       |SELECT n_name, c_name, ${unscale("q_total", 2)} AS total_spent
       |FROM ct
       |JOIN na ON ct.c_nationkey = na.c_nationkey
       |JOIN nation ON n_nationkey = ct.c_nationkey
       |WHERE CAST(q_total AS DOUBLE) > 1.2 * avg_total""".stripMargin)

  val defs: Seq[QueryDef] = Seq(q28Buckets, q28OnePass, q88Slots, q73Lines,
    q62Latency, q39Cov, q61Promo, q59Wow, q65MinAvg, q81AboveAvg)
}
