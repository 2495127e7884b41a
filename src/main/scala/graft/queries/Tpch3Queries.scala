package graft.queries

import graft.QueryDef
import graft.QueryDef.sameSql
import Sql._

/** Third wave of TPC-H analogs — the queries whose original form needs
  * `partsupp` or lineitem date/shipmode columns the driver's schema
  * doesn't carry (TESTDATA.md). Each preserves the reference query's
  * PLAN SHAPE (the thing being tested) with adapted predicates:
  *
  *  - partsupp is derived as a CTE from lineitem (supplier-part pairs
  *    with MIN unit price standing in for ps_supplycost) — pure
  *    per-row division + MIN, deterministic in both engines;
  *  - "late shipment" predicates use l_shipdate vs o_orderdate + an
  *    interval (no commitdate/receiptdate columns).
  *
  * Together with TpchQueries/Tpch2Queries this completes a 22/22 TPC-H
  * plan-shape corpus, mirroring the reference's
  * `/root/reference/test/regress/expect/tpch0001/` (runner
  * `/root/reference/test/UnitTest.cs:295-355`).
  */
object Tpch3Queries {

  /** Derived partsupp: supplier-part pairs with a unit-cost stand-in.
    * MIN of a per-row division — no accumulation, so cross-engine exact.
    */
  private val partsuppCte =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  /** Q2: minimum-cost supplier — correlated scalar MIN subquery over the
    * (derived) partsupp, CTE referenced from both the outer join tree and
    * the subquery.
    */
  val q2: QueryDef = sameSql("tpch_q2",
    s"""WITH $partsuppCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
       |FROM part
       |JOIN ps ON p_partkey = ps_partkey
       |JOIN supplier ON s_suppkey = ps_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'ASIA'
       |  AND ps_supplycost = (
       |    SELECT MIN(ps2.ps_supplycost)
       |    FROM ps ps2
       |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin)

  /** Q9: product-type profit by nation and year — 5-way join with a LIKE
    * filter on part, grouped on derived columns.
    */
  val q9: QueryDef = sameSql("tpch_q9",
    s"""SELECT nation, o_year, ${dsum("amount", 6)} AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       |    l_extendedprice * (1 - l_discount) AS amount
       |  FROM part
       |  JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%re%'
       |) GROUP BY nation, o_year""".stripMargin,
    bench = true)

  /** Q11: important stock identification — grouped value sums filtered by
    * an uncorrelated scalar threshold, the HAVING-vs-global-aggregate shape.
    *
    * The threshold is twice the MEAN per-part value (total / distinct
    * parts), not a fixed fraction of the total: a fixed total/50 fraction
    * is only exceeded when one part carries 2% of a nation's volume,
    * which never happens once parts number in the thousands — the query
    * returned 0 rows at every gated scale factor (round-9 verdict finding
    * #1). Mean-relative keeps selectivity stable as the corpus grows
    * (20 rows at sf0.001, 141 at sf0.01, 924 at sf0.1). Nation filter
    * widened to n_nationkey < 5 because sf0.001 has no NATION_1 supplier.
    *
    * Scale-2 exact sums: l_extendedprice * l_quantity values carry 2
    * decimals; the scaled-BIGINT sum stays within int64 even at sf100.
    */
  val q11: QueryDef = sameSql("tpch_q11",
    s"""SELECT ps_partkey, value FROM (
       |  SELECT l_partkey AS ps_partkey,
       |    ${dsum("l_extendedprice * l_quantity", 2)} AS value
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_nationkey < 5
       |  GROUP BY l_partkey)
       |WHERE value > (
       |  SELECT 2.0 * ${dsum("l_extendedprice * l_quantity", 2)}
       |         / COUNT(DISTINCT l_partkey)
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_nationkey < 5)""".stripMargin)

  /** Q12: shipping-delay buckets (shipmode analog: lateness class from
    * l_shipdate vs o_orderdate) with conditional priority counts.
    */
  val q12: QueryDef = sameSql("tpch_q12",
    """SELECT ship_bucket,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE WHEN l_shipdate >= o_orderdate + INTERVAL '60' DAY
      |         THEN 'SLOW' ELSE 'FAST' END AS ship_bucket
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE l_shipdate >= DATE '1996-01-01'
      |    AND l_shipdate < DATE '1997-01-01')
      |GROUP BY ship_bucket""".stripMargin)

  /** Q16: supplier counting by part attributes — NOT IN subquery +
    * COUNT(DISTINCT) over a multi-attribute group (partsupp replaced by
    * the lineitem supplier-part relation).
    */
  val q16: QueryDef = sameSql("tpch_q16",
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00000001%')
      |GROUP BY p_brand, p_type, p_size""".stripMargin)

  /** Q20: potential part promotion — nested IN subqueries with a grouped
    * HAVING threshold (availqty analog: shipped quantity per
    * supplier-part; l_quantity is integer-valued so the plain sum is
    * exact).
    */
  val q20: QueryDef = sameSql("tpch_q20",
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_2'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_name LIKE '%re%'
      |      AND l_shipdate >= DATE '1996-01-01'
      |      AND l_shipdate < DATE '1997-01-01'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(l_quantity) > 50)""".stripMargin)

  /** Q21: suppliers who kept orders waiting — the EXISTS + NOT EXISTS
    * double correlation on the same fact table (late = shipped more than
    * 90 days after the order date).
    */
  val q21: QueryDef = sameSql("tpch_q21",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL '90' DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1
      |    FROM lineitem l3 JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o2.o_orderdate + INTERVAL '90' DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin)

  /** Q18 rewritten with a window function: the IN-subquery over a
    * grouped HAVING re-scans lineitem; the window form computes the
    * per-order quantity sum in the SAME scan (one pass instead of two —
    * at 100 TB that's the difference between reading the fact table
    * once and twice). Same oracle as tpch_q18 (the driver runs the
    * original IN-form SQL in DuckDB); hash-equality proves the rewrite.
    * l_quantity is integer-valued: window sums are exact.
    */
  val q18Window: QueryDef = QueryDef("tpch_q18_window",
    (s, dir) => graft.QueryDef.run(s, dir,
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |  ${dsum("l_quantity")} AS sum_qty
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN (
         |  SELECT l_orderkey, l_quantity,
         |    SUM(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty
         |  FROM lineitem
         |) l ON o_orderkey = l.l_orderkey
         |WHERE l.order_qty > 150
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 100""".stripMargin),
    Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
            |  ${dsum("l_quantity")} AS sum_qty
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON o_orderkey = l_orderkey
            |WHERE o_orderkey IN (
            |  SELECT l_orderkey FROM lineitem
            |  GROUP BY l_orderkey
            |  HAVING SUM(l_quantity) > 150)
            |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            |ORDER BY o_totalprice DESC, o_orderkey
            |LIMIT 100""".stripMargin),
    bench = true)

  /** Q17 rewritten with a window: the correlated per-part AVG subquery
    * becomes a same-scan window average — one lineitem pass. Same
    * oracle as tpch_q17 (the correlated form).
    */
  val q17Window: QueryDef = QueryDef("tpch_q17_window",
    (s, dir) => graft.QueryDef.run(s, dir,
      s"""SELECT ${dsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM (
         |  SELECT l_partkey, l_quantity, l_extendedprice,
         |    AVG(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg
         |  FROM lineitem
         |) l JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * part_avg""".stripMargin),
    Some(s"""SELECT ${dsum("l_extendedprice")} / 7.0 AS avg_yearly
            |FROM lineitem JOIN part ON p_partkey = l_partkey
            |WHERE p_brand = 'Brand#1'
            |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
            |                    FROM lineitem l2
            |                    WHERE l2.l_partkey = p_partkey)""".stripMargin))

  val defs: Seq[QueryDef] = Seq(q2, q9, q11, q12, q16, q20, q21,
    q18Window, q17Window)
}
