package graft.queries

import graft.QueryDef
import graft.QueryDef.sameSql
import Sql._

/** Third TPC-DS analog wave: the remaining shape classes from the
  * reference's RUNNABLE list (`/root/reference/test/UnitTest.cs:420-428`)
  * not yet represented by TpcdsQueries/Tpcds2Queries — simple star top-k
  * (q3/q42/q52/q55), demographic multi-average stars (q7/q26),
  * OR-across-dimensions predicates with an IN-subquery arm (q15/q45),
  * cross-dimension inequality joins (q19/q46/q68/q79), pivot-date
  * before/after ratios (q21), triple-fact sales→returns→re-sales chains
  * (q17/q25/q29), multi-EXISTS demographic cohorts (q35), the
  * EXISTS + double-NOT-EXISTS variant (q69), dimension-driven fact-window
  * availability (q37/q82), banded-OR join predicates (q85), scalar-ratio
  * pairs over time slices (q90), order-level EXISTS/NOT-EXISTS shipping
  * audits (q94/q95), and selective multi-dimension COUNT(*) (q96).
  *
  * Adapted to the testdata schema (part→item, orders+lineitem→the fact
  * channels, nation/region→geography dims, `l_returnflag = 'R'`→returns
  * channel) per the determinism conventions in TpcdsQueries: exact
  * scaled-BIGINT sums, BIGINT casts on integer sums (DuckDB widens to
  * HUGEINT), total deterministic orderings under every LIMIT.
  *
  * Scale posture: every query is a declarative star/snowflake plan —
  * selective dims broadcast, the fact shuffles once per aggregation
  * grain, EXISTS/NOT EXISTS decorrelate to semi/anti hash joins on the
  * correlation key (asserted corpus-wide by the PlanShapeSpec family).
  */
object Tpcds3Queries {

  /** q3/q42/q52/q55 shape: date-dim × fact × item star aggregate with
    * sum-ranked top-k (`/root/reference/tpcds/q3.sql`: year × brand
    * revenue for one manufacturer slice in one month, ORDER BY sum DESC).
    */
  val q3StarTopk: QueryDef = sameSql("tpcds_q3_star_topk",
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS d_year,
       |  p_brand,
       |  ${dsum("l_extendedprice", 2)} AS sum_agg
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_size BETWEEN 10 AND 15
       |  AND EXTRACT(MONTH FROM o_orderdate) = 11
       |GROUP BY EXTRACT(YEAR FROM o_orderdate), p_brand
       |ORDER BY d_year, sum_agg DESC, p_brand
       |LIMIT 100""".stripMargin)

  /** q7/q26 shape: demographic-sliced star with four independent
    * averages per item (`/root/reference/tpcds/q7.sql`: avg quantity /
    * list price / coupon amt / sales price by item for one demographic
    * cell). The demographic cell here is mktsegment × order priority.
    */
  val q7MultiAvg: QueryDef = sameSql("tpcds_q7_demo_avgs",
    s"""SELECT p_type,
       |  ${davg("l_quantity", 2)} AS agg1,
       |  ${davg("l_extendedprice", 2)} AS agg2,
       |  ${davg("l_discount", 4)} AS agg3,
       |  ${davg("l_extendedprice * (1 - l_discount)", 6)} AS agg4
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
       |GROUP BY p_type
       |ORDER BY p_type""".stripMargin)

  /** q15/q45 shape: a disjunction that spans DIMENSION attributes and a
    * FACT measure — geography in-list OR segment in-list OR price
    * threshold — plus q45's IN-subquery arm (region lookup). The OR
    * defeats single-dim pushdown by design: the filter must evaluate
    * post-join, and the planner's job is keeping the dims broadcast
    * (`/root/reference/tpcds/q15.sql`, `q45.sql`).
    */
  val q15OrDims: QueryDef = sameSql("tpcds_q15_or_dims",
    s"""SELECT n_name, ${dsum("o_totalprice", 2)} AS total_sales
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE (n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
       |       OR c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
       |       OR o_totalprice > 400000
       |       OR n_regionkey IN (SELECT r_regionkey FROM region
       |                          WHERE r_name = 'ASIA'))
       |  AND EXTRACT(QUARTER FROM o_orderdate) = 2
       |  AND EXTRACT(YEAR FROM o_orderdate) = 1997
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin)

  /** q19/q46/q68/q79 shape: multi-dimension star whose filter compares
    * attributes of TWO different dimensions (customer geography ≠
    * supplier geography — the analog of q19's
    * `substr(ca_zip,1,5) <> substr(s_zip,1,5)`): the inequality can only
    * run after both dims join, so plan quality = both dims broadcast and
    * the fact never shuffled twice (`/root/reference/tpcds/q19.sql`).
    */
  val q19CrossDimNeq: QueryDef = sameSql("tpcds_q19_cross_dim_neq",
    s"""SELECT p_brand, ${dsum("l_extendedprice", 2)} AS ext_price
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE c_nationkey <> s_nationkey
       |  AND EXTRACT(YEAR FROM o_orderdate) = 1996
       |  AND p_size BETWEEN 1 AND 15
       |GROUP BY p_brand
       |ORDER BY ext_price DESC, p_brand
       |LIMIT 100""".stripMargin)

  /** q21 shape: quantity split into before/after a pivot date inside a
    * window, then the OUTER query keeps only groups whose after/before
    * ratio sits in a band — a HAVING-like filter on a CASE over two
    * conditional sums (`/root/reference/tpcds/q21.sql`).
    */
  val q21BeforeAfter: QueryDef = sameSql("tpcds_q21_before_after",
    s"""SELECT * FROM (
       |  SELECT n_name, p_brand,
       |    CAST(SUM(CASE WHEN l_shipdate < DATE '1997-07-01'
       |      THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS inv_before,
       |    CAST(SUM(CASE WHEN l_shipdate >= DATE '1997-07-01'
       |      THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS inv_after
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
       |    AND p_retailprice BETWEEN 903 AND 917
       |  GROUP BY n_name, p_brand) x
       |WHERE CASE WHEN inv_before > 0
       |        THEN CAST(inv_after AS DOUBLE) / inv_before
       |        ELSE NULL END
       |      BETWEEN CAST(2 AS DOUBLE) / 3 AND CAST(3 AS DOUBLE) / 2
       |ORDER BY n_name, p_brand""".stripMargin)

  /** q17/q25/q29 shape: three fact touches chained on the item — a sale
    * in a seed window, a return in a longer window, a re-sale after —
    * with per-channel MAX aggregates (`/root/reference/tpcds/q25.sql`:
    * store_sales ⋈ store_returns ⋈ catalog_sales over d1/d2/d3).
    * Channels map to `l_returnflag` slices; each CTE carries its own
    * date window. Each channel pre-aggregates to one row per item
    * BEFORE the chain join — at 100 TB that turns a fact×fact×fact join
    * into three shuffled aggregates plus an item-sized 3-way equi-join
    * (the raw row-level chain was also measured EMPTY at the corpus
    * scales: per-(customer, item) repeat trades are too rare in the
    * testdata, and an empty result verifies nothing).
    */
  val q25SalesReturns: QueryDef = sameSql("tpcds_q25_sales_returns",
    s"""WITH sales AS (
       |  SELECT l_partkey AS pk, MAX(l_extendedprice) AS max_sale
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'N'
       |    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
       |  GROUP BY l_partkey),
       |returned AS (
       |  SELECT l_partkey AS pk, MAX(l_extendedprice) AS max_return
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-09-30'
       |  GROUP BY l_partkey),
       |resales AS (
       |  SELECT l_partkey AS pk, MAX(l_extendedprice) AS max_resale
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderdate BETWEEN DATE '1996-04-01' AND DATE '1996-12-31'
       |  GROUP BY l_partkey)
       |SELECT pk, p_name, max_sale, max_return, max_resale
       |FROM sales
       |JOIN returned USING (pk)
       |JOIN resales USING (pk)
       |JOIN part ON pk = p_partkey
       |ORDER BY pk""".stripMargin)

  /** q35 shape: a demographic cohort gated by EXISTS on one channel AND
    * (EXISTS OR EXISTS) across two more — the mark-join-under-OR form —
    * then count/avg/stddev/sum trios per demographic cell
    * (`/root/reference/tpcds/q35.sql`). stddev follows agg_stddev's
    * cross-engine ROUND(…, 4) convention.
    */
  val q35MultiExists: QueryDef = sameSql("tpcds_q35_multi_exists_stats",
    s"""SELECT n_name, c_mktsegment,
       |  COUNT(*) AS cnt,
       |  ${davg("c_acctbal", 2)} AS avg_bal,
       |  ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal,
       |  ${dsum("c_acctbal", 2)} AS sum_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE EXISTS (SELECT 1 FROM orders
       |              WHERE o_custkey = c_custkey
       |                AND EXTRACT(YEAR FROM o_orderdate) = 1996)
       |  AND (EXISTS (SELECT 1 FROM orders JOIN lineitem
       |                 ON l_orderkey = o_orderkey
       |               WHERE o_custkey = c_custkey AND l_returnflag = 'R')
       |       OR EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT'))
       |GROUP BY n_name, c_mktsegment
       |ORDER BY n_name, c_mktsegment""".stripMargin)

  /** q69 shape: q35's complement — customers ACTIVE on one channel but
    * absent from two others: EXISTS AND NOT EXISTS AND NOT EXISTS, the
    * anti-join chain (`/root/reference/tpcds/q69.sql`).
    */
  val q69NotExists: QueryDef = sameSql("tpcds_q69_exists_not_exists",
    s"""SELECT c_mktsegment,
       |  COUNT(*) AS cnt,
       |  ${davg("c_acctbal", 2)} AS avg_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE n_regionkey <= 2
       |  AND EXISTS (SELECT 1 FROM orders
       |              WHERE o_custkey = c_custkey
       |                AND EXTRACT(YEAR FROM o_orderdate) = 1996)
       |  AND NOT EXISTS (SELECT 1 FROM orders JOIN lineitem
       |                    ON l_orderkey = o_orderkey
       |                  WHERE o_custkey = c_custkey
       |                    AND l_returnflag = 'R'
       |                    AND EXTRACT(YEAR FROM o_orderdate) = 1996)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT'
       |                    AND EXTRACT(YEAR FROM o_orderdate) = 1996)
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin)

  /** q37/q82 shape: item listing driven by a FACT-WINDOW semi-join —
    * items in a price/size slice that actually moved in a 60-day window
    * (`/root/reference/tpcds/q82.sql`: item ⋈ inventory window ⋈
    * store_sales, GROUP BY item attributes = dedup). The EXISTS
    * decorrelates to a semi join keyed on partkey — dim-driven, fact
    * probed once.
    */
  val q82ItemAvail: QueryDef = sameSql("tpcds_q82_item_avail",
    s"""SELECT p_partkey, p_name, p_retailprice
       |FROM part
       |WHERE p_retailprice BETWEEN 905 AND 915
       |  AND p_size IN (5, 10, 15, 20, 25)
       |  AND EXISTS (SELECT 1 FROM lineitem
       |              WHERE l_partkey = p_partkey
       |                AND l_shipdate BETWEEN DATE '1996-01-01'
       |                                   AND DATE '1996-03-01'
       |                AND l_quantity BETWEEN 10 AND 40)
       |GROUP BY p_partkey, p_name, p_retailprice
       |ORDER BY p_partkey
       |LIMIT 100""".stripMargin)

  /** q85 shape: the join predicate itself is a disjunction of BANDS —
    * (balance band × quantity band) triples OR'd together, so no single
    * conjunct is pushable and selectivity estimation must sum the arms
    * (`/root/reference/tpcds/q85.sql`'s marital/education ×
    * sales-price bands).
    */
  val q85BandedOr: QueryDef = sameSql("tpcds_q85_banded_or",
    s"""SELECT o_orderpriority,
       |  COUNT(*) AS cnt,
       |  ${davg("l_discount", 4)} AS avg_disc
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE l_returnflag = 'R'
       |  AND ((c_acctbal BETWEEN 0 AND 3000
       |        AND l_quantity BETWEEN 1 AND 15)
       |    OR (c_acctbal BETWEEN 3000 AND 6000
       |        AND l_quantity BETWEEN 16 AND 30)
       |    OR (c_acctbal BETWEEN 6000 AND 10000
       |        AND l_quantity BETWEEN 31 AND 50))
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin)

  /** q90 shape: the ratio of two scalar aggregates over disjoint time
    * slices of the same stream (`/root/reference/tpcds/q90.sql`: am/pm
    * web-page counts). Two tiny scalar subquery results cross-joined —
    * each slice aggregates map-side; the join moves two rows.
    */
  val q90AmPm: QueryDef = sameSql("tpcds_q90_am_pm_ratio",
    s"""SELECT CAST(am.cnt AS DOUBLE) / pm.cnt AS am_pm_ratio
       |FROM (SELECT COUNT(*) AS cnt FROM events
       |      WHERE EXTRACT(HOUR FROM ts) BETWEEN 8 AND 11) am,
       |     (SELECT COUNT(*) AS cnt FROM events
       |      WHERE EXTRACT(HOUR FROM ts) BETWEEN 19 AND 22) pm""".stripMargin)

  /** q94/q95 shape: order-level shipping audit — lines whose order has
    * at least one OTHER line from a DIFFERENT supplier (correlated
    * self-EXISTS with an inequality) and no returned line (correlated
    * NOT EXISTS), rolled into COUNT(DISTINCT order) + exact totals
    * (`/root/reference/tpcds/q94.sql`: multi-warehouse shipped,
    * never-returned web orders).
    */
  val q94SelfExists: QueryDef = sameSql("tpcds_q94_ship_audit",
    s"""SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT)
       |    AS order_count,
       |  ${dsum("l1.l_extendedprice", 2)} AS total_price
       |FROM lineitem l1
       |JOIN orders ON l1.l_orderkey = o_orderkey
       |WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-01'
       |  AND o_orderpriority = '1-URGENT'
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_returnflag = 'R')""".stripMargin)

  /** q96 shape: a bare COUNT(*) through a chain of selective dimension
    * filters (`/root/reference/tpcds/q96.sql`: hour × demographics ×
    * store). Every dim broadcast, the count computed map-side partial.
    */
  val q96Count: QueryDef = sameSql("tpcds_q96_count_star",
    s"""SELECT COUNT(*) AS cnt
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE EXTRACT(MONTH FROM l_shipdate) = 8
       |  AND l_quantity >= 30
       |  AND c_mktsegment = 'MACHINERY'
       |  AND n_name IN ('NATION_2', 'NATION_12', 'NATION_22')""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    q3StarTopk, q7MultiAvg, q15OrDims, q19CrossDimNeq, q21BeforeAfter,
    q25SalesReturns, q35MultiExists, q69NotExists, q82ItemAvail,
    q85BandedOr, q90AmPm, q94SelfExists, q96Count)
}
