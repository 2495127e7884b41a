package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}
import Sql._

/** Core relational operator corpus: scans, filters, projections,
  * aggregation, sort/limit, set operations.
  *
  * Mirrors the reference's executor test surface
  * (`/root/reference/test/UnitTest.cs:2507-2995` Executors;
  * `/root/reference/qpmodel/PhysicalNode.cs` operators) — each entry is a
  * named, DuckDB-oracle-checked query exercising one SURVEY §2 row.
  */
object RelationalQueries {

  /** §2.1 table scan + §2.2 projection with filter pushed to parquet. */
  val scanProject: QueryDef = sameSql("scan_project",
    """SELECT p_partkey, p_name, p_retailprice
      |FROM part WHERE p_size > 30""".stripMargin)

  /** §2.2 filter: conjunctive/disjunctive predicate with 3VL NULLs. */
  val filter3vl: QueryDef = sameSql("filter_3vl",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority
      |FROM orders
      |WHERE (o_totalprice > 400000 OR NULLIF(o_orderstatus, 'O') IS NULL)
      |  AND o_orderpriority <> '5-LOW'
      |  AND NOT (o_orderkey % 10 = 3)""".stripMargin)

  /** §2.1 Result: constant select with no FROM (OneRowRelation). */
  val resultConst: QueryDef = sameSql("result_const",
    """SELECT 1 + 2 AS a, concat('x', 'y') AS b,
      |  CAST(3.5 AS DOUBLE) * 2 AS c, NOT (1 > 2) AS d""".stripMargin)

  /** §2.5 sort + limit fused to top-k (TakeOrderedAndProject). */
  val limitTopk: QueryDef = sameSql("limit_topk",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin)

  /** §2.5 sort with mixed ASC/DESC directions. */
  val sortMixed: QueryDef = sameSql("sort_mixed",
    """SELECT c_custkey, c_nationkey, c_acctbal
      |FROM customer
      |ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC
      |LIMIT 50""".stripMargin)

  /** §2.4 hash aggregate: full agg-function battery + HAVING. */
  val aggBasic: QueryDef = sameSql("agg_basic",
    s"""SELECT c_nationkey,
       |  COUNT(*) AS cnt,
       |  ${dsum("c_acctbal")} AS sum_bal,
       |  MIN(c_acctbal) AS min_bal,
       |  MAX(c_acctbal) AS max_bal,
       |  ${davg("c_acctbal")} AS avg_bal
       |FROM customer
       |GROUP BY c_nationkey
       |HAVING COUNT(*) > 10""".stripMargin)

  /** §2.4 empty-input aggregate: count = 0, other aggs NULL. */
  val aggEmpty: QueryDef = sameSql("agg_empty",
    s"""SELECT COUNT(*) AS cnt, COUNT(l_quantity) AS cnt_q,
       |  ${dsum("l_quantity")} AS s, MIN(l_quantity) AS mn,
       |  MAX(l_quantity) AS mx
       |FROM lineitem WHERE l_quantity < 0""".stripMargin)

  /** §2.4 stddev_samp (reference `AggStddevSamp` ExprFunc.cs:711-767). */
  val aggStddev: QueryDef = sameSql("agg_stddev",
    """SELECT l_returnflag,
      |  ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
      |  ROUND(STDDEV_SAMP(l_discount), 6) AS sd_disc
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin)

  /** §2.4 DISTINCT aggregation (parity-plus: reference lacks DISTINCT). */
  val aggDistinct: QueryDef = sameSql("agg_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin)

  /** §2.4 ROLLUP (parity-plus; reference TPC-DS gap). */
  val aggRollup: QueryDef = sameSql("agg_rollup",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
       |  ${dsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)

  /** §2.4 GROUPING SETS (parity-plus). */
  val aggGroupingSets: QueryDef = sameSql("agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)

  /** §2.4 group-by on a computed expression key. */
  val aggExprKey: QueryDef = sameSql("agg_expr_key",
    s"""SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS cnt,
       |  ${dsum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY YEAR(o_orderdate)""".stripMargin)

  /** SELECT DISTINCT (parity-plus; reference grammar lacks it). */
  val selectDistinct: QueryDef = sameSql("select_distinct",
    """SELECT DISTINCT c_nationkey, c_mktsegment
      |FROM customer WHERE c_acctbal > 9000""".stripMargin)

  /** §2.6 UNION ALL (LogicAppend, reference stmt.cs:396-398). */
  val unionAll: QueryDef = sameSql("setop_union_all",
    """SELECT k, COUNT(*) AS cnt FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS k FROM supplier
      |) GROUP BY k""".stripMargin)

  /** §2.6 UNION with dedup. */
  val union: QueryDef = sameSql("setop_union",
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
      |UNION
      |SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000""".stripMargin)

  /** §2.6 EXCEPT (reference: anti-semi join + dedup, stmt.cs:406-419).
    * Supplier side restricted to nationkeys < 20 so nations 20..24 survive
    * the EXCEPT at every scale factor — unfiltered, all 25 nations have
    * suppliers from sf0.01 up and the row was a vacuous 0-row hash match
    * (round-9 verdict finding #1).
    */
  val except: QueryDef = sameSql("setop_except",
    """SELECT n_nationkey AS k FROM nation
      |EXCEPT
      |SELECT s_nationkey AS k FROM supplier WHERE s_nationkey < 20""".stripMargin)

  /** §2.6 INTERSECT (semi join + dedup). */
  val intersect: QueryDef = sameSql("setop_intersect",
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9980
      |INTERSECT
      |SELECT s_nationkey AS k FROM supplier""".stripMargin)

  /** §2.6 EXCEPT ALL (parity-plus: reference throws NotImplemented). */
  val exceptAll: QueryDef = sameSql("setop_except_all",
    """SELECT p, COUNT(*) AS cnt FROM (
      |  SELECT o_orderpriority AS p FROM orders WHERE o_totalprice > 400000
      |  EXCEPT ALL
      |  SELECT o_orderpriority AS p FROM orders WHERE o_totalprice > 430000
      |) GROUP BY p""".stripMargin)

  /** PIVOT: categories to columns (Spark PIVOT syntax; oracle via
    * conditional aggregation — the equivalent relational algebra).
    */
  val aggPivot: QueryDef = sqlDef("agg_pivot",
    """SELECT * FROM (
      |  SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders)
      |PIVOT (
      |  COUNT(o_totalprice) AS cnt
      |  FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))""".stripMargin,
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS f,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS o,
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS p
      |FROM orders GROUP BY o_orderpriority""".stripMargin)

  /** Array aggregation: collect distinct values into a sorted array
    * (deterministic across partitionings). The array is emitted joined to
    * a string: the gate's row hasher cannot canonicalize array cells.
    */
  val aggCollect: QueryDef = sqlDef("agg_collect",
    """SELECT c_nationkey,
      |  ARRAY_JOIN(ARRAY_SORT(COLLECT_SET(c_mktsegment)), ',') AS segs,
      |  SIZE(COLLECT_SET(c_mktsegment)) AS n_segs
      |FROM customer GROUP BY c_nationkey""".stripMargin,
    """SELECT c_nationkey,
      |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs,
      |  len(list(DISTINCT c_mktsegment)) AS n_segs
      |FROM customer GROUP BY c_nationkey""".stripMargin)

  /** UNPIVOT: columns back to rows (oracle via UNION ALL — the
    * equivalent relational algebra).
    */
  val aggUnpivot: QueryDef = sqlDef("agg_unpivot",
    """SELECT o_orderpriority, metric, val FROM (
      |  SELECT o_orderpriority,
      |    COUNT(*) AS n_orders,
      |    COUNT(DISTINCT o_custkey) AS n_custs
      |  FROM orders GROUP BY o_orderpriority)
      |UNPIVOT (val FOR metric IN (n_orders, n_custs))""".stripMargin,
    """WITH agg AS (
      |  SELECT o_orderpriority,
      |    COUNT(*) AS n_orders,
      |    COUNT(DISTINCT o_custkey) AS n_custs
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS val FROM agg
      |UNION ALL
      |SELECT o_orderpriority, 'n_custs' AS metric, n_custs AS val FROM agg""".stripMargin)

  /** LATERAL correlated derived table: top-1 order per customer. */
  val joinLateral: QueryDef = sameSql("join_lateral",
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      |WHERE c.c_custkey <= 100""".stripMargin)

  /** Inline VALUES relation (parity-plus; reference builds constant
    * relations only via no-FROM selects).
    */
  val valuesList: QueryDef = sameSql("values_list",
    """SELECT t.x, t.y, n_name
      |FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) AS t(x, y)
      |JOIN nation ON n_nationkey = t.x""".stripMargin)

  /** GROUPING() indicator distinguishing rollup NULLs from data NULLs. */
  val aggGroupingFn: QueryDef = sameSql("agg_grouping_fn",
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)

  /** §2.2 ProjectSet / set-returning function (reference PhysicProjectSet
    * PhysicalNode.cs:1755-1819, single-SRF expansion): explode duplicates
    * the other columns per generated row.
    */
  val srfExplode: QueryDef = sqlDef("srf_explode",
    """SELECT n_nationkey, s
      |FROM nation LATERAL VIEW explode(sequence(0, n_regionkey)) t AS s""".stripMargin,
    """SELECT n_nationkey, unnest(generate_series(0, n_regionkey)) AS s
      |FROM nation""".stripMargin)

  /** §2.1 sample scan, TABLESAMPLE ROW n analog: deterministic count
    * contract (row content is sampler-dependent, so the oracle checks the
    * cardinality the reference's `RowCntSampling` guarantees,
    * PhysicalNode.cs:1838-1851).
    */
  val sampleScan: QueryDef = QueryDef("sample_scan",
    (spark, dir) => {
      import org.apache.spark.sql.functions.rand
      val n = 300
      graft.catalog.Tables.registerAll(spark, dir)
      val sampled = spark.table("orders").orderBy(rand(42), org.apache.spark.sql.functions.col("o_orderkey")).limit(n)
      sampled.selectExpr("COUNT(*) AS n_rows",
        "COUNT(DISTINCT o_orderkey) AS n_distinct")
    },
    Some("SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_distinct " +
      "FROM (SELECT * FROM orders LIMIT 300)"))

  val defs: Seq[QueryDef] = Seq(
    scanProject, filter3vl, resultConst, limitTopk, sortMixed,
    aggBasic, aggEmpty, aggStddev, aggDistinct, aggRollup,
    aggGroupingSets, aggExprKey, selectDistinct,
    unionAll, union, except, intersect, exceptAll, srfExplode, sampleScan,
    valuesList, aggGroupingFn, aggPivot, aggCollect, aggUnpivot,
    joinLateral)
}
