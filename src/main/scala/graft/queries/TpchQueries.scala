package graft.queries

import graft.QueryDef
import graft.QueryDef.sameSql
import Sql._

/** TPC-H-shaped headline queries, adapted to the driver's testdata schema
  * (TESTDATA.md; no partsupp, prices are DOUBLE, dates are TIMESTAMP).
  *
  * These mirror the reference's TPC-H corpus
  * (`/root/reference/test/regress/expect/tpch0001/`, runner
  * `/root/reference/test/UnitTest.cs:295-355`) — the reference runs 22/22
  * at sf0.001; we run the analogs expressible over the driver's tables and
  * time them in Bench (bench = true).
  *
  * Scale posture: every query is a declarative `spark.sql` plan — filters
  * reach the parquet scan via pushdown, aggregates split partial/final,
  * nation/region joins broadcast (< 10 MB threshold), and the big
  * fact-fact joins (orders ⋈ lineitem) shuffle on the join key where AQE
  * can coalesce / skew-split at runtime.
  */
object TpchQueries {

  /** Q1: pricing summary report — scan + filter + wide hash aggregate. */
  val q1: QueryDef = sameSql("tpch_q1",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsum("l_quantity")} AS sum_qty,
       |  ${dsum("l_extendedprice")} AS sum_base_price,
       |  ${dsum("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
       |  ${dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |  ${davg("l_quantity")} AS avg_qty,
       |  ${davg("l_extendedprice")} AS avg_price,
       |  ${davg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= DATE '2001-06-01'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    bench = true)

  /** Q3: shipping priority — 3-way join + agg + top-k. */
  val q3: QueryDef = sameSql("tpch_q3",
    s"""SELECT l_orderkey,
       |  ${dsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
       |  o_orderdate, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < DATE '1998-01-01'
       |  AND l_shipdate > DATE '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin,
    bench = true)

  /** Q5: local supplier volume — 6-way join with broadcast dims. */
  val q5: QueryDef = sameSql("tpch_q5",
    s"""SELECT n_name,
       |  ${dsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= DATE '1996-01-01'
       |  AND o_orderdate < DATE '1997-01-01'
       |GROUP BY n_name""".stripMargin,
    bench = true)

  /** Q6: revenue forecast — pushed-down range filter + global agg. */
  val q6: QueryDef = sameSql("tpch_q6",
    s"""SELECT ${dsum("l_extendedprice * l_discount", 6)} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= DATE '1996-01-01'
       |  AND l_shipdate < DATE '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin,
    bench = true)

  /** Q10: returned item reporting — join + filter + group + top-k. */
  val q10: QueryDef = sameSql("tpch_q10",
    s"""SELECT c_custkey, c_name,
       |  ${dsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
       |  c_acctbal, n_name
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= DATE '1997-01-01'
       |  AND o_orderdate < DATE '1997-04-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin,
    bench = true)

  /** Q18: large-volume customers — IN subquery over grouped HAVING. */
  val q18: QueryDef = sameSql("tpch_q18",
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  ${dsum("l_quantity")} AS sum_qty
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM lineitem
       |  GROUP BY l_orderkey
       |  -- l_quantity is integer-valued: a plain double sum is exact
       |  HAVING SUM(l_quantity) > 150)
       |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin,
    bench = true)

  val defs: Seq[QueryDef] = Seq(q1, q3, q5, q6, q10, q18)
}
