package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}

/** Fifth coverage wave: bitwise/trig expression batteries, ordered and
  * boolean aggregates, INTERSECT ALL, GROUP BY ALL, window defaults /
  * IGNORE NULLS, struct field access.
  */
object Extra2Queries {

  /** Bitwise battery (dialect: Spark `^`/SHIFTLEFT vs DuckDB
    * xor()/`<<`; & and | agree).
    */
  val bitwise: QueryDef = sqlDef("expr_bitwise",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS band,
      |  o_orderkey | 4096 AS bor,
      |  CAST(o_orderkey ^ 1023 AS BIGINT) AS bxor,
      |  SHIFTLEFT(o_orderkey % 1024, 3) AS shl,
      |  SHIFTRIGHT(o_orderkey, 2) AS shr
      |FROM orders WHERE o_orderkey <= 300""".stripMargin,
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS band,
      |  o_orderkey | 4096 AS bor,
      |  CAST(xor(o_orderkey, 1023) AS BIGINT) AS bxor,
      |  (o_orderkey % 1024) << 3 AS shl,
      |  o_orderkey >> 2 AS shr
      |FROM orders WHERE o_orderkey <= 300""".stripMargin)

  /** Trigonometric battery — libm results drift by ulps between JVM and
    * C, so outputs are scale-6 fixed-point BIGINTs (the expr_math2
    * convention).
    */
  val trig: QueryDef = sameSql("expr_trig",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ROUND(SIN(l_quantity / 10) * 1000000) AS BIGINT) AS sin_e6,
      |  CAST(ROUND(COS(l_discount) * 1000000) AS BIGINT) AS cos_e6,
      |  CAST(ROUND(ATAN2(l_quantity, l_linenumber + 1) * 1000000) AS BIGINT) AS at2_e6,
      |  CAST(ROUND(DEGREES(ATAN(l_tax)) * 1000000) AS BIGINT) AS deg_e6
      |FROM lineitem WHERE l_orderkey <= 60""".stripMargin)

  /** Boolean aggregates (standard EVERY/ANY analogs). */
  val boolAgg: QueryDef = sameSql("agg_bool",
    """SELECT l_returnflag,
      |  BOOL_AND(l_quantity > 0) AS all_pos,
      |  BOOL_OR(l_quantity > 49) AS any_big,
      |  BOOL_AND(l_discount < 0.05) AS all_small_disc
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** Ordered-argument aggregates: the value of one column at another's
    * extremum (deterministic here: o_totalprice ties are broken by
    * aggregating the MIN orderkey among ties via a two-level form).
    */
  val minmaxBy: QueryDef = sameSql("agg_minmax_by",
    """SELECT o_orderpriority,
      |  MIN(o_orderkey) FILTER (WHERE o_totalprice = mx) AS best_key,
      |  mx AS max_price
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
      |  FROM orders)
      |GROUP BY o_orderpriority, mx""".stripMargin)

  /** INTERSECT ALL (bag semantics — preserved multiplicity). */
  val intersectAll: QueryDef = sameSql("setop_intersect_all",
    """SELECT k, COUNT(*) AS cnt FROM (
      |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      |  INTERSECT ALL
      |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 8000
      |) GROUP BY k""".stripMargin)

  /** GROUP BY ALL: group on every non-aggregate select item. */
  val groupByAll: QueryDef = sameSql("agg_group_by_all",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
      |  MIN(l_quantity) AS mn
      |FROM lineitem
      |GROUP BY ALL""".stripMargin)

  /** LEAD/LAG with explicit defaults and IGNORE NULLS over a gappy
    * column (dialect: Spark puts IGNORE NULLS after the call, DuckDB
    * inside the argument list).
    */
  val leadLagNulls: QueryDef = sqlDef("winfunc_ignore_nulls",
    """SELECT o_orderkey,
      |  LAG(o_orderkey, 1, -1) OVER w AS prev_or_neg1,
      |  LEAD(o_orderkey, 2, -2) OVER w AS next2_or_neg2,
      |  LAST_VALUE(NULLIF(o_orderstatus, 'O')) IGNORE NULLS OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS UNBOUNDED PRECEDING) AS last_nonnull_status
      |FROM orders WHERE o_custkey <= 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin,
    """SELECT o_orderkey,
      |  LAG(o_orderkey, 1, -1) OVER w AS prev_or_neg1,
      |  LEAD(o_orderkey, 2, -2) OVER w AS next2_or_neg2,
      |  LAST_VALUE(NULLIF(o_orderstatus, 'O') IGNORE NULLS) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS UNBOUNDED PRECEDING) AS last_nonnull_status
      |FROM orders WHERE o_custkey <= 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin)

  /** Struct construction + field access (dialect: named_struct vs
    * struct_pack; both project scalar fields so the gate sees no nested
    * cells).
    */
  val structAccess: QueryDef = sqlDef("expr_struct",
    """SELECT n_nationkey,
      |  (NAMED_STRUCT('name', n_name, 'region', n_regionkey)).name AS sname,
      |  (NAMED_STRUCT('name', n_name, 'region', n_regionkey)).region AS sregion
      |FROM nation""".stripMargin,
    """SELECT n_nationkey,
      |  (struct_pack(name := n_name, region := n_regionkey)).name AS sname,
      |  (struct_pack(name := n_name, region := n_regionkey)).region AS sregion
      |FROM nation""".stripMargin)

  /** RANGE frame keyed by a time interval: trailing-30-day order counts
    * per customer (value-based frames vs the ROWS frames in
    * winfunc_frames).
    */
  val rangeFrame: QueryDef = sameSql("winfunc_range_frame",
    """SELECT o_custkey, o_orderkey,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
      |                 RANGE BETWEEN INTERVAL '30' DAY PRECEDING
      |                 AND CURRENT ROW) AS n_last_30d
      |FROM orders WHERE o_custkey <= 25""".stripMargin)

  /** Rank-fraction analytics: percent_rank/cume_dist are exact dyadic
    * ratios of identical integers in both engines.
    */
  val pctRank: QueryDef = sameSql("winfunc_pct",
    """SELECT c_custkey,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd
      |FROM customer WHERE c_custkey <= 200
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)""".stripMargin)

  /** Linear-regression aggregates (rounded: both engines stream partial
    * sums in different orders; 6 dp is far above the drift).
    */
  val regr: QueryDef = sameSql("agg_regr",
    """SELECT l_returnflag,
      |  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
      |  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS icept,
      |  CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    bitwise, trig, boolAgg, minmaxBy, intersectAll, groupByAll,
    leadLagNulls, structAccess, rangeFrame, pctRank, regr)
}
