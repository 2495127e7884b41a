package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}

/** Sixth coverage wave: relational PIVOT/UNPIVOT and correlated LATERAL
  * subqueries in FROM — the last big ANSI surface items the corpus
  * didn't exercise. Oracles re-derive PIVOT/UNPIVOT with plain
  * conditional aggregation / UNION ALL, proving the semantics rather
  * than relying on the other engine's clause support.
  */
object Extra3Queries {

  /** PIVOT: linestatus columns out of rows. The pivot aggregate stays on
    * exact BIGINTs (integral quantities), so the wide row is
    * order-independent.
    */
  val pivot: QueryDef = sqlDef("relational_pivot",
    """SELECT * FROM (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem)
      |PIVOT (SUM(q) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f))
      |""".stripMargin,
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O'
      |                THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F'
      |                THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** UNPIVOT: order-priority bucket columns back into rows (built over a
    * pivoted inline aggregate, so the query also nests PIVOT-shaped
    * aggregation under UNPIVOT).
    */
  val unpivot: QueryDef = sqlDef("relational_unpivot",
    """SELECT o_orderstatus, metric, val FROM (
      |  SELECT o_orderstatus,
      |    COUNT(*) AS n_orders,
      |    COUNT(DISTINCT o_custkey) AS n_custs
      |  FROM orders GROUP BY o_orderstatus)
      |UNPIVOT (val FOR metric IN (n_orders, n_custs))""".stripMargin,
    """WITH a AS (
      |  SELECT o_orderstatus,
      |    COUNT(*) AS n_orders,
      |    COUNT(DISTINCT o_custkey) AS n_custs
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM a
      |UNION ALL
      |SELECT o_orderstatus, 'n_custs' AS metric, n_custs AS val FROM a"""
      .stripMargin)

  /** Correlated LATERAL subquery in FROM: per-region top-2 nations by
    * customer count — the reference's scalar-subquery machinery can only
    * return one value per row; LATERAL returns a correlated SET
    * (parity-plus). Decorrelated by Catalyst into a ranked join, not a
    * per-row re-execution.
    */
  val lateral: QueryDef = sameSql("join_lateral_topn",
    """SELECT r_name, t.n_name, t.n_custs
      |FROM region,
      |LATERAL (
      |  SELECT n_name, COUNT(c_custkey) AS n_custs
      |  FROM nation JOIN customer ON c_nationkey = n_nationkey
      |  WHERE n_regionkey = r_regionkey
      |  GROUP BY n_name
      |  ORDER BY n_custs DESC, n_name
      |  LIMIT 2
      |) t""".stripMargin)

  /** Spark 4 VARIANT: parse the JSON props column once into the binary
    * variant encoding, then typed path extraction (+ a missing-path probe
    * that must yield NULL, not error). The oracle proves the same values
    * straight off the JSON text.
    */
  val variant: QueryDef = sqlDef("expr_variant",
    """SELECT event_id,
      |  CAST(variant_get(parse_json(props), '$.k') AS INT) AS k_val,
      |  CAST(try_variant_get(parse_json(props), '$.missing') AS INT)
      |    AS miss_val
      |FROM events WHERE event_id <= 200""".stripMargin,
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
      |  CAST(json_extract_string(props, '$.missing') AS INT) AS miss_val
      |FROM events WHERE event_id <= 200""".stripMargin)

  /** CUBE over two dimensions with GROUPING() disambiguation of the
    * generated NULLs (ROLLUP and GROUPING SETS are covered elsewhere;
    * CUBE completes the trio).
    */
  val cube: QueryDef = sameSql("agg_cube",
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)

  /** Ordered string aggregation (dialect pair: Spark spells it as a
    * sorted collect_list join, DuckDB as string_agg ORDER BY).
    */
  val stringAgg: QueryDef = sqlDef("agg_string_agg",
    """SELECT r_name,
      |  CONCAT_WS(',', SORT_ARRAY(COLLECT_LIST(n_name))) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin,
    """SELECT r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin)

  /** COUNT_IF — the conditional-count shorthand both engines ship. */
  val countIf: QueryDef = sameSql("agg_count_if",
    """SELECT l_returnflag,
      |  CAST(COUNT_IF(l_discount > 0.05) AS BIGINT) AS n_discounted,
      |  CAST(COUNT_IF(l_quantity >= 25) AS BIGINT) AS n_bulk
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** Error-safe expression variants: TRY_ functions yield NULL where the
    * strict forms would error (ANSI) or diverge between engines
    * (Spark's double/0 is NULL, DuckDB's is inf — try_divide pins the
    * NULL behavior; DuckDB spells the same contracts with TRY_CAST and
    * NULLIF).
    */
  val tryExprs: QueryDef = sqlDef("expr_try",
    """SELECT o_orderkey,
      |  TRY_DIVIDE(o_totalprice, o_orderkey % 3) AS safe_div,
      |  TRY_CAST(o_orderpriority AS INT) AS bad_cast,
      |  TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS num_cast
      |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    """SELECT o_orderkey,
      |  o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div,
      |  TRY_CAST(o_orderpriority AS INT) AS bad_cast,
      |  TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS num_cast
      |FROM orders WHERE o_orderkey <= 100""".stripMargin)

  val defs: Seq[QueryDef] = Seq(pivot, unpivot, lateral, variant, cube,
    stringAgg, countIf, tryExprs)
}
