package graft.queries

import graft.QueryDef
import graft.QueryDef.sameSql
import Sql._

/** Extended subquery battery mined from the reference's ~300-case corpus
  * (`/root/reference/test/UnitTest.cs:914-1407`): subqueries in HAVING,
  * disjunctive EXISTS pairs, inequality correlation, scalar subqueries on
  * both comparison sides, three-level nesting, and subqueries inside
  * derived tables. All decorrelated by Catalyst's RewritePredicateSubquery
  * / DecorrelateInnerQuery — the machinery the reference hand-rolls in
  * subquery.cs.
  */
object SubqueryBattery {

  /** Subquery in the HAVING clause. Threshold is total/26.0: with 25
    * nations the per-nation mean is total/25, so "above total/26" keeps
    * roughly the above-average half at every scale factor (15 rows at
    * sf0.01) — the old total/20 returned 0 rows from sf0.01 up, a vacuous
    * hash match (round-9 verdict finding #1).
    */
  val inHaving: QueryDef = sameSql("subq_in_having",
    """SELECT c_nationkey, COUNT(*) AS cnt
      |FROM customer
      |GROUP BY c_nationkey
      |HAVING COUNT(*) > (SELECT COUNT(*) / 26.0 FROM customer)""".stripMargin)

  /** EXISTS OR EXISTS — two mark joins under a disjunction. */
  val existsOrExists: QueryDef = sameSql("subq_exists_or_exists",
    """SELECT COUNT(*) AS cnt FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |   OR EXISTS (SELECT 1 FROM supplier s
      |              WHERE s.s_nationkey = c.c_nationkey AND s.s_acctbal > 9900)""".stripMargin)

  /** Correlated EXISTS with an inequality correlation predicate. */
  val corrInequality: QueryDef = sameSql("subq_corr_inequality",
    """SELECT c_custkey FROM customer c
      |WHERE c_custkey <= 300
      |  AND EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > c.c_acctbal * 40)""".stripMargin)

  /** Scalar subqueries on both sides of a range predicate. */
  val scalarBothSides: QueryDef = sameSql("subq_scalar_both_sides",
    s"""SELECT COUNT(*) AS cnt FROM customer
       |WHERE (SELECT MIN(s_acctbal) FROM supplier) < c_acctbal
       |  AND c_acctbal < (SELECT ${davg("s_acctbal")} FROM supplier)""".stripMargin)

  /** Three-level nesting: scalar inside IN inside EXISTS. The inner
    * threshold is avg*1.9 — avg*2 exceeds every order's totalprice from
    * sf0.01 up (0-row vacuous match, round-9 verdict finding #1); 1.9
    * keeps the tail non-empty at every scale factor while staying
    * selective at sf0.001 (22 of 25 nations).
    */
  val threeLevel: QueryDef = sameSql("subq_three_level",
    s"""SELECT n_name FROM nation n
       |WHERE EXISTS (
       |  SELECT 1 FROM customer c
       |  WHERE c.c_nationkey = n.n_nationkey
       |    AND c.c_custkey IN (
       |      SELECT o_custkey FROM orders o
       |      WHERE o.o_totalprice > (SELECT ${davg("o2.o_totalprice")} * 1.9
       |                              FROM orders o2)))""".stripMargin)

  /** Subquery inside a derived table, re-aggregated outside. */
  val inDerived: QueryDef = sameSql("subq_in_derived",
    s"""SELECT seg, COUNT(*) AS n_above
       |FROM (
       |  SELECT c_mktsegment AS seg, c_custkey
       |  FROM customer
       |  WHERE c_acctbal > (SELECT ${davg("c2.c_acctbal")} FROM customer c2)
       |) GROUP BY seg""".stripMargin)

  /** Correlated scalar subquery used inside an expression (arithmetic on
    * the subquery result).
    */
  val scalarInExpr: QueryDef = sameSql("subq_scalar_in_expr",
    """SELECT s_suppkey, s_acctbal,
      |  s_acctbal - (SELECT MAX(c_acctbal) FROM customer c
      |               WHERE c.c_nationkey = s.s_nationkey) AS gap
      |FROM supplier s
      |WHERE s_suppkey <= 50""".stripMargin)

  /** NOT EXISTS + EXISTS conjunction (anti and semi join on one query). */
  val semiAntiMix: QueryDef = sameSql("subq_semi_anti_mix",
    """SELECT COUNT(*) AS cnt FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_totalprice > 400000)""".stripMargin)

  // ——— round-8 widening: the decorrelation shapes the reference's
  // Subquery class exercises that the battery above did not yet cover
  // (`UnitTest.cs:914-1407`): multi-level nested correlation through
  // middle aliases and derived tables, correlated HAVING, EXISTS
  // chains, subqueries under OR, correlated aggregates in the SELECT
  // list. All run through Catalyst's DecorrelateInnerQuery — the exact
  // machinery whose edge cases live in these shapes.

  /** EXISTS with an arithmetic (non-equi) correlation predicate mixing
    * inner and outer columns (`where b.a3>=a.a1+b.a1+1`). Decorrelates
    * to an existence join with a non-equi condition.
    */
  val existsArithCorr: QueryDef = sameSql("subq_exists_arith_corr",
    """SELECT c_custkey FROM customer c
      |WHERE c_custkey <= 200
      |  AND EXISTS (SELECT 1 FROM supplier s
      |              WHERE s.s_acctbal > c.c_acctbal + s.s_suppkey)""".stripMargin)

  /** Two NOT EXISTS conjuncts — double anti join on one query block. */
  val notExistsPair: QueryDef = sameSql("subq_not_exists_pair",
    """SELECT COUNT(*) AS cnt FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')""".stripMargin)

  /** EXISTS OR plain predicate — the mark join must survive the
    * disjunction (`exists (...) or a2>2`).
    */
  val existsOrPred: QueryDef = sameSql("subq_exists_or_pred",
    """SELECT c_custkey FROM customer c
      |WHERE c_custkey <= 300
      |  AND (EXISTS (SELECT 1 FROM orders o
      |               WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |       OR c.c_acctbal < 0)""".stripMargin)

  /** Aggregation over a derived table whose body is an EXISTS-OR filter
    * (`select a2/2, count(*) from (... exists ... or ...) group by`).
    */
  val existsDerivedGrouped: QueryDef = sameSql("subq_exists_derived_grouped",
    """SELECT seg, COUNT(*) AS cnt FROM (
      |  SELECT c_mktsegment AS seg FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o
      |                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
      |     OR c.c_acctbal < -900
      |) GROUP BY seg""".stripMargin)

  /** Three chained correlated EXISTS, each correlated to the level
    * above (customer→orders→lineitem→part) — the reference's deepest
    * exists chain (3 mark joins).
    */
  val existsChain3: QueryDef = sameSql("subq_exists_chain3",
    """SELECT c_custkey FROM customer c
      |WHERE c_custkey <= 120
      |  AND EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |      AND EXISTS (
      |        SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      |          AND EXISTS (
      |            SELECT 1 FROM part p
      |            WHERE p.p_partkey = l.l_partkey AND p.p_size > 48)))""".stripMargin)

  /** Correlated IN: the subquery body itself references the outer row
    * in addition to the IN test (`a2 in (select b2 from b where b1 = a1
    * and b3 > 2) and a1 > 0`).
    */
  val inCorrExtra: QueryDef = sameSql("subq_in_corr_extra",
    """SELECT c_custkey FROM customer c
      |WHERE c.c_nationkey IN (SELECT s.s_nationkey FROM supplier s
      |                        WHERE s.s_acctbal > c.c_acctbal AND s.s_suppkey <= 40)
      |  AND c.c_custkey <= 250""".stripMargin)

  /** Correlated scalar nested INSIDE a correlated scalar, the inner one
    * correlated to the MIDDLE alias (the reference's "deep vars" family,
    * `b1 = (select b1 from b where ... bo.b3 ...)`). Note a deliberate
    * divergence: the reference also resolves outer refs 2+ levels up
    * (`... = a3` inside bo's subquery); Spark's analyzer resolves outer
    * references one level only, so the chain correlates transitively
    * (inner→middle→outer) — same decorrelation depth, legal dialect.
    */
  val scalarTwoLevelCorr: QueryDef = sameSql("subq_scalar_two_level",
    """SELECT n_nationkey FROM nation n
      |WHERE n.n_nationkey = (
      |  SELECT s.s_nationkey FROM supplier s
      |  WHERE s.s_nationkey = n.n_nationkey
      |    AND s.s_suppkey = (SELECT MIN(s2.s_suppkey) FROM supplier s2
      |                       WHERE s2.s_nationkey = s.s_nationkey))""".stripMargin)

  /** Two correlated scalar subqueries ANDed in one WHERE (`b.b2 >
    * (select ...) and b.b1 > (select ...)` — two single joins).
    */
  val twoCorrScalars: QueryDef = sameSql("subq_two_corr_scalars",
    s"""SELECT s_suppkey FROM supplier s
       |WHERE s.s_acctbal > (SELECT ${davg("c_acctbal")} FROM customer c
       |                     WHERE c.c_nationkey = s.s_nationkey)
       |  AND s.s_suppkey <= (SELECT MAX(s2.s_suppkey) FROM supplier s2
       |                      WHERE s2.s_nationkey = s.s_nationkey)""".stripMargin)

  /** Correlated scalar subquery in the SELECT list of a GROUP BY query,
    * correlated on the grouping column (`select a1, 5+(select b2 from b
    * where b1=a1) from a group by 1`).
    */
  val selectListGroupBy: QueryDef = sameSql("subq_select_list_groupby",
    """SELECT c_nationkey,
      |  COUNT(*) + MIN((SELECT n_regionkey FROM nation
      |                  WHERE n_nationkey = c_nationkey)) AS adj
      |FROM customer c GROUP BY c_nationkey""".stripMargin)

  /** Correlated scalar in the SELECT list that is NULL for non-matching
    * rows (`select ..., (select b3 from b where a1=b2 and b2=3) from a`).
    */
  val selectListNull: QueryDef = sameSql("subq_select_list_null",
    """SELECT p_partkey,
      |  (SELECT s_name FROM supplier s
      |   WHERE s.s_suppkey = p.p_partkey AND s.s_acctbal > 5000) AS sup
      |FROM part p WHERE p_partkey <= 120""".stripMargin)

  /** CORRELATED subquery in HAVING (the uncorrelated case is
    * [[inHaving]]): the group count compared against a per-group
    * supplier count.
    */
  val corrHaving: QueryDef = sameSql("subq_corr_having",
    """SELECT c.c_nationkey, COUNT(*) AS cnt
      |FROM customer c
      |GROUP BY c.c_nationkey
      |HAVING COUNT(*) > 10 * (SELECT COUNT(*) FROM supplier s
      |                        WHERE s.s_nationkey = c.c_nationkey)""".stripMargin)

  /** Scalar subqueries on BOTH comparison sides UNDER OR — the
    * disjunctive variant of [[scalarBothSides]] (correlated left side).
    */
  val bothSidesOr: QueryDef = sameSql("subq_both_sides_or",
    s"""SELECT COUNT(*) AS cnt FROM customer c
       |WHERE (SELECT MIN(o_totalprice) FROM orders o
       |       WHERE o.o_custkey = c.c_custkey)
       |      < (SELECT ${davg("o_totalprice")} / 4 FROM orders)
       |   OR c.c_acctbal < (SELECT MIN(s_acctbal) FROM supplier)""".stripMargin)

  /** Correlated AGGREGATE in the SELECT list (sum over a fact table per
    * outer row), with COALESCE for empty groups.
    */
  val corrAggSelect: QueryDef = sameSql("subq_corr_agg_select",
    s"""SELECT s_suppkey,
       |  COALESCE((SELECT ${dsum("l_quantity")} FROM lineitem l
       |            WHERE l.l_suppkey = s.s_suppkey), 0) AS qty
       |FROM supplier s WHERE s_suppkey <= 30""".stripMargin)

  /** IN-subquery whose body contains a correlated EXISTS (`a1 in
    * (select a2 from a where exists (...)))`).
    */
  val inExistsNested: QueryDef = sameSql("subq_in_exists_nested",
    """SELECT n_name FROM nation n
      |WHERE n.n_nationkey IN (
      |  SELECT c.c_nationkey FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o
      |                WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_totalprice > 450000))""".stripMargin)

  /** Aggregate over a derived table filtered by a scalar subquery
    * correlated to the DERIVED column (`select a1, sum(a12) from
    * (select a1, a1*a2 a12 from a) b where a1 >= (select c1 from c
    * where c1=a1) group by a1`).
    */
  val aggDerivedScalarFilter: QueryDef = sameSql("subq_agg_derived_filter",
    s"""SELECT k, ${dsum("v")} AS sv FROM (
       |  SELECT c_nationkey AS k, c_acctbal AS v, c_custkey AS ck
       |  FROM customer)
       |WHERE ck >= (SELECT MIN(s_suppkey) * 30 FROM supplier
       |             WHERE s_nationkey = k)
       |GROUP BY k""".stripMargin)

  /** Join plus a scalar subquery correlated to ONE join side while the
    * predicate mixes both (`select a1,a2,b2 from b join a on a1=b1
    * where a1-1 < (select a2/2 from a where a2=b2)`).
    */
  val joinPlusScalar: QueryDef = sameSql("subq_join_plus_scalar",
    s"""SELECT o.o_orderkey FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE o.o_orderkey <= 4000
       |  AND o.o_totalprice > (SELECT ${davg("o2.o_totalprice")} FROM orders o2
       |                        WHERE o2.o_custkey = c.c_custkey)""".stripMargin)

  /** Nested derived tables with positional column renames `t(c1)` and
    * re-aggregation at each level (`select e1 from (select d1 from
    * (select sum(a12) from (...) b) c(d1)) d(e1)`).
    */
  val derivedRenameChain: QueryDef = sameSql("subq_derived_rename_chain",
    """SELECT e1 + 1 AS e2 FROM (
      |  SELECT d1 FROM (
      |    SELECT CAST(SUM(x) AS BIGINT) FROM (
      |      SELECT c_custkey * 2 AS x FROM customer) b
      |  ) c(d1)
      |) d(e1)""".stripMargin)

  /** Correlation inside BETWEEN bounds — two correlated scalars forming
    * a range predicate.
    */
  val corrBetween: QueryDef = sameSql("subq_corr_between",
    """SELECT c_custkey FROM customer c
      |WHERE c_custkey <= 500
      |  AND c_acctbal BETWEEN (SELECT MIN(s_acctbal) FROM supplier s
      |                         WHERE s.s_nationkey = c.c_nationkey)
      |              AND (SELECT MAX(s_acctbal) FROM supplier s
      |                   WHERE s.s_nationkey = c.c_nationkey)""".stripMargin)

  /** EXISTS whose body is a grouped aggregate with HAVING — existence
    * of a group property, not of a row.
    */
  val existsAggBody: QueryDef = sameSql("subq_exists_agg_body",
    """SELECT s_suppkey FROM supplier s
      |WHERE EXISTS (SELECT l.l_suppkey FROM lineitem l
      |              WHERE l.l_suppkey = s.s_suppkey
      |              GROUP BY l.l_suppkey HAVING COUNT(*) > 620)""".stripMargin)

  /** Scalar subquery over a derived JOIN table in the middle scope,
    * with the innermost scalar correlated to the DERIVED-table column
    * (the reference's `from (select b_2.b1, b_1.b2, b_1.b3 from b b_1,
    * b b_2) bo where ... bo.b3 ...` family; outer refs chain one level
    * per Spark's resolution rule, see [[scalarTwoLevelCorr]]).
    */
  val scalarDerivedMiddle: QueryDef = sameSql("subq_scalar_derived_middle",
    s"""SELECT n.n_nationkey FROM nation n
       |WHERE n.n_nationkey = (
       |  SELECT MIN(bo.k) FROM (
       |    SELECT s1.s_nationkey AS k, s2.s_acctbal AS v
       |    FROM supplier s1 JOIN supplier s2 ON s2.s_suppkey = s1.s_suppkey) bo
       |  WHERE bo.k = n.n_nationkey
       |    AND bo.v > (SELECT ${davg("s3.s_acctbal")} FROM supplier s3
       |                WHERE s3.s_nationkey = bo.k))""".stripMargin)

  /** CORRELATED NOT IN — null-aware anti join whose subquery body also
    * references the outer row (`a2 not in (select b2 from b where
    * b2 = a1)`): the null-aware and decorrelation machineries compose.
    */
  val notInCorr: QueryDef = sameSql("subq_not_in_corr",
    """SELECT c_custkey FROM customer c
      |WHERE c_custkey <= 400
      |  AND c.c_nationkey NOT IN (SELECT s.s_nationkey FROM supplier s
      |                            WHERE s.s_acctbal > c.c_acctbal)""".stripMargin)

  /** Doubly-negated EXISTS (`not not not not exists (...)` in the
    * reference, normalized here to nested NOT) — the negation normalizer
    * must fold before decorrelation picks semi vs anti.
    */
  val notNotExists: QueryDef = sameSql("subq_not_not_exists",
    """SELECT COUNT(*) AS cnt FROM customer c
      |WHERE NOT (NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_custkey = c.c_custkey
      |                         AND o.o_totalprice > 300000))
      |  AND c.c_acctbal > 0""".stripMargin)

  /** Correlated scalar whose BODY is a disjunction of the correlation
    * and a comparison against a nested uncorrelated scalar (`a.a1 =
    * (select b1 from b bo where b2 = a2 or b1 = (select ...) and ...)`).
    * The OR blocks filter pushdown into the subquery, so decorrelation
    * must carry the whole disjunctive filter into the single join.
    */
  val scalarOrNested: QueryDef = sameSql("subq_scalar_or_nested",
    """SELECT n_nationkey FROM nation n
      |WHERE n.n_nationkey = (
      |  SELECT MIN(s.s_nationkey) FROM supplier s
      |  WHERE s.s_nationkey = n.n_nationkey
      |     OR s.s_suppkey = (SELECT MAX(s2.s_suppkey) FROM supplier s2))""".stripMargin)

  /** Triple-nested aggregate-of-aggregate derived chain (`select sum(a1)
    * from (select sum(a1) from (select sum(a1) from a) b(a1)) c(a1)`):
    * each level re-aggregates a 1-row input; the aliases shadow the
    * source column at every level.
    */
  val aggNest3: QueryDef = sameSql("subq_agg_nest3",
    """SELECT CAST(SUM(a1) AS BIGINT) AS s3 FROM (
      |  SELECT SUM(a1) FROM (
      |    SELECT SUM(c_custkey) FROM customer
      |  ) b(a1)
      |) c(a1)""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    inHaving, existsOrExists, corrInequality, scalarBothSides, threeLevel,
    inDerived, scalarInExpr, semiAntiMix,
    existsArithCorr, notExistsPair, existsOrPred, existsDerivedGrouped,
    existsChain3, inCorrExtra, scalarTwoLevelCorr, twoCorrScalars,
    selectListGroupBy, selectListNull, corrHaving, bothSidesOr,
    corrAggSelect, inExistsNested, aggDerivedScalarFilter, joinPlusScalar,
    derivedRenameChain, corrBetween, existsAggBody, scalarDerivedMiddle,
    notInCorr, notNotExists, scalarOrNested, aggNest3)
}
