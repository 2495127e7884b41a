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

  /** Subquery in the HAVING clause. */
  val inHaving: QueryDef = sameSql("subq_in_having",
    """SELECT c_nationkey, COUNT(*) AS cnt
      |FROM customer
      |GROUP BY c_nationkey
      |HAVING COUNT(*) > (SELECT COUNT(*) / 20 FROM customer)""".stripMargin)

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

  /** Three-level nesting: scalar inside IN inside EXISTS. */
  val threeLevel: QueryDef = sameSql("subq_three_level",
    s"""SELECT n_name FROM nation n
       |WHERE EXISTS (
       |  SELECT 1 FROM customer c
       |  WHERE c.c_nationkey = n.n_nationkey
       |    AND c.c_custkey IN (
       |      SELECT o_custkey FROM orders o
       |      WHERE o.o_totalprice > (SELECT ${davg("o2.o_totalprice")} * 2
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

  val defs: Seq[QueryDef] = Seq(
    inHaving, existsOrExists, corrInequality, scalarBothSides, threeLevel,
    inDerived, scalarInExpr, semiAntiMix)
}
