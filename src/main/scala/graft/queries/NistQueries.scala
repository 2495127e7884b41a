package graft.queries

import graft.QueryDef
import graft.QueryDef.sameSql

/** NIST SQL conformance subset (the reference ports dml001-dml073 as
  * `/root/reference/test/NistTests.cs:176-190` over its STAFF/WORKS/PROJ
  * fixture, `NistTests.cs:36-141`). Same fixture, same query shapes, as
  * inline VALUES CTEs so both engines evaluate the identical five-row
  * tables — including the three queries the reference runs with
  * assertions SUPPRESSED because its engine returns wrong results
  * (NOT BETWEEN, `NOT (x BETWEEN ...)`, and the relational-division
  * double NOT EXISTS, `NistTests.cs:264-285,352-368`): those run
  * asserted here.
  */
object NistQueries {

  /** STAFF/WORKS/PROJ + VTABLE fixture as a WITH prefix (both dialects
    * accept `(VALUES ...) AS t(cols)`).
    */
  private val fixture =
    """staff AS (SELECT * FROM (VALUES
      |    ('E1', 'Alice', 12, 'Deale'),
      |    ('E2', 'Betty', 10, 'Vienna'),
      |    ('E3', 'Carmen', 13, 'Vienna'),
      |    ('E4', 'Don', 12, 'Deale'),
      |    ('E5', 'Ed', 13, 'Akron')) AS s(empnum, empname, grade, city)),
      |works AS (SELECT * FROM (VALUES
      |    ('E1', 'P1', 40), ('E1', 'P2', 20), ('E1', 'P3', 80),
      |    ('E1', 'P4', 20), ('E1', 'P5', 12), ('E1', 'P6', 12),
      |    ('E2', 'P1', 40), ('E2', 'P2', 80), ('E3', 'P2', 20),
      |    ('E4', 'P2', 20), ('E4', 'P4', 40), ('E4', 'P5', 80)
      |  ) AS w(empnum, pnum, hours)),
      |proj AS (SELECT * FROM (VALUES
      |    ('P1', 'MXSS', 'Design', 10000, 'Deale'),
      |    ('P2', 'CALM', 'Code', 30000, 'Vienna'),
      |    ('P3', 'SDP', 'Test', 30000, 'Tampa'),
      |    ('P4', 'SDP', 'Design', 20000, 'Deale'),
      |    ('P5', 'IRM', 'Test', 10000, 'Vienna'),
      |    ('P6', 'PAYR', 'Design', 50000, 'Deale')
      |  ) AS p(pnum, pname, ptype, budget, city))""".stripMargin

  private def nist(name: String, body: String): QueryDef =
    sameSql(name, s"WITH $fixture\n$body")

  /** dml001: ordinal + mixed-direction ORDER BY with a deterministic
    * LIMIT (`NistTests.cs:191-218`).
    */
  val dml001: QueryDef = nist("nist_dml001_orderby",
    """SELECT empnum, hours FROM works
      |WHERE pnum = 'P2'
      |ORDER BY 2 DESC, empnum DESC
      |LIMIT 3""".stripMargin)

  /** dml013: scalar aggregate arithmetic (`NistTests.cs:219-236`). */
  val dml013Sum: QueryDef = nist("nist_dml013_sum_arith",
    """SELECT CAST(SUM(hours) AS BIGINT) + 10 AS s
      |FROM works WHERE pnum = 'P2'""".stripMargin)

  /** dml013: uncorrelated MAX scalar subquery in WHERE
    * (`NistTests.cs:237-245`).
    */
  val dml013Max: QueryDef = nist("nist_dml013_max_grade",
    """SELECT empnum FROM staff
      |WHERE grade = (SELECT MAX(grade) FROM staff)""".stripMargin)

  /** dml014: NOT BETWEEN and its NOT(...) spelling — the reference
    * returns 4 rows instead of 1 and suppresses both assertions
    * (`NistTests.cs:264-285` "BUG ... Suppress Asserts for now");
    * asserted green here: both forms must agree and yield Vienna.
    */
  val dml014NotBetween: QueryDef = nist("nist_dml014_not_between",
    """SELECT a.city AS city_a, b.city AS city_b
      |FROM (SELECT city FROM staff WHERE grade NOT BETWEEN 12 AND 13) a
      |JOIN (SELECT city FROM staff WHERE NOT (grade BETWEEN 12 AND 13)) b
      |  ON a.city = b.city""".stripMargin)

  /** dml014: two-level IN chain staff→works→proj('Tampa')
    * (`NistTests.cs:289-301`).
    */
  val dml014InChain: QueryDef = nist("nist_dml014_in_chain",
    """SELECT staff.empname FROM staff
      |WHERE staff.empnum IN
      |  (SELECT works.empnum FROM works
      |   WHERE works.pnum IN
      |     (SELECT proj.pnum FROM proj WHERE proj.city = 'Tampa'))""".stripMargin)

  /** dml014: NOT IN subquery and its NOT(... IN ...) spelling must agree
    * (`NistTests.cs:303-345`).
    */
  val dml014NotIn: QueryDef = nist("nist_dml014_not_in",
    """SELECT a.hours AS hours_a, b.hours AS hours_b
      |FROM (SELECT hours FROM works
      |      WHERE pnum NOT IN (SELECT pnum FROM proj
      |                         WHERE budget BETWEEN 5000 AND 40000)) a
      |JOIN (SELECT hours FROM works
      |      WHERE NOT (pnum IN (SELECT pnum FROM proj
      |                          WHERE budget BETWEEN 5000 AND 40000))) b
      |  ON a.hours = b.hours""".stripMargin)

  /** dml014: relational division — staff working on EVERY project. The
    * NIST original is a double NOT EXISTS whose innermost block
    * correlates TWO levels out (`NistTests.cs:352-368`); the reference
    * returns 5 rows instead of 1 and suppresses the assert, and Spark's
    * decorrelation rejects two-level outer references outright. Same
    * semantics, one correlation level: materialize the missing
    * (employee, project) pairs with EXCEPT and anti-test those. Must
    * return exactly Alice.
    */
  val dml014Division: QueryDef = nist("nist_dml014_division",
    """, missing AS (
      |  SELECT s.empnum, p.pnum FROM staff s CROSS JOIN proj p
      |  EXCEPT
      |  SELECT empnum, pnum FROM works)
      |SELECT staff.empname FROM staff
      |WHERE NOT EXISTS
      |  (SELECT 1 FROM missing WHERE missing.empnum = staff.empnum)""".stripMargin)

  /** dml018: HAVING over string-compared groups (`NistTests.cs:367-380`). */
  val dml018Having: QueryDef = nist("nist_dml018_having",
    """SELECT pnum FROM works
      |WHERE pnum > 'P1'
      |GROUP BY pnum
      |HAVING COUNT(*) > 1""".stripMargin)

  /** dml018: HAVING ... IN (grouped HAVING subquery)
    * (`NistTests.cs:392-401`).
    */
  val dml018HavingIn: QueryDef = nist("nist_dml018_having_in",
    """SELECT works.pnum FROM works
      |GROUP BY works.pnum
      |HAVING works.pnum IN (SELECT proj.pnum FROM proj
      |                      GROUP BY proj.pnum
      |                      HAVING SUM(proj.budget) > 25000)""".stripMargin)

  /** dml022: comparison against AVG-derived scalar
    * (`NistTests.cs:437-446`).
    */
  val dml022Avg: QueryDef = nist("nist_dml022_avg_scalar",
    """SELECT empnum, empname, grade, city FROM staff
      |WHERE grade <= (SELECT AVG(grade) - 1 FROM staff)""".stripMargin)

  /** dml022: six-level nested IN chain (`NistTests.cs:472-496`). */
  val dml022Nested: QueryDef = nist("nist_dml022_nested6",
    """SELECT empnum, empname FROM staff
      |WHERE empnum IN
      |  (SELECT empnum FROM works
      |   WHERE pnum IN
      |     (SELECT pnum FROM proj
      |      WHERE ptype IN
      |        (SELECT ptype FROM proj
      |         WHERE pnum IN
      |           (SELECT pnum FROM works
      |            WHERE empnum IN
      |              (SELECT empnum FROM works
      |               WHERE pnum IN
      |                 (SELECT pnum FROM proj
      |                  WHERE ptype = 'Design'))))))""".stripMargin)

  /** dml023: scalar-subquery equality on a dimension attribute
    * (`NistTests.cs:520-529`).
    */
  val dml023City: QueryDef = nist("nist_dml023_city_eq",
    """SELECT pnum FROM proj
      |WHERE proj.city = (SELECT staff.city FROM staff
      |                   WHERE empnum = 'E1')""".stripMargin)

  /** dml059: grouped MIN/MAX over column arithmetic on the VTABLE
    * fixture incl. its NULL row (`NistTests.cs:531-560`, fixture
    * `NistTests.cs:152-175` plus dml059's two inserts).
    */
  val dml059Arith: QueryDef = sameSql("nist_dml059_group_arith",
    """WITH vtable AS (SELECT * FROM (VALUES
      |    (10, 20, 30, 40), (0, 1, 2, 3), (100, 200, 300, 400),
      |    (1000, -2000, 3000, CAST(NULL AS INT)),
      |    (10, 11, 12, 13), (100, 111, 1112, 113)
      |  ) AS v(col1, col2, col3, col4))
      |SELECT col1, MAX(col2 + col3) AS mx, MIN(col3 - col2) AS mn
      |FROM vtable
      |GROUP BY col1""".stripMargin)

  /** dml073 part 1: scalar AVG/MIN over a filtered join
    * (`NistTests.cs:624-635`; expected AVG=60, MIN=40).
    */
  val dml073JoinAgg: QueryDef = nist("nist_dml073_join_agg",
    """SELECT AVG(hours) AS avg_h, MIN(hours) AS min_h
      |FROM staff, works
      |WHERE staff.empnum = 'E2'
      |  AND staff.empnum = works.empnum""".stripMargin)

  /** dml073 part 2: grouped AVG/MIN over an IN-filtered join with
    * HAVING COUNT(*) > 1 (`NistTests.cs:637-654`).
    */
  val dml073HavingCount: QueryDef = nist("nist_dml073_having_count",
    """SELECT staff.empnum, AVG(hours) AS avg_h, MIN(hours) AS min_h
      |FROM staff, works
      |WHERE staff.empnum IN ('E1', 'E4', 'E3')
      |  AND staff.empnum = works.empnum
      |GROUP BY staff.empnum
      |HAVING COUNT(*) > 1""".stripMargin)

  /** dml073 part 3 (TEST:0418): aggregates over a self CROSS JOIN with a
    * NULL-carrying column — COUNT skips T1 nulls per pair, SUM counts T2
    * non-nulls across all pairs (`NistTests.cs:656-672`).
    */
  val dml073CrossAgg: QueryDef = sameSql("nist_dml073_cross_agg",
    """WITH vtable AS (SELECT * FROM (VALUES
      |    (10, 20, 30, 40), (0, 1, 2, 3), (100, 200, 300, 400),
      |    (1000, -2000, 3000, CAST(NULL AS INT))
      |  ) AS v(col1, col2, col3, col4))
      |SELECT AVG(t1.col4) AS a1, AVG(t1.col4 + t2.col4) AS a2,
      |  CAST(SUM(t2.col4) AS BIGINT) AS s2, COUNT(t1.col4) AS c1
      |FROM vtable t1, vtable t2""".stripMargin)

  /** dml075 (TEST:0434): HAVING EXISTS whose correlated subquery
    * compares the OUTER aggregate against an inner column. The reference
    * cannot run it at all ("no aggregation allowed in WHERE condition",
    * `NistTests.cs:674-698` — the whole test is #if'd out); both engines
    * here resolve the outer SUM inside the EXISTS. Expected P1=80,
    * P5=92.
    */
  val dml075HavingExists: QueryDef = nist("nist_dml075_having_exists",
    """SELECT pnum, CAST(SUM(hours) AS BIGINT) AS sum_hours FROM works
      |GROUP BY pnum
      |HAVING EXISTS (SELECT pname FROM proj
      |               WHERE proj.pnum = works.pnum AND
      |                     SUM(works.hours) > proj.budget / 200)"""
      .stripMargin)

  val defs: Seq[QueryDef] = Seq(
    dml001, dml013Sum, dml013Max, dml014NotBetween, dml014InChain,
    dml014NotIn, dml014Division, dml018Having, dml018HavingIn,
    dml022Avg, dml022Nested, dml023City, dml059Arith,
    dml073JoinAgg, dml073HavingCount, dml073CrossAgg,
    dml075HavingExists)
}
