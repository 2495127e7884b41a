package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference-plan shape parser ([[JobenchPlan.parseReferenceShape]])
  * against qpmodel's plan-text conventions — in particular the
  * expression-hosted subquery fragments (`<ScalarSubqueryExpr>` /
  * `<InSubqueryExpr>` marker lines with the fragment's plan nested one
  * level deeper) that the pre-r15 parser silently DROPPED along with
  * every node printed after them: six tpch1 goldens (q11 q15 q16 q18
  * q20 q22) compared as truncated or empty trees, so their `diverges`
  * verdicts in TPCH1.md were computed against garbage. Fixture lines
  * mirror the `/root/reference/test/regress/expect/tpch1` plan texts.
  */
class ReferenceShapeSpec extends AnyFunSuite {

  private def shape(lines: String*): Option[String] =
    JobenchPlan.parseReferenceShape(lines.toList)

  test("plain binary join tree, orientation-insensitively sorted") {
    assert(shape(
      "PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable orders (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable customer (inccost=1, cost=1, rows=1)"
    ).contains("(customer,orders)"))
  }

  test("scan alias reduces to the base table") {
    assert(shape(
      "PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable lineitem as lineitem__1 (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable lineitem (inccost=1, cost=1, rows=1)"
    ).contains("(lineitem,lineitem)"))
  }

  test("a scan-hosted subquery fragment combines with the host like a " +
    "join child (q16's NOT-IN supplier probe)") {
    // expect/tpch1/q16.txt:39-49 structure
    assert(shape(
      "PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable part (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable partsupp (inccost=1, cost=1, rows=1)",
      "        <InSubqueryExpr> cached 1",
      "            -> PhysicScanTable supplier (inccost=1, cost=1, rows=1)"
    ).contains("((partsupp,supplier),part)"))
  }

  test("nodes AFTER a hosted fragment are kept (the pre-r15 truncation)") {
    // q18's shape: the lineitem sibling follows the orders scan's
    // IN-fragment; the old parser lost it and read (customer,orders).
    assert(shape(
      "PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "    -> PhysicScanTable customer (inccost=1, cost=1, rows=1)",
      "    -> PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "        -> PhysicScanTable orders (inccost=1, cost=1, rows=1)",
      "            <InSubqueryExpr> cached 1",
      "                -> PhysicHashAgg  (inccost=1, cost=1, rows=1)",
      "                    -> PhysicScanTable lineitem as lineitem__1 (inccost=1, cost=1, rows=1)",
      "        -> PhysicScanTable lineitem (inccost=1, cost=1, rows=1)"
    ).contains("(((lineitem,orders),lineitem),customer)"))
  }

  test("a fragment hosted on a non-scan node (q11's HAVING scalar " +
    "subquery on the aggregate) and printed BEFORE the plan child") {
    assert(shape(
      "PhysicHashAgg  (inccost=1, cost=1, rows=1)",
      "    <ScalarSubqueryExpr> cached 1",
      "        -> PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "            -> PhysicScanTable nation as nation__1 (inccost=1, cost=1, rows=1)",
      "            -> PhysicScanTable supplier as supplier__1 (inccost=1, cost=1, rows=1)",
      "    -> PhysicHashJoin  (inccost=1, cost=1, rows=1)",
      "        -> PhysicScanTable nation (inccost=1, cost=1, rows=1)",
      "        -> PhysicScanTable supplier (inccost=1, cost=1, rows=1)"
    ).contains("((nation,supplier),(nation,supplier))"))
  }

  test("nested fragments: a subquery inside a subquery's plan (q20)") {
    // expect/tpch1/q20.txt:51-69 — partsupp hosts an IN over part,
    // INSIDE the supplier-hosted IN fragment.
    assert(shape(
      "PhysicScanTable supplier (inccost=1, cost=1, rows=1)",
      "    <InSubqueryExpr> cached 1",
      "        -> PhysicHashJoin Left (inccost=1, cost=1, rows=1)",
      "            -> PhysicScanTable partsupp (inccost=1, cost=1, rows=1)",
      "                <InSubqueryExpr> cached 2",
      "                    -> PhysicScanTable part (inccost=1, cost=1, rows=1)",
      "            -> PhysicHashAgg  (inccost=1, cost=1, rows=1)",
      "                -> PhysicScanTable lineitem (inccost=1, cost=1, rows=1)"
    ).contains("(((part,partsupp),lineitem),supplier)"))
  }

  test("the six subquery-bearing tpch1 goldens parse to complete trees " +
    "(no '?' leaves, every base relation present)") {
    val expect = Map(
      "q11" -> "(((nation,supplier),partsupp),((nation,supplier),partsupp))",
      "q15" -> "((lineitem,supplier),lineitem)",
      "q16" -> "((partsupp,supplier),part)",
      "q18" -> "(((lineitem,orders),lineitem),customer)",
      "q20" -> "((((part,partsupp),lineitem),supplier),nation)",
      "q22" -> "((customer,customer),orders)")
    expect.foreach { case (q, want) =>
      val got = JobenchPlan.referenceShape(Tpch1Plan.ExpectDir, q)
      assert(got.contains(want), s"$q: got $got, want $want")
    }
  }
}
