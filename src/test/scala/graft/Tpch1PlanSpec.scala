package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Gate for the sf1 plan-golden parity audit (see [[Tpch1Plan]]): the
  * reference's `TestTpchAndComparePlan("1", …)` plans TPC-H q01–q22
  * data-free from its serialized sf1 statistics and pins the plan text
  * under `test/regress/expect/tpch1/` (`/root/reference/test/
  * UnitTest.cs:541-575`). This suite replays the same setup through
  * Catalyst and pins what must stay true:
  *
  *   - every query plans, every leaf carries the injected sf1 stats,
  *     every broadcast build is under threshold;
  *   - the queries whose canonical join TREE matches the reference's
  *     memo plan exactly stay matching — the shapes where the two cost
  *     models agree, including (r15) the subquery-bearing q11/q16/q22
  *     whose expression-hosted fragments canonicalize as a combination
  *     with their host on both engines;
  *   - the two estimators' root-cardinality agreement (gmean q-error
  *     under identical statistics) stays bounded.
  */
class Tpch1PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Isolated session: the shared-JVM suite run mutates session confs
  // (broadcast thresholds, aggregate modes) that this audit's plans are
  // sensitive to; newSession() resets SQLConf to the builder values.
  // DELIBERATELY a bare clone with no re-registration call (r15): the
  // clone drops experimental.extraOptimizations, and the q05
  // containment-tree assertion below is the proof that the
  // extensions-injected installer (GraftExtensions →
  // ensurePostReorderRules on analysis) restores the post-reorder rules
  // on its own — the r14 footgun where a bare newSession() silently
  // graded a lesser engine is structurally closed.
  private lazy val spark = GraftSession.local(4).newSession()
  private lazy val rows = Tpch1Plan.runAll(spark)
  private def audits = rows.map(_.audit)

  override def afterAll(): Unit = () // shared session owned by the suite run

  test("all 22 queries plan data-free from the reference's sf1 statistics") {
    val errs = audits.filter(_.err.isDefined)
    assert(errs.isEmpty, s"failed: ${errs.map(a => a.name -> a.err)}")
    assert(audits.size == 22)
  }

  test("every leaf scan plans from injected sf1 stats, never the empty-table fallback") {
    val bad = audits.filter(a => a.leavesWithStats != a.relations)
    assert(bad.isEmpty, s"stat-less leaves in: ${bad.map(_.name)}")
  }

  test("no broadcast build side is estimated above the configured threshold") {
    val threshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong
    val bad = audits.filter(_.maxBroadcastBytes > threshold)
    assert(bad.isEmpty,
      s"oversized broadcast in: ${bad.map(a => (a.name, a.maxBroadcastBytes))}")
  }

  test("at most one nested-loop fallback across the suite (q07's disjunctive nation-pair join)") {
    val withNl = audits.filter(_.cartesians > 0)
    assert(withNl.map(_.name).forall(Set("q07")),
      s"unexpected cartesian/NL in: ${withNl.map(_.name)}")
  }

  test("the shapes where both cost models agree keep exact tree parity " +
    "(r14: containment reorder added q05; r15: subquery-fragment " +
    "canonicalization added q11/q16/q22)") {
    // These matched the reference memo's canonical join tree under the
    // sf1 stats when the audit was pinned; a regression here means the
    // stats conversion, CBO conf, or the containment join-reorder
    // drifted. q05 (6-relation chain) matches BECAUSE
    // ContainmentJoinReorder re-orders it — Spark's CBO alone picked a
    // different tree through r13. q11/q16/q22 match under the r15
    // canonicalization that attaches expression-hosted subquery
    // fragments (qpmodel's `<ScalarSubqueryExpr>`/`<InSubqueryExpr>`
    // plan attachments; our surviving SubqueryExpressions) to their
    // host like a join child — both engines combine the same relation
    // sets in the same order there, through different mechanisms.
    // Divergence elsewhere is expected (decorrelation strategy +
    // cost-model differences: e.g. q03's filtered-customer-first order
    // is strictly cheaper under Cout than the reference's
    // lineitem-first order) and REPORTED in TPCH1.md, not asserted.
    val mustMatch = Set("q01", "q04", "q05", "q06", "q11", "q12", "q13",
      "q14", "q16", "q17", "q19", "q22")
    val broken = audits.filter(a =>
      mustMatch(a.name) && !a.shapeMatches)
    assert(broken.isEmpty,
      s"lost tree parity: ${broken.map(a => (a.name, a.ourShape, a.refShape))}")
    assert(audits.count(_.shapeMatches) >= 12,
      s"exact-tree count regressed below the r15 pin: " +
        s"${audits.filter(_.shapeMatches).map(_.name)}")
  }

  test("root-cardinality estimator agreement: gmean q-error bounded under identical stats") {
    // r14: the graded estimate is the ENGINE estimator's (containment /
    // grouped-chain with CBO fallback — the estimator that now also
    // steers join order); measured gmean 1.00, max 1.04 (q16). The pin
    // leaves resolution slack, not room to lose a correction (raw CBO
    // reads 2.04 here).
    val qerrs = rows.flatMap(_.rootQError)
    assert(qerrs.size >= 15, s"too few comparable roots: ${qerrs.size}")
    val g = Tpch1Plan.gmean(qerrs)
    assert(g <= 1.2, f"gmean root q-error $g%.2f > 1.2")
    assert(qerrs.max <= 1.5, f"worst root q-error ${qerrs.max}%.2f > 1.5")
  }

  test("stats injection is live: lineitem plans at its sf1 cardinality") {
    val prevDb = spark.catalog.currentDatabase
    try {
      spark.sql("USE tpch1")
      val est = spark.table("lineitem")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.contains(BigInt(6001215)), s"lineitem rowCount: $est")
    } finally spark.sql(s"USE $prevDb")
  }
}
