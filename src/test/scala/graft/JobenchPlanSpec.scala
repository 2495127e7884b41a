package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Gate for the JOBench-113 plan-only battery (see [[JobenchPlan]]):
  * all 113 real IMDB join-order queries must plan from the reference's
  * injected statistics with the scale-safety invariants intact. This is
  * the repo counterpart of the reference's `TestJobench`
  * (`/root/reference/test/UnitTest.cs:357-381`) — plan validation, no
  * execution, no data.
  */
class JobenchPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private lazy val audits = JobenchPlan.runAll(spark)

  override def afterAll(): Unit = () // shared session owned by the suite run

  test("all 113 queries plan without error") {
    val errs = audits.filter(_.err.isDefined)
    assert(errs.isEmpty, s"failed: ${errs.map(a => a.name -> a.err).take(5)}")
    assert(audits.size == 113)
  }

  test("no query plans a cartesian product or nested-loop fallback") {
    val bad = audits.filter(_.cartesians > 0)
    assert(bad.isEmpty, s"cartesians in: ${bad.map(_.name)}")
  }

  test("every join tree is connected: joins = relations - 1") {
    val bad = audits.filter(a => a.joinCount != a.relations - 1)
    assert(bad.isEmpty,
      s"disconnected: ${bad.map(a => (a.name, a.relations, a.joinCount))}")
  }

  test("every leaf scan plans from injected stats, never the empty-table fallback") {
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

  test("stats injection is live: title scans at its IMDB cardinality") {
    val rc = spark.table("jobench.title")
      .queryExecution.optimizedPlan.stats.rowCount
    assert(rc.contains(BigInt(2528312)))
  }
}
