package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Semantics + plan-shape tests for the temporal join operators. */
class TemporalSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val left = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 00:00:05"), "L5"),
      (1L, ts("2024-01-01 00:00:03"), "L3"), // tie with right at :03
      (1L, ts("2024-01-01 00:00:00"), "L0"), // before any right row
      (2L, ts("2024-01-01 00:00:09"), "L9")  // key with no right rows
    ).toDF("k", "t", "lv")
  }

  private lazy val right = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 00:00:01"), "R1"),
      (1L, ts("2024-01-01 00:00:03"), "R3"),
      (1L, ts("2024-01-01 00:00:07"), "R7")
    ).toDF("k", "rt", "rv")
  }

  test("asofJoin picks latest right at-or-before each left row") {
    val got = Temporal.asofJoin(left, right, "k", "t", "rt")
      .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("rv")))
      .toMap
    assert(got == Map("L5" -> "R3", "L3" -> "R3", "L0" -> null,
      "L9" -> null))
  }

  test("asofJoin forward picks earliest right at-or-after each left row") {
    val got = Temporal.asofJoin(left, right, "k", "t", "rt",
        forward = true)
      .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("rv")))
      .toMap
    // L5 (:05) → R7 (:07); L3 ties right at :03 → inclusive R3;
    // L0 (:00) → R1 (:01); L9 on key 2 has no rights.
    assert(got == Map("L5" -> "R7", "L3" -> "R3", "L0" -> "R1",
      "L9" -> null))
  }

  test("asofJoin tolerance masks matches staler than the bound") {
    val got = Temporal.asofJoin(left, right, "k", "t", "rt",
        toleranceSql = Some("INTERVAL '1' SECOND"))
      .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("rv")))
      .toMap
    // L5 (:05) last right R3 (:03) is 2s stale → masked; L3 ties → kept.
    assert(got == Map("L5" -> null, "L3" -> "R3", "L0" -> null,
      "L9" -> null))
  }

  test("asofJoin plan: one shuffle + one window pass, no join node at all") {
    val plan = finalPlan(Temporal.asofJoin(left, right, "k", "t", "rt"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges in:\n$plan")
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("binnedOverlapJoin: exactly-once pairs incl. bin-boundary spans") {
    val s = spark
    import s.implicits._
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")), // 2 bins
      (2L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:10:00")),
      (3L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:30:00"))
    ).toDF("aid", "alo", "ahi")
    val b = Seq(
      (10L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:05:00")), // hits 1+2
      (11L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:30:00")), // abuts 1: no
      (12L, ts("2024-01-01 05:29:00"), ts("2024-01-01 06:29:00"))  // hits 3
    ).toDF("bid", "blo", "bhi")
    val got = Temporal.binnedOverlapJoin(a, "alo", "ahi", b, "blo", "bhi",
        binSeconds = 1800)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // multiset equality: any duplicate emission would show up here
    assert(got.sorted == Seq((1L, 10L), (2L, 10L), (3L, 12L)))
  }

  test("binnedIntervalJoin matches the plain range join, without a cartesian") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val points = (0 until 120)
      .map(i => (i.toLong, new Timestamp(base + i * 60000L))) // 1/minute
    val pts = points.toDF("pid", "pt")
    val ivs = Seq(
      (100L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")),
      (200L, ts("2024-01-01 00:15:00"), ts("2024-01-01 00:55:00")),
      (300L, ts("2024-01-01 01:30:00"), ts("2024-01-01 01:40:00"))
    ).toDF("iid", "lo", "hi")
    val got = Temporal.binnedIntervalJoin(pts, "pt", ivs, "lo", "hi", 600)
      .groupBy("iid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = {
      val raw = for {
        (pid, t) <- points
        r <- Seq((100L, "00:10:00", "00:20:00"), (200L, "00:15:00", "00:55:00"),
          (300L, "01:30:00", "01:40:00"))
        if !t.before(ts(s"2024-01-01 ${r._2}")) && t.before(ts(s"2024-01-01 ${r._3}"))
      } yield r._1
      raw.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    assert(got == expected)
    val plan = finalPlan(
      Temporal.binnedIntervalJoin(pts, "pt", ivs, "lo", "hi", 600))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("tpch_q21 double correlation decorrelates without a cartesian") {
    val plan = finalPlan(Queries.byName("tpch_q21").build(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tpch_q2 correlated MIN over the shared CTE: no cartesian") {
    val plan = finalPlan(Queries.byName("tpch_q2").build(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tpch_q9 five-way join: nation broadcasts, no cartesian") {
    val plan = finalPlan(Queries.byName("tpch_q9").build(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tpch_q20 nested IN over grouped HAVING decorrelates cleanly") {
    val plan = finalPlan(Queries.byName("tpch_q20").build(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("LeftSemi") || plan.contains("SemiJoin"), plan)
  }
}
