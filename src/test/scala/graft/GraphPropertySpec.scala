package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Temporal}

/** Property checks for the graph and as-of operators: the distributed
  * plans must agree with naive brute-force Scala evaluation over
  * generated inputs — orientation/intersection vs all-triples scan,
  * window-walk as-of vs per-row linear scan. (Raw ScalaCheck generators
  * with fixed seeds, as in [[ExprPropertySpec]].)
  */
class GraphPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    TestSpark.samples(g, n)

  // Random undirected graphs: up to 12 nodes, each unordered pair
  // present i.i.d. — dense enough to guarantee triangles at n=12.
  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(3, 12)
    pairs = for (a <- 0 until n; b <- a + 1 until n) yield (a.toLong, b.toLong)
    keep <- Gen.listOfN(pairs.size, Gen.prob(0.4))
  } yield pairs.zip(keep).collect { case (p, true) => p }

  private def bruteTriangles(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if es((i, j)) && es((j, k)) && es((i, k))
    } yield (i, j, k)
  }

  test("triangleCount matches the all-triples brute force on random graphs") {
    val s = spark
    import s.implicits._
    samples(graphGen, 12).filter(_.nonEmpty).foreach { edges =>
      val got = Graph.triangleCount(edges.toDF("a", "b"))
        .collect().head.getLong(0)
      val want = bruteTriangles(edges).size.toLong
      assert(got == want, s"edges: $edges")
    }
  }

  test("perNodeTriangles matches brute-force corner counts; total is 3x") {
    val s = spark
    import s.implicits._
    samples(graphGen, 12).filter(_.nonEmpty).foreach { edges =>
      val tris = bruteTriangles(edges)
      val want = tris.flatMap(t => Seq(t._1, t._2, t._3))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Graph.perNodeTriangles(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"edges: $edges")
      assert(got.values.sum == 3L * tris.size)
    }
  }

  // As-of inputs: small keyed series with second-resolution times and
  // deliberate collisions (times drawn from 0..9).
  private val seriesGen: Gen[(Seq[(Long, Int, String)], Seq[(Long, Int, String)])] =
    for {
      nl <- Gen.chooseNum(1, 12)
      nr <- Gen.chooseNum(0, 12)
      lk <- Gen.listOfN(nl, Gen.chooseNum(1L, 3L))
      lt <- Gen.listOfN(nl, Gen.chooseNum(0, 9))
      rk <- Gen.listOfN(nr, Gen.chooseNum(1L, 3L))
      rt <- Gen.listOfN(nr, Gen.chooseNum(0, 9))
    } yield (
      lk.zip(lt).zipWithIndex.map { case ((k, t), i) => (k, t, s"L$i") },
      // unique per (key, time): keep the lexically-largest payload,
      // matching the operator's uniqueness contract
      rk.zip(rt).zipWithIndex.map { case ((k, t), i) => (k, t, s"R$i") }
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq)

  private def ts(sec: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:00:0$sec")

  private def bruteAsof(left: Seq[(Long, Int, String)],
                        right: Seq[(Long, Int, String)],
                        forward: Boolean,
                        tolSec: Option[Int]): Map[String, Option[String]] =
    left.map { case (k, t, lv) =>
      val cand = right.filter(r => r._1 == k &&
        (if (forward) r._2 >= t else r._2 <= t) &&
        tolSec.forall(tol =>
          if (forward) r._2 <= t + tol else r._2 >= t - tol))
      val best =
        if (cand.isEmpty) None
        else Some(if (forward) cand.minBy(_._2) else cand.maxBy(_._2))
      lv -> best.map(_._3)
    }.toMap

  private def runAsof(left: Seq[(Long, Int, String)],
                      right: Seq[(Long, Int, String)],
                      forward: Boolean,
                      tolSec: Option[Int]): Map[String, Option[String]] = {
    val s = spark
    import s.implicits._
    val l = left.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "t", "lv")
    val r = right.map { case (k, t, v) => (k, ts(t), v) }
      .toDF("k", "rt", "rv")
    Temporal.asofJoin(l, r, "k", "t", "rt", forward = forward,
        toleranceSql = tolSec.map(n => s"INTERVAL '$n' SECOND"))
      .collect()
      .map(row => row.getAs[String]("lv") -> Option(row.getAs[String]("rv")))
      .toMap
  }

  test("asofJoin backward/forward/tolerance match per-row linear scans") {
    samples(seriesGen, 10).foreach { case (left, right) =>
      for {
        forward <- Seq(false, true)
        tol <- Seq(None, Some(2))
      } {
        val got = runAsof(left, right, forward, tol)
        val want = bruteAsof(left, right, forward, tol)
        assert(got == want,
          s"forward=$forward tol=$tol left=$left right=$right")
      }
    }
  }
}
