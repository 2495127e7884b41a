package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.vec

/** Property-based expression checks (SURVEY §5 rebuild plan, layer c):
  * engine results must agree with plain Scala evaluation over generated
  * inputs — the whole-stage-codegen path vs a reference implementation.
  * (Raw ScalaCheck generators with fixed seeds; the scalatest-scalacheck
  * bridge isn't in the offline dependency cache.)
  */
class ExprPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallInts = Gen.listOfN(8, Gen.chooseNum(-1000, 1000))

  test("integer arithmetic matches Scala semantics (codegen vs reference)") {
    val s = spark
    import s.implicits._
    samples(smallInts, 10).foreach { xs =>
      val got = xs.toDF("x")
        .selectExpr("x * 3 - 1 AS a", "ABS(x) AS b", "x % 7 AS c")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val want = xs.map(x => (x * 3 - 1, math.abs(x), x % 7)).toSet
      assert(got == want, s"inputs: $xs")
    }
  }

  test("string functions match Scala semantics") {
    val s = spark
    import s.implicits._
    val asciiStr = Gen.listOfN(6, Gen.alphaNumStr.map(_.take(12)))
    samples(asciiStr, 10).foreach { xs =>
      val got = xs.toDF("x")
        .selectExpr("UPPER(x) AS u", "LENGTH(x) AS l", "SUBSTRING(x, 1, 3) AS p")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      val want = xs.map(x => (x.toUpperCase, x.length, x.take(3))).toSet
      assert(got == want, s"inputs: $xs")
    }
  }

  test("vec_dot is symmetric and matches left-to-right double accumulation") {
    val s = spark
    import s.implicits._
    val vecPair = for {
      a <- Gen.listOfN(6, Gen.chooseNum(-100f, 100f))
      b <- Gen.listOfN(6, Gen.chooseNum(-100f, 100f))
    } yield (a.toArray, b.toArray)
    samples(vecPair, 10).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val ab = df.select(vec.dot($"a", $"b")).head().getDouble(0)
      val ba = df.select(vec.dot($"b", $"a")).head().getDouble(0)
      assert(ab == ba) // exact: per-element products commute
      val manual = a.zip(b)
        .foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      assert(ab == manual) // the documented accumulation contract
    }
  }

  test("aggregate sum over generated ints equals Scala sum at any partitioning") {
    val s = spark
    import s.implicits._
    samples(smallInts, 10).foreach { xs =>
      val got = xs.toDF("x").repartition(3)
        .selectExpr("SUM(x) AS s").head().getLong(0)
      assert(got == xs.map(_.toLong).sum, s"inputs: $xs")
    }
  }
}
