package graft

import org.scalacheck.Gen
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
    TestSpark.samples(g, n)

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

  test("exhaustive Kleene 3VL truth tables for AND/OR/NOT") {
    // All 9 pairs over {TRUE, FALSE, NULL} checked against the SQL
    // standard's three-valued logic (the reference deviates — NULL
    // OR/AND collapse to false, ExprFunc.cs:1148-1156; the declared
    // contract here is standard SQL, SURVEY §7.4).
    val vals = Seq("TRUE" -> Some(true), "FALSE" -> Some(false),
      "CAST(NULL AS BOOLEAN)" -> None)
    def kAnd(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
      (a, b) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    def kOr(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
      (a, b) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    for ((sa, va) <- vals; (sb, vb) <- vals) {
      val r = spark.sql(
        s"SELECT ($sa AND $sb) AS a, ($sa OR $sb) AS o, (NOT $sa) AS n")
        .head()
      def cell(i: Int): Option[Boolean] =
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))
      assert(cell(0) == kAnd(va, vb), s"AND($sa, $sb)")
      assert(cell(1) == kOr(va, vb), s"OR($sa, $sb)")
      assert(cell(2) == va.map(!_), s"NOT($sa)")
    }
  }

  test("comparison with NULL is NULL; IS [NOT] NULL is two-valued") {
    val r = spark.sql(
      """SELECT (NULL = NULL) IS NULL AS a, (NULL <> 1) IS NULL AS b,
        |  (NULL IS NULL) AS c, (1 IS NOT NULL) AS d,
        |  (NULL BETWEEN 1 AND 2) IS NULL AS e,
        |  (NULL IN (1, 2)) IS NULL AS f""".stripMargin).head()
    (0 until 6).foreach(i => assert(r.getBoolean(i), s"col $i"))
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
