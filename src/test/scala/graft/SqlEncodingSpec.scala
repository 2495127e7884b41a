package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Sql

/** Ground-truth checks for the exact-sum encodings in Sql.dsum against
  * BigDecimal arithmetic, at magnitudes near the corpus maxima and
  * across partitionings.
  */
class SqlEncodingSpec extends AnyFunSuite {
  import TestSpark._

  // 2-decimal values up to ~1.2e5 — the l_extendedprice*(1+tax) regime.
  private def values(n: Int): Seq[Double] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map(_ => math.round(rnd.nextDouble() * 1.2e7) / 100.0 *
      (if (rnd.nextBoolean()) 1 else -1))
  }

  private def exact(xs: Seq[Double], scale: Int): Double =
    xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  test("two-limb scale-6 dsum equals BigDecimal ground truth (50k rows)") {
    val s = spark
    import s.implicits._
    val xs = values(50000)
    val truth = exact(xs, 6)
    Seq(1, 32).foreach { parts =>
      val got = xs.toDF("x").repartition(parts)
        .selectExpr(s"${Sql.dsum("x", 6)} AS s").head().getDouble(0)
      // identical up to the final double representation (two roundings)
      assert(math.abs(got - truth) <= math.ulp(truth) * 2,
        s"parts=$parts got=$got truth=$truth")
    }
  }

  test("single-limb scale-4 dsum is exactly the ground truth (50k rows)") {
    val s = spark
    import s.implicits._
    val xs = values(50000)
    val truth = exact(xs, 4)
    val got = xs.toDF("x").repartition(13)
      .selectExpr(s"${Sql.dsum("x", 4)} AS s").head().getDouble(0)
    // sums here stay far below 2^53: bit-exact
    assert(got == truth)
  }

  test("two-limb handles negatives, zeros, and sub-scale values") {
    val s = spark
    import s.implicits._
    val xs = Seq(-0.000001, 0.0, 0.000001, -99999.999999, 99999.999999,
      0.5e-6, -0.5e-6)
    val truth = exact(xs, 6)
    val got = xs.toDF("x")
      .selectExpr(s"${Sql.dsum("x", 6)} AS s").head().getDouble(0)
    assert(math.abs(got - truth) <= math.ulp(math.abs(truth).max(1.0)) * 2,
      s"got=$got truth=$truth")
  }
}
