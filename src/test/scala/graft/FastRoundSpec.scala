package graft

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RoundQ

/** The FastRound rewrite (optimization r15): RoundQ must be bit-identical
  * to Spark's BigDecimal-based Round(d, 0) on every double, and the
  * optimizer rule must fire on the corpus' exact-sum shapes while leaving
  * non-zero scales and non-double inputs alone.
  */
class FastRoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sparkRound(v: Double): Any =
    Round(Literal(v, DoubleType), Literal(0)).eval(null)
  private def fastRound(v: Double): Any =
    RoundQ(Literal(v, DoubleType)).eval(null)

  private def bitsOf(a: Any): Long =
    java.lang.Double.doubleToRawLongBits(a.asInstanceOf[Double])

  test("RoundQ == Spark Round(d, 0) on adversarial doubles") {
    val halves = (-10 to 10).map(_ + 0.5)
    val nearHalves = Seq(0.49999999999999994, 2.4999999999999996,
      0.5000000000000001, -0.49999999999999994, -0.5000000000000001,
      8732190.5, 8732190.499999999, 8732190.500000001,
      // largest double strictly below a .5 boundary at ~1e7 magnitude
      Math.nextDown(8732190.5), Math.nextUp(8732190.5),
      Math.nextDown(-8732190.5), Math.nextUp(-8732190.5))
    val big = Seq(math.pow(2, 51), math.pow(2, 52), math.pow(2, 53),
      math.pow(2, 52) - 0.5, -(math.pow(2, 52) - 0.5),
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue)
    val specials = Seq(0.0, -0.0, -0.3, 0.3, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity)
    (halves ++ nearHalves ++ big ++ specials).foreach { v =>
      val (s, f) = (sparkRound(v), fastRound(v))
      assert(bitsOf(s) == bitsOf(f), s"mismatch at $v: spark=$s fast=$f")
    }
  }

  test("RoundQ == Spark Round(d, 0) over seed-pinned random doubles") {
    import org.scalacheck.Gen
    // Mix magnitudes: the corpus' scaled values live around 1e2..1e9, but
    // cover the whole double line including subnormals and exact halves.
    val gens = Seq(
      Gen.chooseNum(-1e9, 1e9),
      Gen.chooseNum(-1e3, 1e3),
      Gen.chooseNum(Double.MinValue, Double.MaxValue),
      Gen.chooseNum(-1e9, 1e9).map(d => math.floor(d) + 0.5),
      Gen.chooseNum(-1e9, 1e9).map(d => Math.nextDown(math.floor(d) + 0.5)),
      Gen.chooseNum(-1e9, 1e9).map(d => Math.nextUp(math.floor(d) + 0.5)))
    gens.foreach { g =>
      TestSpark.samples(g, 2000).foreach { v =>
        assert(bitsOf(sparkRound(v)) == bitsOf(fastRound(v)),
          s"mismatch at $v (bits ${java.lang.Double.doubleToRawLongBits(v)})")
      }
    }
  }

  test("null propagates") {
    assert(RoundQ(Literal(null, DoubleType)).eval(null) == null)
  }

  test("the rule rewrites qsum shapes and respects the conf gate") {
    val df = spark.sql(
      "SELECT SUM(CAST(ROUND(v * 100) AS BIGINT)) FROM VALUES (1.115D), (2.5D) AS t(v)")
    assert(df.queryExecution.optimizedPlan.toString.contains("round_q"))
    GraftSession.withConf(spark, "spark.graft.sql.fastRound", "false") {
      val off = spark.sql(
        "SELECT SUM(CAST(ROUND(v * 100) AS BIGINT)) FROM VALUES (1.115D) AS t(v)")
      assert(!off.queryExecution.optimizedPlan.toString.contains("round_q"))
    }
  }

  test("non-zero scale and non-double inputs are left alone") {
    val scaled = spark.sql("SELECT ROUND(v, 2) FROM VALUES (1.115D) AS t(v)")
    assert(!scaled.queryExecution.optimizedPlan.toString.contains("round_q"))
    val dec = spark.sql(
      "SELECT ROUND(CAST(v AS DECIMAL(10,3))) FROM VALUES (1.115D) AS t(v)")
    assert(!dec.queryExecution.optimizedPlan.toString.contains("round_q"))
  }

  test("a corpus query is value-identical with the rewrite on and off") {
    val dir = TestSpark.sfDir
    def run(): Seq[Seq[Any]] =
      TestSpark.rows(Queries.byName("tpch_q1").build(spark, dir))
    val on = run()
    val off = GraftSession.withConf(spark, "spark.graft.sql.fastRound", "false") {
      run()
    }
    assert(on == off)
  }
}
