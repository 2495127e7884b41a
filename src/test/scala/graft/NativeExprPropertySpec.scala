package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{col, expr}

import graft.functions.{AdcDot, VecCosineQ, VecDot, vec}

/** Randomized parity for the native codegen'd vector expressions.
  *
  * Each expression has two independent definitions to agree with:
  *
  *  1. the INTERPRETED path (`nullSafeEval`) vs a manual Scala
  *     reimplementation, driven by ScalaCheck over adversarial float
  *     ranges (subnormals, near-half rounding boundaries, mixed signs);
  *  2. the CODEGEN path (what whole-stage codegen actually runs in a
  *     query) vs the composed Spark-SQL lambda form each native
  *     expression replaced, over one seeded 300-row batch — a single
  *     Spark job, bit-identical comparison via doubleToLongBits.
  *
  * Bit-identity (not tolerance) is the contract: the DuckDB oracle
  * re-derives the same scores, so any ULP drift between the fused
  * kernel and the composable definition would surface as a hash
  * mismatch in the correctness gate. These properties pin that at the
  * unit level where a counterexample is minimal and shrinkable.
  */
class NativeExprPropertySpec extends AnyFunSuite {
  import TestSpark._

  // Raw ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  // bridge isn't in the offline dependency cache) — same pattern as
  // ExprPropertySpec.
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    TestSpark.samples(g, n)

  private def forAll[A](g: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  private val finiteFloat: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1.0f, 1.0f),                      // embedding range
    Gen.chooseNum(-1e-7f, 1e-7f),                    // quantizes to 0
    Gen.chooseNum(-100.0f, 100.0f),                  // out-of-norm range
    Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f,
      4.76837158203125e-7f,                          // exactly 0.5 * 2^-20
      -4.76837158203125e-7f, Float.MinPositiveValue))

  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

  // ---- interpreted eval vs manual reimplementation (ScalaCheck) ----

  test("VecDot eval: left-to-right double sum over the common prefix") {
    val vecs = for {
      n <- Gen.choose(0, 48)
      m <- Gen.choose(0, 48)
      a <- Gen.listOfN(n, finiteFloat)
      b <- Gen.listOfN(m, finiteFloat)
    } yield (a.toArray, b.toArray)
    forAll(vecs) { case (a, b) =>
      val e = VecDot(litF(a), litF(b))
      val got = e.eval(null).asInstanceOf[Double]
      var s = 0.0
      for (i <- 0 until math.min(a.length, b.length))
        s += a(i).toDouble * b(i).toDouble
      assert(bits(got) == bits(s))
    }
  }

  test("VecCosineQ eval: cosine of 2^-20-grid quantized vectors, 0 for zero") {
    val pair = for {
      n <- Gen.choose(0, 48)
      a <- Gen.listOfN(n, finiteFloat)
      b <- Gen.listOfN(n, finiteFloat)
    } yield (a.toArray, b.toArray)
    forAll(pair) { case (a, b) =>
      val got = VecCosineQ(litF(a), litF(b)).eval(null).asInstanceOf[Double]
      def q(x: Float): Double = {
        val v = x * 1048576.0
        if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
      }
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- 0 until math.min(a.length, b.length)) {
        val (qa, qb) = (q(a(i)), q(b(i)))
        ab += qa * qb; aa += qa * qa; bb += qb * qb
      }
      val den = math.sqrt(aa) * math.sqrt(bb)
      val want = if (den == 0.0) 0.0 else ab / den
      assert(bits(got) == bits(want))
    }
  }

  test("AdcDot eval: sum of lut[j][codes[j]] lookups") {
    val gen = for {
      m <- Gen.choose(1, 12)
      ks <- Gen.choose(1, 16)
      lut <- Gen.listOfN(m, Gen.listOfN(ks, Gen.chooseNum(-10.0, 10.0)))
      codes <- Gen.listOfN(m, Gen.choose(0, ks - 1))
    } yield (lut.map(_.toArray).toArray, codes.toArray)
    forAll(gen) { case (lut, codes) =>
      val e = AdcDot(litLut(lut), litI(codes))
      val got = e.eval(null).asInstanceOf[Double]
      var s = 0.0
      for (j <- codes.indices) s += lut(j)(codes(j))
      assert(bits(got) == bits(s))
    }
  }

  // ---- codegen path vs the composed lambda form it replaced ----

  test("codegen batch: natives are bit-identical to their lambda forms") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x9e3779b9L)
    def fvec(n: Int) = Array.fill(n)(rnd.nextFloat() * 2 - 1)
    val m = 8; val ks = 16
    val rows = Seq.tabulate(300) { i =>
      val dim = 1 + rnd.nextInt(48)
      val lut = Array.fill(m)(Array.fill(ks)(rnd.nextDouble() * 2 - 1))
      val codes = Array.fill(m)(rnd.nextInt(ks))
      (i, fvec(dim), fvec(dim), lut, codes)
    }
    val df = rows.toDF("id", "a", "b", "lut", "codes")
      .withColumn("n_dot", vec.dot(col("a"), col("b")))
      .withColumn("n_cos", vec.cosineQ(col("a"), col("b")))
      .withColumn("n_adc", vec.adcDot(col("lut"), col("codes")))
      .withColumn("l_dot", expr(
        """aggregate(zip_with(a, b, (x, y) ->
          |  cast(x as double) * cast(y as double)),
          |  0D, (acc, v) -> acc + v)""".stripMargin))
      .withColumn("l_cos", expr(
        """CASE WHEN aggregate(transform(a, x ->
          |       round(cast(x as double) * 1048576D) *
          |       round(cast(x as double) * 1048576D)), 0D, (s, v) -> s + v)
          |       = 0D
          |     OR aggregate(transform(b, x ->
          |       round(cast(x as double) * 1048576D) *
          |       round(cast(x as double) * 1048576D)), 0D, (s, v) -> s + v)
          |       = 0D
          |THEN 0D
          |ELSE aggregate(zip_with(a, b, (x, y) ->
          |       round(cast(x as double) * 1048576D) *
          |       round(cast(y as double) * 1048576D)), 0D, (s, v) -> s + v)
          |     / (sqrt(aggregate(transform(a, x ->
          |         round(cast(x as double) * 1048576D) *
          |         round(cast(x as double) * 1048576D)), 0D, (s, v) -> s + v))
          |      * sqrt(aggregate(transform(b, x ->
          |         round(cast(x as double) * 1048576D) *
          |         round(cast(x as double) * 1048576D)), 0D, (s, v) -> s + v)))
          |END""".stripMargin))
      .withColumn("l_adc", expr(
        s"""aggregate(sequence(0, ${m - 1}), 0D, (acc, j) ->
           |  acc + element_at(element_at(lut, j + 1),
           |                   element_at(codes, j + 1) + 1))""".stripMargin))
    val got = df.select("n_dot", "l_dot", "n_cos", "l_cos", "n_adc", "l_adc")
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(bits(r.getDouble(0)) == bits(r.getDouble(1)),
        s"row $i vec_dot ${r.getDouble(0)} != lambda ${r.getDouble(1)}")
      assert(bits(r.getDouble(2)) == bits(r.getDouble(3)),
        s"row $i vec_cosine_q ${r.getDouble(2)} != lambda ${r.getDouble(3)}")
      assert(bits(r.getDouble(4)) == bits(r.getDouble(5)),
        s"row $i adc_dot ${r.getDouble(4)} != lambda ${r.getDouble(5)}")
    }
  }

  // ---- literal builders for direct interpreted eval ----

  private def litF(a: Array[Float]) =
    org.apache.spark.sql.catalyst.expressions.Literal(
      new GenericArrayData(a.map(java.lang.Float.valueOf)),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))

  private def litI(a: Array[Int]) =
    org.apache.spark.sql.catalyst.expressions.Literal(
      new GenericArrayData(a.map(java.lang.Integer.valueOf)),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))

  private def litLut(lut: Array[Array[Double]]) =
    org.apache.spark.sql.catalyst.expressions.Literal(
      new GenericArrayData(lut.map(row =>
        new GenericArrayData(row.map(java.lang.Double.valueOf)))),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
}
