package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.vec

/** Native VecDot expression: interpreted eval vs codegen vs manual. */
class VecDotSpec extends AnyFunSuite {
  import TestSpark._

  test("dot product matches manual left-to-right double accumulation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(vec.dot($"a", $"b")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(32.0, 0.0))
  }

  test("null inputs propagate to null") {
    val s = spark
    import s.implicits._
    val df = Seq((Option(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(vec.dot($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("mismatched lengths use the common prefix") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(10.0f))).toDF("a", "b")
    assert(df.select(vec.dot($"a", $"b")).head().getDouble(0) == 10.0)
  }

  test("type check rejects non-numeric-array inputs") {
    val s = spark
    import s.implicits._
    val df = Seq((Array("1.0", "2.0"), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception](df.select(vec.dot($"a", $"b")).collect())
    assert(e.getMessage.toLowerCase.contains("vec_dot"))
  }

  test("fused vec_cosine_q is bit-identical to cosine(quantize, quantize)") {
    val s = spark
    graft.catalog.Tables.registerAll(s, TestSpark.sfDir)
    import org.apache.spark.sql.functions.col
    val e = s.table("embeddings").limit(200)
    val fused = e.select(col("vec_id"),
        vec.cosineQ(col("embedding"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    val composed = e.select(col("vec_id"),
        vec.cosine(vec.quantize(col("embedding")),
          vec.quantize(col("embedding"))).as("c"))
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    assert(fused == composed)
    // and it resolves from SQL through the extension registry
    val viaSql = s.sql(
      "SELECT vec_cosine_q(embedding, embedding) AS c FROM embeddings LIMIT 1")
    assert(math.abs(viaSql.head().getDouble(0) - 1.0) < 1e-9)
  }

  test("double arrays accepted; quantized dot is exact and integral") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(0.25f, -0.5f), Array(0.5f, 0.25f))).toDF("a", "b")
    val d = df.select(
      vec.dot(vec.quantize($"a"), vec.quantize($"b"))).head().getDouble(0)
    // (0.25*2^20)(0.5*2^20) + (-0.5*2^20)(0.25*2^20) = 0 exactly
    assert(d == 0.0)
    val sq = df.select(
      vec.dot(vec.quantize($"a"), vec.quantize($"a"))).head().getDouble(0)
    assert(sq == math.pow(0.25 * 1048576, 2) + math.pow(0.5 * 1048576, 2))
    assert(sq.isWhole)
  }

  test("cosine of identical vectors is 1.0") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(math.abs(df.select(vec.cosine($"a", $"b")).head().getDouble(0) - 1.0) < 1e-12)
  }

  test("SQL registry resolves vec_dot (GraftExtensions injection)") {
    val r = spark.sql("SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
      "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
    assert(r == 11.0)
  }

  test("adc_dot is bit-identical to the interpreted aggregate/element_at form") {
    val s = spark
    import s.implicits._
    // m=3 subspaces, ks=4 codewords: lut[j][codes[j]] summed left-to-right.
    val df = Seq(
      (Array(Array(0.1, 0.2, 0.3, 0.4),
             Array(-1.5, 2.5, 0.0, 7.25),
             Array(3.0, -3.0, 0.125, 9.0)),
       Array(2, 0, 3)),
      (Array(Array(1e-17, 1.0, 0.0, 0.0),
             Array(1.0, -1.0, 0.0, 0.0),
             Array(-1.0, 1e-17, 0.0, 0.0)),
       Array(0, 0, 0)) // order-sensitive sum: pins left-to-right IEEE order
    ).toDF("lut", "codes")
    val native = df.select(vec.adcDot($"lut", $"codes").as("d"))
      .collect().map(r => java.lang.Double.doubleToLongBits(r.getDouble(0))).toSeq
    val composed = df.selectExpr(
      """aggregate(sequence(0, 2), 0D, (acc, j) ->
        |  acc + element_at(element_at(lut, j + 1),
        |                   element_at(codes, j + 1) + 1)) AS d""".stripMargin)
      .collect().map(r => java.lang.Double.doubleToLongBits(r.getDouble(0))).toSeq
    assert(native == composed)
    assert(native.head == java.lang.Double.doubleToLongBits(0.3 + -1.5 + 9.0))
  }

  test("adc_dot propagates null and rejects wrong input types") {
    val s = spark
    import s.implicits._
    val df = Seq((Option.empty[Array[Array[Double]]], Option(Array(0))))
      .toDF("lut", "codes")
    assert(df.select(vec.adcDot($"lut", $"codes")).head().isNullAt(0))
    val bad = Seq((Array(1.0, 2.0), Array(0))).toDF("lut", "codes")
    val e = intercept[Exception](
      bad.select(vec.adcDot($"lut", $"codes")).collect())
    assert(e.getMessage.toLowerCase.contains("adc_dot"))
  }

  test("minhash_sig equals the composable transform/array_min form") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq("alpha", "beta", "gamma", "delta"))).toDF("s")
    val native = df.select(
        graft.functions.MinHashSignature($"s", 8, 4).as("sig"))
      .selectExpr((0 until 8).map(i => s"element_at(sig, ${i + 1})"): _*)
      .head().toSeq
    val composed = df
      .selectExpr("transform(s, w -> md5(w)) AS hs")
      .selectExpr((0 until 8).map(i =>
        s"array_min(transform(hs, h -> substring(h, ${4 * i + 1}, 4)))"): _*)
      .head().toSeq
    assert(native == composed)
    // and through the SQL registry
    val viaSql = spark.sql(
      "SELECT element_at(minhash_sig(array('alpha','beta'), 8, 4), 1) AS h")
      .head().getString(0)
    assert(viaSql.length == 4)
  }
}
