package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd dot product over two `array<float>` embedding columns.
  *
  * The reference exposes extensible scalar functions through its codegen
  * path (`/root/reference/qpmodel/ExprFunc.cs:42-76`, Roslyn codegen
  * `/root/reference/qpmodel/codegen.cs:102-183`); the Spark-first analog is
  * a Catalyst `Expression` with `doGenCode` so the hot loop stays inside
  * whole-stage codegen — no boxing, no UDF serialization. At 100 TB the
  * dot product is the inner loop of ANN / embedding-dedup jobs, so this is
  * the single most codegen-worthy function in the engine.
  *
  * Accumulates in double (float inputs widened): a deterministic
  * left-to-right IEEE sum. NOTE this alone is not reproducible against
  * engines that accumulate differently (DuckDB's list_dot_product on
  * FLOAT[] accumulates in float32) — for cross-engine-exact scores, feed
  * it `vec.quantize`d integral arrays, where every partial sum is exact
  * and order-independent.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects float or double arrays, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (ld, rd) = (isDouble(left), isDouble(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xe = if (isDouble(left)) s"$x.getDouble($i)"
               else s"((double) $x.getFloat($i))"
      val ye = if (isDouble(right)) s"$y.getDouble($i)"
               else s"((double) $y.getFloat($i))"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $xe * $ye;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Fused quantized cosine: one codegen'd pass computing all three dot
  * accumulators (a·b, a·a, b·b) over embeddings quantized inline onto
  * the integral 2^-20 grid — no intermediate quantized arrays, no
  * interpreted higher-order functions, 3× fewer array traversals than
  * composing three VecDots. Bit-identical to
  * cosine(quantize(a), quantize(b)): the accumulators are sums of exact
  * integers (order-independent), and the final
  * dot / (sqrt(aa) * sqrt(bb)) is the same IEEE arithmetic.
  */
case class VecCosineQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine_q expects (array<float>, array<float>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val qx = VecCosineQ.roundHalfAway(x.getFloat(i) * 1048576.0)
      val qy = VecCosineQ.roundHalfAway(y.getFloat(i) * 1048576.0)
      ab += qx * qy; aa += qx * qx; bb += qy * qy
      i += 1
    }
    // A vector quantizing to all zeros (every |x| < 2^-21) would make this
    // 0/0 = NaN, whose handling differs between engines; define cosine
    // against a zero vector as 0.0 in both this expression and the oracle.
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) 0.0 else ab / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      val den = ctx.freshName("den")
      val helper = classOf[VecCosineQ].getName
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $qx = $helper.roundHalfAway($x.getFloat($i) * 1048576.0);
         |  double $qy = $helper.roundHalfAway($y.getFloat($i) * 1048576.0);
         |  $ab += $qx * $qy; $aa += $qx * $qx; $bb += $qy * $qy;
         |}
         |double $den = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |${ev.value} = ($den == 0.0) ? 0.0 : $ab / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineQ =
    copy(left = newLeft, right = newRight)
}

object VecCosineQ {
  /** SQL ROUND semantics (half away from zero), matching both engines'
    * ROUND on the same IEEE double.
    */
  def roundHalfAway(v: Double): Double =
    if (v >= 0) Math.floor(v + 0.5) else Math.ceil(v - 0.5)
}

/** Native ADC lookup-sum for product quantization:
  * `sum_j lut[j][codes[j]]` over a per-query LUT (`array<array<double>>`,
  * m × ks) and a vector's PQ codes (`array<int>`, length m).
  *
  * This is THE inner loop of PQ/IVF-PQ serving — evaluated once per
  * (corpus vector, query) pair. The composed form
  * (`aggregate(sequence(0, m-1), …)` with nested `element_at`) runs as
  * interpreted higher-order lambdas; at 2M vectors × 10 queries the
  * interpreter overhead dominated the whole query (~96 s where the
  * IVF exact-cosine path, whose inner loop is the codegen'd VecCosineQ,
  * took 4 s — measured in the r9 third-decade soak). Same IEEE
  * left-to-right sum as the lambda form, so scores are bit-identical
  * and the DuckDB oracle is unchanged.
  */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_dot expects (array<array<double>>, array<int>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = math.min(lut.numElements(), codes.numElements())
    var s = 0.0
    var j = 0
    while (j < n) {
      s += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ad = classOf[ArrayData].getName
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  $ad __inner = $x.getArray($j);
         |  $s += __inner.getDouble($y.getInt($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native vector expressions. */
object vec {
  def dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))

  /** Cosine similarity built from the codegen'd dot product. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Quantize a float embedding onto an integral 2^-20 grid (as exact
    * integral doubles). Dot products of quantized 64-dim vectors are then
    * exact integer arithmetic (|round(x * 2^20)| <= 2^20 for |x| <= 1, so
    * a 64-term product-sum stays far below 2^53): order-independent and
    * bit-identical in any engine — which makes cosine scores, and thus
    * top-k rankings, deterministic across Spark and the DuckDB oracle.
    * Quantization error (~1e-6 relative) is far below typical top-k
    * score gaps (~1e-4).
    */
  def quantize(a: Column): Column = {
    import org.apache.spark.sql.functions.{round, transform}
    transform(a, x => round(x.cast("double") * 1048576d))
  }

  /** Cosine over quantized embeddings: cross-engine deterministic.
    * Fused single-pass native expression (see VecCosineQ) —
    * bit-identical to cosine(quantize(a), quantize(b)).
    */
  def cosineQ(a: Column, b: Column): Column =
    column(VecCosineQ(expression(a), expression(b)))

  /** PQ asymmetric-distance score: codegen'd `sum_j lut[j][codes[j]]`. */
  def adcDot(lut: Column, codes: Column): Column =
    column(AdcDot(expression(lut), expression(codes)))
}
