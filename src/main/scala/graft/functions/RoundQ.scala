package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Primitive scale-0 ROUND over DOUBLE — bit-identical to Spark's
  * `Round(child, 0)` (and to DuckDB's `round(x)`), without the per-row
  * BigDecimal.
  *
  * Spark's `RoundBase` rounds a double by `BigDecimal(d).setScale(0,
  * HALF_UP).toDouble` (NaN/Infinity passed through) — an allocation plus
  * decimal-string parsing PER ROW. The exact-sum encodings (`Sql.qsum` /
  * `Sql.dsum`) put one such ROUND inside nearly every aggregate in the
  * corpus, and `vec.quantize` evaluates 64 of them per embedding; at
  * sf0.1 the BigDecimal path alone was ~55% of tpch_q1's single-task
  * scan+aggregate stage (0.92 s → 0.42 s measured with this rewrite).
  *
  * Equivalence proof sketch (pinned exhaustively-by-property in
  * FastRoundSpec):
  *  - `scala.math.BigDecimal(d)` is built from `Double.toString(d)` — the
  *    shortest decimal that round-trips to `d`. For |d| < 2^52 every
  *    half-integer (k + 0.5) is exactly representable, so the shortest
  *    repr of `d` lies strictly on the same side of every .5 boundary as
  *    `d` itself (a repr equal to `k.5` would round-trip to that double,
  *    not to `d`): HALF_UP on the string value == half-away-from-zero on
  *    the exact binary value.
  *  - `|d| - floor(|d|)` is exact in IEEE arithmetic (both operands share
  *    the same binade and the result is < 1), so the `frac >= 0.5` test
  *    below decides the exact fractional part — no `d + 0.5` double
  *    rounding hazard (`floor(d + 0.5)` misrounds doubles one ulp below
  *    a .5 boundary; this form does not).
  *  - |d| >= 2^52: already integral; floor(a) == a, frac == 0, identity —
  *    same as BigDecimal's no-op setScale.
  *  - NaN / ±Infinity passed through, matching RoundBase.
  *  - Zero results are normalized to +0.0: BigDecimal has no signed zero,
  *    so Spark's ROUND maps -0.0 (and (-0.5, -0.0]) to +0.0.
  */
case class RoundQ(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"round_q expects DOUBLE, got ${other.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "round_q"

  protected override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else {
      val a = math.abs(v)
      val f = math.floor(a)
      var r = if (a - f >= 0.5) f + 1.0 else f
      if (v < 0) r = -r
      if (r == 0.0) 0.0 else r
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val a = ctx.freshName("a")
      val f = ctx.freshName("f")
      val r = ctx.freshName("r")
      s"""
         |double $r;
         |if (java.lang.Double.isNaN($v) || java.lang.Double.isInfinite($v)) {
         |  $r = $v;
         |} else {
         |  double $a = java.lang.Math.abs($v);
         |  double $f = java.lang.Math.floor($a);
         |  $r = ($a - $f >= 0.5) ? $f + 1.0 : $f;
         |  if ($v < 0) $r = -$r;
         |  if ($r == 0.0) $r = 0.0;
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RoundQ =
    copy(child = newChild)
}
