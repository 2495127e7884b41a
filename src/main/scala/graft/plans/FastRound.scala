package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.RoundQ

/** Rewrite scale-0 double ROUND to the primitive [[RoundQ]].
  *
  * Spark evaluates `ROUND(d)` on DOUBLE through BigDecimal per row
  * (RoundBase) — see RoundQ's scaladoc for the measured cost and the
  * bit-identity argument. This rule swaps every `Round(child: double,
  * literal 0)` in the logical plan for the codegen'd primitive form. It
  * runs inside expression trees too, so higher-order-function lambda
  * bodies (e.g. `vec.quantize`'s per-element `round(x * 2^20)`) are
  * rewritten even though HOF lambdas evaluate interpreted.
  *
  * Scope deliberately narrow:
  *  - DOUBLE input only (decimal/integral ROUND keep Spark's overflow
  *    and scale semantics);
  *  - literal scale 0 only (the corpus' exact-sum encodings and the
  *    embedding quantizer; non-zero scales keep BigDecimal's decimal-
  *    string semantics, which the primitive form does not replicate).
  *
  * Conf-gated for A/B: `spark.graft.sql.fastRound` (default true).
  * Idempotent (the rewrite output contains no Round), so it is safe in
  * any fixed-point batch; injected via GraftExtensions so every session
  * — including `newSession()` clones — carries it.
  */
class FastRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    // case-insensitive boolean parse (r15 ADVICE): "True"/"TRUE" must
    // behave like Spark's boolean confs, not silently disable the rule
    if (!java.lang.Boolean.parseBoolean(
        conf.getConfString("spark.graft.sql.fastRound", "true"))) plan
    else plan.transformAllExpressions {
      case Round(child, Literal(scale: Int, _), _)
          if scale == 0 && child.dataType == DoubleType =>
        RoundQ(child)
    }
}
