package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecDot

/** Engine extension point, loaded via `spark.sql.extensions`.
  *
  * Mirrors the reference's external-function registry
  * (`/root/reference/qpmodel/ExprFunc.cs:42-76`) the Spark-first way:
  * native Catalyst expressions injected into the session's function
  * registry so both SQL text and `expr("vec_dot(...)")` resolve them, and
  * codegen keeps them inside WholeStageCodegen spans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
  }
}
