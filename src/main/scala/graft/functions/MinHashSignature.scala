package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature: md5 each element of an `array<string>` and
  * take the minimum of each of `k` disjoint `width`-hex-char digest
  * slices — the whole signature in ONE pass over the array.
  *
  * The composable form (`transform(s, w -> md5(w))` + k ×
  * `array_min(transform(...))`) routes through Spark's higher-order
  * functions, which are interpreted (CodegenFallback lambdas) and
  * materialize the intermediate digest array; at 10^11 documents that
  * interpreter overhead is the dedup pipeline's hot loop. This native
  * expression keeps the loop in compiled code via a static kernel
  * invoked from generated code, allocates nothing per element beyond the
  * digest, and skips the intermediate array entirely.
  *
  * Mirrors the reference's approach of special-casing hot scalar kernels
  * in its codegen (`/root/reference/qpmodel/codegen.cs:102-183`).
  */
case class MinHashSignature(child: Expression, k: Int, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k * width <= 32 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig: k*width must fit a 32-char md5 hex digest, got ${k * width}")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.kernel(input.asInstanceOf[ArrayData], k, width)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignature.kernel($c, $k, $width)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** One-pass signature kernel (called from both interpreted eval and
    * generated code).
    */
  def kernel(arr: ArrayData, k: Int, width: Int): ArrayData = {
    val mins = new Array[String](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val slice = hex.substring(j * width, j * width + width)
        if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      UTF8String.fromString(if (m == null) "" else m)))
  }

  def apply(col: Column, k: Int, width: Int): Column =
    column(MinHashSignature(expression(col), k, width))
}
