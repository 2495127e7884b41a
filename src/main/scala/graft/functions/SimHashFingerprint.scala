package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash fingerprint over an `array<string>` of tokens: ONE md5
  * per token, using the first `bits` bits of the digest directly as the
  * ±1 hyperplane signs — bit k of the fingerprint is the sign of
  * Σ_tokens (digest_bit_k ? +1 : -1), emitted as a '0'/'1' string.
  *
  * Replaces `bits` interpreted `aggregate()` higher-order passes with
  * `bits` salted md5s per token (the composable SQL form) by a single
  * compiled pass with one digest per token — at 10^11 documents this is
  * the difference between the fingerprint being free next to the scan
  * and dominating it.
  */
case class SimHashFingerprint(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 128 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_fp: bits must be in [1, 128], got $bits")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_fp expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_fp"

  override def nullSafeEval(input: Any): Any =
    SimHashFingerprint.kernel(input.asInstanceOf[ArrayData], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashFingerprint.kernel($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashFingerprint =
    copy(child = newChild)
}

object SimHashFingerprint {

  /** One-pass fingerprint kernel (shared by eval and generated code). */
  def kernel(arr: ArrayData, bits: Int): UTF8String = {
    val counts = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val digest = org.apache.commons.codec.digest.DigestUtils
        .md5(arr.getUTF8String(i).getBytes)
      var k = 0
      while (k < bits) {
        val bit = (digest(k >> 3) >> (7 - (k & 7))) & 1
        counts(k) += (if (bit == 1) 1 else -1)
        k += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(bits)
    var k = 0
    while (k < bits) {
      sb.append(if (counts(k) > 0) '1' else '0')
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(col: Column, bits: Int): Column =
    column(SimHashFingerprint(expression(col), bits))
}
