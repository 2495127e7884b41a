package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Delta-varint byte packing for adjacency lists — the shuffle-volume
  * lever on the graph family's wedge exchange.
  *
  * [[graft.operators.Graph.triangleCount]]'s per-edge intersection plan
  * ships every probing edge a copy of its endpoint's out-adjacency
  * array: Σ out-deg² longs of shuffle, the algorithm's inherent
  * exchange (27 GB at the 100× soak — the single-box wall BASELINE.md
  * documents). The VOLUME is inherent; the ENCODING is not: Tungsten's
  * `array<long>` spends 8 bytes per neighbor plus header, while the
  * sorted ids delta-encode to 1–3 varint bytes each. `pack_varint`
  * sorts and packs a long array into a BINARY column at the adjacency
  * build (one extra pass over node-sized data); `packed_intersect`
  * merge-walks two packed streams directly — no decode materialization
  * — returning the (triangle-bounded, small) intersection as plain
  * longs. Both are native codegen'd expressions: the loops live in one
  * static call inside the WholeStageCodegen span.
  *
  * Format: first value zigzag-varint, then the RAW two's-complement
  * gaps between consecutive sorted values as plain varints (a gap
  * spanning more than half the long range wraps negative and encodes
  * as a 10-byte varint; the decoder's wrapping ADD reverses it
  * exactly). Exact duplicates produce gap 0 and are skipped, as are
  * null input slots — SET semantics, which is what adjacency is.
  */
object PackedAdjacency {

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeVarint(out: Array[Byte], pos0: Int, v0: Long): Int = {
    var pos = pos0
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out(pos) = ((v & 0x7f) | 0x80).toByte
      pos += 1
      v >>>= 7
    }
    out(pos) = v.toByte
    pos + 1
  }

  /** Sort + delta + varint a long array. Empty array → empty bytes.
    * Null slots are skipped (SET semantics — a null neighbor is no
    * neighbor, never a phantom id 0, which `toLongArray` would read).
    * Gaps are written as RAW longs through the varint (a gap spanning
    * more than half the long range wraps negative in two's complement;
    * the decoder's wrapping ADD reverses it exactly, so nothing is
    * dropped — only a true duplicate produces gap 0).
    */
  def pack(arr: ArrayData): Array[Byte] = {
    val total = arr.numElements()
    var n = 0
    val vals = new Array[Long](total)
    var j = 0
    while (j < total) {
      if (!arr.isNullAt(j)) { vals(n) = arr.getLong(j); n += 1 }
      j += 1
    }
    if (n == 0) return Array.emptyByteArray
    java.util.Arrays.sort(vals, 0, n)
    val buf = new Array[Byte](n * 10)
    var pos = writeVarint(buf, 0, zigzag(vals(0)))
    var i = 1
    while (i < n) {
      val gap = vals(i) - vals(i - 1)
      if (gap != 0) pos = writeVarint(buf, pos, gap)
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  /** Merge-walk two packed streams; intersection as a primitive long
    * array (triangle-bounded — tiny next to either input).
    */
  def intersect(a: Array[Byte], b: Array[Byte]): ArrayData = {
    var out = new Array[Long](8)
    var k = 0
    var ia = 0
    var ib = 0
    var va = 0L
    var vb = 0L
    var firstA = true
    var firstB = true
    def read(bytes: Array[Byte], pos0: Int): (Long, Int) = {
      var pos = pos0
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        val byte = bytes(pos)
        v |= (byte & 0x7fL) << shift
        shift += 7
        pos += 1
        more = (byte & 0x80) != 0
      }
      (v, pos)
    }
    def nextA(): Boolean =
      if (ia >= a.length) false
      else {
        val (raw, p) = read(a, ia)
        va = if (firstA) unzigzag(raw) else va + raw
        firstA = false
        ia = p
        true
      }
    def nextB(): Boolean =
      if (ib >= b.length) false
      else {
        val (raw, p) = read(b, ib)
        vb = if (firstB) unzigzag(raw) else vb + raw
        firstB = false
        ib = p
        true
      }
    var hasA = nextA()
    var hasB = nextB()
    while (hasA && hasB) {
      if (va == vb) {
        if (k == out.length) out = java.util.Arrays.copyOf(out, k * 2)
        out(k) = va
        k += 1
        hasA = nextA()
        hasB = nextB()
      } else if (va < vb) hasA = nextA()
      else hasB = nextB()
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }
}

/** `pack_varint(array<long>) -> binary` — see [[PackedAdjacency]]. */
case class PackVarint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_varint expects array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_varint"

  override def nullSafeEval(v: Any): Any =
    PackedAdjacency.pack(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PackedAdjacency.pack($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : PackVarint = copy(child = newChild)
}

/** `packed_intersect(binary, binary) -> array<long>` — see
  * [[PackedAdjacency]].
  */
case class PackedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == BinaryType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_intersect expects (binary, binary), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    PackedAdjacency.intersect(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PackedAdjacency.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedIntersect =
    copy(left = newLeft, right = newRight)
}

object PackedAdjacencyColumns {
  def packVarint(c: Column): Column = column(PackVarint(expression(c)))
  def packedIntersect(a: Column, b: Column): Column =
    column(PackedIntersect(expression(a), expression(b)))
}
