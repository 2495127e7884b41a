package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge.{column, expression}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary min-heap over (score, id) holding the k
  * best pairs seen, where "best" = highest score, ties broken by smallest
  * id (the deterministic rank order the engine's top-k queries use). The
  * heap root is the WORST kept pair, so admission is one comparison and
  * eviction is O(log k).
  *
  * Stored as parallel primitive arrays — no boxing on the hot update path.
  */
final class TopKBuffer(val k: Int) {
  private[functions] var size = 0
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)

  // a is WORSE than b (belongs nearer the root of the min-heap)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = d
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val s = scores(i); val d = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = s; ids(m) = d
      i = m
    }
  }

  def add(score: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept pairs, best first ((score desc, id asc)) — rank order. */
  def sorted: Array[(Double, Long)] =
    scores.take(size).zip(ids.take(size))
      .sortBy { case (s, i) => (-s, i) }
}

/** Native bounded-heap top-k aggregate: `top_k(score, id, k)` returns the
  * k best (id, score) pairs as `array<struct<nn_id, cos_sim>>` in rank
  * order.
  *
  * This is the scale-correct top-k plan shape: Spark splits it into a
  * partial aggregate (one k-bounded heap per input partition, running at
  * the corpus's full parallelism) and a final aggregate that merges
  * k-sized heaps — so the shuffle moves |groups| × k rows instead of the
  * entire scored set. The `row_number() OVER (PARTITION BY q)` alternative
  * shuffles ALL scored rows to |groups| partitions and sorts them: at
  * 100 TB that is a handful of tasks each sorting terabytes, while this
  * aggregate's final merge is O(|groups| × k log k) regardless of corpus
  * size.
  *
  * The reference has no native top-k operator at all (its LIMIT is a plain
  * stream truncation over a full sort, PhysicLimit
  * `/root/reference/qpmodel/PhysicalNode.cs:2065-2089`); this is the
  * Spark-idiomatic upgrade, same discipline as the fused VecCosineQ.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top_k requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType | FloatType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k expects (double/float score, long/int id), got (${s.sql}, ${i.sql})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nn_id", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  private lazy val scoreIsFloat = score.dataType == FloatType
  private lazy val idIsInt = id.dataType == IntegerType

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = if (scoreIsFloat) s.asInstanceOf[Float].toDouble
               else s.asInstanceOf[Double]
      val iv = if (idIsInt) i.asInstanceOf[Int].toLong
               else i.asInstanceOf[Long]
      buf.add(sv, iv)
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))
}

object topk {
  /** Column API: k best (id, score) pairs per group, rank-ordered. */
  def apply(score: Column, id: Column, k: Int): Column =
    column(BoundedTopK(expression(score), expression(id), k)
      .toAggregateExpression())
}
