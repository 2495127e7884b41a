package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitter summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * At most `k` counters survive a compress; inserts are buffered to 2k
  * between compressions so the amortized per-row cost is O(1) (each
  * O(k log k) compress admits ≥ k fresh items). `decTotal` accumulates
  * every subtraction applied, giving the summary its one-sided error
  * certificate: for every item, counter ≤ true-count ≤ counter +
  * decTotal, and decTotal ≤ n/(k+1) where n is the total weight seen —
  * so any item with true count > n/(k+1) is GUARANTEED present.
  */
final class MGSummary(val k: Int) {
  private[functions] val counts = mutable.HashMap.empty[String, Long]
  private[functions] var decTotal = 0L

  /** Subtract the (k+1)-th largest count from everything, drop ≤ 0 —
    * the Misra-Gries reduction, also used verbatim for merge.
    */
  private[functions] def compress(): Unit =
    if (counts.size > k) {
      val s = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decTotal += s
      counts.filterInPlace((_, c) => c > s)
      counts.mapValuesInPlace((_, c) => c - s)
    }

  def add(item: String, weight: Long = 1L): Unit = {
    counts.updateWith(item) {
      case Some(c) => Some(c + weight)
      case None => Some(weight)
    }
    if (counts.size >= 2 * k) compress()
  }

  def mergeFrom(other: MGSummary): Unit = {
    other.counts.foreach { case (g, c) =>
      counts.updateWith(g) { case Some(x) => Some(x + c); case None => Some(c) }
    }
    decTotal += other.decTotal
    compress()
  }

  /** Final rows, (counter desc, item asc): (item, c_lo, c_hi). */
  def result: Array[(String, Long, Long)] = {
    compress()
    counts.toArray.sortBy { case (g, c) => (-c, g) }
      .map { case (g, c) => (g, c, c + decTotal) }
  }
}

/** Native mergeable heavy-hitter aggregate: `heavy_hitters(item, k)`
  * returns `array<struct<item, c_lo, c_hi>>` — at most k items, each
  * with a certified count interval (c_lo ≤ true ≤ c_hi), containing
  * EVERY item whose true count exceeds n/(k+1).
  *
  * This is the single-pass, bounded-memory member of the census family:
  * the exact census (`text_hot_ngrams`) shuffles the full gram census;
  * the two-pass sample (`text_hot_ngrams_sampled`) reads the corpus
  * twice; this one reads once and shuffles exactly (partitions × k)
  * counters — Spark splits it into a partial MGSummary per partition
  * and a final merge, which is precisely the mergeable-summaries
  * distributed model. The price is approximation, but a CERTIFIED one:
  * the returned intervals are hard bounds, not estimates, so a caller
  * can act on c_lo (guaranteed boilerplate) or recount the ≤ k
  * candidates exactly (one broadcast-probe pass, as the sampled twin
  * does). Counters depend on partitioning (merge order), so there is
  * deliberately no cross-engine oracle; HeavyHitterSpec pins the
  * guarantees against the exact census instead.
  */
case class HeavyHittersAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(k > 0, s"heavy_hitters requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = item.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects a string item, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("c_lo", LongType, nullable = false),
    StructField("c_hi", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = item.eval(input)
    // .toString copies out of Spark's reused row buffer — required.
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MGSummary): Any =
    new GenericArrayData(buf.result.map { case (g, lo, hi) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(g), lo, hi))
    })

  override def serialize(buf: MGSummary): Array[Byte] = {
    buf.compress()
    val items = buf.counts.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      12 + items.length * 12 + bytes.map(_.length).sum)
    bb.putLong(buf.decTotal)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGSummary(k)
    buf.decTotal = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.put(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(item = newChildren(0))
}

object heavyHitters {
  /** Column API: certified heavy-hitter summary of a string column. */
  def apply(item: Column, k: Int): Column =
    column(HeavyHittersAgg(expression(item), k).toAggregateExpression())
}
