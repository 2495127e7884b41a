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
  // UTF8String-keyed with mutable long cells (r11 update-path constant
  // cut, ~2× at the 100× decade): the hot path — an EXISTING key — is
  // one byte-hash probe plus an in-place increment, with no UTF-16
  // decode (String), no boxing, and no Option/closure allocation. The
  // aggregate probes with Spark's REUSED row buffer ([[addProbe]]); a
  // copy is taken only on first insertion, i.e. at most 2k live keys'
  // worth per compress cycle, never per row.
  private[functions] val counts =
    new java.util.HashMap[UTF8String, MGSummary.Cell]()
  private[functions] var decTotal = 0L

  /** Subtract the (k+1)-th largest count from everything, drop ≤ 0 —
    * the Misra-Gries reduction, also used verbatim for merge.
    */
  private[functions] def compress(): Unit =
    if (counts.size > k) {
      val arr = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values.iterator
      while (vit.hasNext) { arr(i) = vit.next().n; i += 1 }
      java.util.Arrays.sort(arr)
      val s = arr(arr.length - 1 - k) // the (k+1)-th largest
      decTotal += s
      val eit = counts.entrySet.iterator
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue.n > s) e.getValue.n -= s else eit.remove()
      }
    }

  /** Probe with a possibly-REUSED buffer: zero-copy on hit; cloned into
    * the map only on first insertion.
    */
  def addProbe(item: UTF8String, weight: Long = 1L): Unit = {
    val c = counts.get(item)
    if (c != null) c.n += weight
    else {
      counts.put(item.clone(), new MGSummary.Cell(weight))
      if (counts.size >= 2 * k) compress()
    }
  }

  /** Insert an item the summary may keep WITHOUT copying — for merge /
    * deserialize paths whose keys are already owned.
    */
  private def addOwned(item: UTF8String, weight: Long): Unit = {
    val c = counts.get(item)
    if (c != null) c.n += weight
    else counts.put(item, new MGSummary.Cell(weight))
  }

  def add(item: String, weight: Long = 1L): Unit =
    addProbe(UTF8String.fromString(item), weight)

  def mergeFrom(other: MGSummary): Unit = {
    val eit = other.counts.entrySet.iterator
    while (eit.hasNext) {
      val e = eit.next()
      addOwned(e.getKey, e.getValue.n) // transient ≤ 3k entries, then
    }
    decTotal += other.decTotal
    compress()
  }

  /** Final rows, (counter desc, item asc): (item, c_lo, c_hi). */
  def result: Array[(String, Long, Long)] = {
    compress()
    val out = new Array[(String, Long, Long)](counts.size)
    var i = 0
    val eit = counts.entrySet.iterator
    while (eit.hasNext) {
      val e = eit.next()
      out(i) = (e.getKey.toString, e.getValue.n, e.getValue.n + decTotal)
      i += 1
    }
    out.sortBy { case (g, c, _) => (-c, g) }
  }
}

object MGSummary {
  /** Mutable counter cell — in-place increments keep the per-row update
    * allocation-free.
    */
  final class Cell(var n: Long)
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
    // addProbe probes with the reused row buffer zero-copy and clones
    // only on first insertion (the r11 hot-path contract).
    if (v != null) buf.addProbe(v.asInstanceOf[UTF8String])
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
    import scala.jdk.CollectionConverters._
    val items = buf.counts.entrySet.asScala.toArray
    val bytes = items.map(_.getKey.getBytes) // utf-8 already
    val bb = ByteBuffer.allocate(
      12 + items.length * 12 + bytes.map(_.length).sum)
    bb.putLong(buf.decTotal)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i).getValue.n)
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
      buf.counts.put(UTF8String.fromBytes(arr),
        new MGSummary.Cell(bb.getLong))
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

/** [[HeavyHittersAgg]] with BATCHED gram extraction (r11, the
  * update-path constant cut): one input row per DOCUMENT; the update
  * slides the per-doc-distinct word-trigram window in a single byte
  * scan of the text and probes the summary per gram — replacing the
  * split/transform/array_distinct/explode expression pipeline, whose
  * per-gram row machinery dominated the 100×/1000× census decades
  * (BASELINE.md r10: linear slope 1.06, CPU-bound in the update path).
  *
  * Gram semantics are IDENTICAL to the exploded form
  * (`Pipeline3Queries.grams3`): because the join character equals the
  * split character, a word trigram is exactly the contiguous byte span
  * from word i's start to word i+2's end (empty tokens from doubled
  * spaces included), so each gram is a ZERO-COPY UTF8String view into
  * the row buffer — copied only when the summary first admits it. The
  * per-doc distinct set holds transient views, discarded per row.
  * HeavyHitterSpec proves stream equality against the exploded path on
  * a single partition (same gram order → identical summary).
  */
case class HeavyHittersWordGramsAgg(
    text: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(k > 0, s"heavy_hitters_grams requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(text)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters_grams"

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters_grams expects a string document, got ${t.sql}")
  }

  override def dataType: DataType = HeavyHittersAgg(text, k).dataType

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = text.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      val base = t.getBaseObject
      val off = t.getBaseOffset
      val nb = t.numBytes
      // word start offsets: 0 and every byte after a 0x20 (single-space
      // split semantics, empty tokens included — matches Spark's
      // split(text, ' ') exactly); a space byte is never part of a
      // multi-byte utf-8 sequence, so the byte walk is codepoint-safe
      var words = 1
      var i = 0
      while (i < nb) {
        if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ')
          words += 1
        i += 1
      }
      if (words >= 3) {
        val starts = new Array[Int](words + 1)
        var w = 1
        i = 0
        while (i < nb) {
          if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
            starts(w) = i + 1; w += 1
          }
          i += 1
        }
        starts(words) = nb + 1 // sentinel: end(j) = starts(j+1) - 1
        val seen = new java.util.HashSet[UTF8String]()
        var g = 0
        while (g + 2 < words) {
          val from = starts(g)
          val until = starts(g + 3) - 1
          val view = UTF8String.fromAddress(base, off + from, until - from)
          if (seen.add(view)) buf.addProbe(view)
          g += 1
        }
      }
    }
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

  override def serialize(buf: MGSummary): Array[Byte] =
    HeavyHittersAgg(text, k).serialize(buf)
  override def deserialize(bytes: Array[Byte]): MGSummary =
    HeavyHittersAgg(text, k).deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int)
      : HeavyHittersWordGramsAgg = copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int)
      : HeavyHittersWordGramsAgg = copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersWordGramsAgg =
    copy(text = newChildren(0))
}

object heavyHittersWordGrams {
  /** Certified heavy-hitter summary of the per-doc-distinct word
    * trigrams of a text column — the batched-extraction twin of
    * [[heavyHitters]] over an exploded gram column.
    */
  def apply(text: Column, k: Int): Column =
    column(HeavyHittersWordGramsAgg(expression(text), k)
      .toAggregateExpression())
}
