package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BoundedTopK, TopKBuffer}
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Property tests for the bounded top-k heap: against a sort-based
  * reference, under arbitrary partitioning + merge (the partial/final
  * split Spark applies), and through the shuffle serde.
  */
class TopKSpec extends AnyFunSuite {

  private def ref(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  private def fill(xs: Seq[(Double, Long)], k: Int): TopKBuffer = {
    val b = new TopKBuffer(k)
    xs.foreach { case (s, i) => b.add(s, i) }
    b
  }

  test("heap equals sort-based reference on random inputs (with ties)") {
    val rnd = new Random(42)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(200) + 1
      val k = rnd.nextInt(20) + 1
      // small score domain forces ties → exercises the id tiebreak
      val xs = Seq.fill(n)((rnd.nextInt(10).toDouble, rnd.nextLong() % 1000))
      assert(fill(xs, k).sorted.toSeq == ref(xs, k), s"trial $trial")
    }
  }

  test("merge of arbitrary partitions equals global top-k") {
    val rnd = new Random(7)
    for (trial <- 1 to 30) {
      val xs = Seq.fill(rnd.nextInt(300) + 10)(
        (rnd.nextDouble(), rnd.nextLong() % 10000))
      val k = rnd.nextInt(15) + 1
      val parts = xs.grouped(rnd.nextInt(40) + 1).toSeq
      val merged = parts.map(fill(_, k)).reduce { (a, b) => a.mergeFrom(b); a }
      assert(merged.sorted.toSeq == ref(xs, k), s"trial $trial")
    }
  }

  test("serialize/deserialize round-trips through the aggregate") {
    val agg = BoundedTopK(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), 5)
    val rnd = new Random(3)
    val xs = Seq.fill(100)((rnd.nextDouble(), rnd.nextLong() % 100))
    val buf = fill(xs, 5)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sorted.toSeq == buf.sorted.toSeq)
  }
}
