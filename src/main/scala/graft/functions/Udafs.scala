package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (Spark `Aggregator`s) — the engine's user-defined
  * aggregate surface, completing SURVEY §2.12 beyond scalar UDFs
  * (reference `Register<>` ExprFunc.cs:42-76; the reference has no UDAF
  * path at all).
  *
  * An Aggregator supplies explicit zero/reduce/merge, so Catalyst splits
  * it partial/final like a builtin: partials combine map-side, only one
  * small buffer per group crosses the shuffle — the two-phase shape that
  * scales.
  */
object Udafs {

  /** Weighted-mean buffer: sum of weights and weighted values. Over
    * integer-valued doubles (the corpus use case) both sums stay exact
    * in IEEE doubles far past 2^50 terms, so results are deterministic
    * under any partitioning/merge order.
    */
  final case class WAvgBuf(var sw: Double, var swx: Double)

  /** wavg(x, w): weighted arithmetic mean Σwx / Σw. */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
      val (x, w) = in
      b.sw += w; b.swx += w * x; b
    }
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
      a.sw += b.sw; a.swx += b.swx; a
    }
    override def finish(b: WAvgBuf): Double =
      if (b.sw == 0.0) Double.NaN else b.swx / b.sw
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
