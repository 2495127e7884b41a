package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Tables
import graft.functions.vec

/** The engine's core reproducibility claim, tested directly: results are
  * BIT-identical at any parallelism. Plain double sums give this up the
  * moment partitioning changes; the exact encodings (Sql.dsum,
  * vec.quantize, Udafs) do not.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  Tables.registerAll(spark, sfDir)

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("dsum is bit-identical across partition counts (1 vs 7 vs 32)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    def total(parts: Int): Map[String, Long] = {
      li.repartition(parts)
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.expr(
          graft.queries.Sql.dsum("l_extendedprice * (1 - l_discount)", 6))
          .as("s"))
        .collect()
        .map(r => r.getString(0) -> bits(r.getDouble(1))).toMap
    }
    val p1 = total(1)
    assert(total(7) == p1)
    assert(total(32) == p1)
  }

  test("plain double sum is NOT partition-stable here (motivating dsum)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    def total(parts: Int): Long = bits(
      li.repartition(parts)
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "l_extendedprice * (1 - l_discount)")))
        .head().getDouble(0))
    // Not asserted unequal (could coincide), but when the bits DO match
    // across two layouts it's luck, not a guarantee; record the common
    // case for documentation value: at least one of the alternate
    // layouts usually drifts from single-partition.
    val p1 = total(1)
    val drifted = Seq(7, 13, 32).map(total).exists(_ != p1)
    info(s"plain-double drift observed across layouts: $drifted")
  }

  test("quantized cosine is bit-identical across partition counts") {
    val e = Tables.load(spark, sfDir, "embeddings")
    import org.apache.spark.sql.functions._
    def scores(parts: Int): Map[Long, Long] = {
      val q = e.repartition(parts)
        .withColumn("qe", vec.quantize(col("embedding")))
      q.select(col("vec_id"),
          vec.cosine(col("qe"), col("qe")).as("c"))
        .collect().map(r => r.getLong(0) -> bits(r.getDouble(1))).toMap
    }
    assert(scores(1) == scores(32))
  }

  test("wavg UDAF merge order does not change the result (1 vs 32 parts)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    import org.apache.spark.sql.functions._
    val wavg = udaf(graft.functions.Udafs.WeightedAvg)
    def res(parts: Int): Map[String, Long] =
      li.repartition(parts)
        .groupBy("l_returnflag")
        .agg(wavg(col("l_quantity"), col("l_linenumber")).as("w"))
        .collect().map(r => r.getString(0) -> bits(r.getDouble(1))).toMap
    assert(res(1) == res(32))
  }

  test("bounded-heap top-k is identical across partition counts (1 vs 32)") {
    // The partial/final heap split must not depend on which rows land in
    // which partial: scores are exact quantized-cosine integers-over-IEEE
    // and ties break by id inside the heap ordering itself.
    val e = Tables.load(spark, sfDir, "embeddings")
    def run(parts: Int): Seq[Seq[Any]] = rows(
      graft.operators.Similarity.bruteForceTopK(
        e.repartition(parts), e.filter("vec_id < 3"), 5))
    assert(run(1) == run(32))
  }

  test("stratified hash-sample picks identical rows at any partitioning") {
    val d = Tables.load(spark, sfDir, "documents")
    def run(parts: Int): Seq[Seq[Any]] = rows(
      graft.operators.Sampling.stratifiedByHash(
        d.repartition(parts), "lang", "doc_id", 5))
    assert(run(1) == run(32))
  }

  test("IVF k-means assignment and top-k are partition-stable (1 vs 32)") {
    // Both assignment passes are narrow argmaxes over exact integers and
    // the Lloyd sums are order-independent, so the whole index build —
    // not just the final ranking — must be layout-invariant.
    val e = Tables.load(spark, sfDir, "embeddings")
    def run(parts: Int): Seq[Seq[Any]] = rows(
      graft.operators.Similarity.ivfKmeansTopK(
        e.repartition(parts), e.filter("vec_id < 5"), 3))
    assert(run(1) == run(32))
  }

  test("duplicate clusters converge to the same fixed point at any layout") {
    val d = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val planted = d.unionByName(
      d.filter("doc_id % 5 = 0")
        .selectExpr("doc_id + 10000 AS doc_id", "text"))
    def run(parts: Int): Seq[Seq[Any]] = rows(
      graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minHashPairs(planted.repartition(parts))))
    assert(run(1) == run(32))
  }

  test("sequence packing layout is identical at any partitioning") {
    val d = Tables.load(spark, sfDir, "documents").select("doc_id", "n_chars")
    def run(parts: Int): Seq[Seq[Any]] = rows(
      graft.operators.Sampling.packContexts(
        d.repartition(parts), "doc_id", "n_chars", 4096L, 4))
    assert(run(1) == run(32))
  }

  test("lmUnigramNll is bit-identical across partition counts (nano-nat sums)") {
    val d = Tables.load(spark, sfDir, "documents")
    def run(parts: Int): Map[Long, (Long, Long)] =
      graft.operators.TextAnalysis.lmUnigramNll(d.repartition(parts))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), bits(r.getDouble(2))))
        .toMap
    val p1 = run(1)
    assert(run(7) == p1)
    assert(run(32) == p1)
  }

  test("corpusOverlapSketch is bit-identical across partition counts") {
    val d = Tables.load(spark, sfDir, "documents")
    def run(parts: Int): Seq[Seq[Any]] = rows(
      graft.operators.Dedup.corpusOverlapSketch(d.repartition(parts)))
    val p1 = run(1)
    assert(run(7) == p1)
    assert(run(32) == p1)
  }

  test("asofJoin result is stable under input repartitioning") {
    val ev = Tables.load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    val clicks = ev.filter("event_type = 'click' AND user_id < 10")
      .select("event_id", "user_id", "ts")
    val views = ev.filter("event_type = 'view'")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_event_id"))
    def run(parts: Int): Set[(Long, Any)] =
      graft.operators.Temporal
        .asofJoin(clicks.repartition(parts), views.repartition(parts),
          "user_id", "ts", "view_ts")
        .collect()
        .map(r => (r.getAs[Long]("event_id"),
          r.getAs[Any]("view_event_id"))).toSet
    assert(run(1) == run(32))
  }
}
