package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bloom, Dedup}

/** Bloom-filter pre-filtered hygiene sweeps: exactness (equal to the
  * broadcast/exact twins row for row), the one-sided error contract
  * (a Bloom negative is a guaranteed miss), the FPR budget, and the plan
  * shape (the probe is a map-side filter — no shuffle, no join, of the
  * probed side).
  */
class BloomSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("numBits matches the textbook sizing") {
    // 1M items at 1% -> ~9.59 bits/key
    val b = Bloom.numBits(1L << 20, 0.01)
    assert(b > 10000000L && b < 10100000L)
    assertThrows[IllegalArgumentException](Bloom.numBits(0, 0.01))
    assertThrows[IllegalArgumentException](Bloom.numBits(10, 1.5))
  }

  test("a Bloom negative is a guaranteed miss (one-sided error)") {
    val ex = docs.filter("doc_id % 2 = 0").select(md5(col("text")).as("h"))
    val in = docs.filter("doc_id % 3 = 0")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val flagged = Bloom.probableFlag(in, "h", ex, "h", 1L << 20, 0.01)
    val negatives = flagged.filter(!col("probable")).select("h")
    assert(negatives.join(ex, "h").isEmpty,
      "a row the filter rejected was present in the set")
  }

  test("false-positive rate stays inside ~3x the configured budget") {
    val ex = docs.filter("doc_id % 2 = 0").select(md5(col("text")).as("h"))
    val in = docs.filter("doc_id % 3 = 0")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val flagged = Bloom.probableFlag(in, "h", ex, "h", 1L << 20, 0.01)
    val probable = flagged.filter(col("probable")).count()
    val trueHits = in.join(ex.distinct(), "h").count()
    val probes = in.count()
    assert(probable >= trueHits, "the filter missed a true member")
    assert(probable <= trueHits + math.max(3, 0.03 * probes),
      s"probable=$probable vs true=$trueHits over $probes probes")
  }

  test("contaminationBloom equals the broadcast-exact contamination") {
    val train = docs.filter("doc_id % 5 != 0")
    val holdout = docs.filter("doc_id % 5 = 0")
    val exact = Dedup.contamination(train, holdout)
    val bloom = Bloom.contaminationBloom(train, holdout)
    assert(rows(bloom) == rows(exact))
    assert(bloom.count() > 0, "fixture must have real contamination")
  }

  test("ingestDedupBloom equals the plain anti-join") {
    val ex = docs.filter("doc_id % 2 = 0")
    val in = docs.filter("doc_id % 3 = 0")
    val plain = in.select(col("doc_id"), md5(col("text")).as("h"))
      .join(ex.select(md5(col("text")).as("h")), Seq("h"), "left_anti")
      .select("doc_id", "h")
    val bloom = Bloom.ingestDedupBloom(ex, in)
    assert(rows(bloom) == rows(plain))
    // both paths exercised: some drops (ids % 6 = 0) and some keeps
    val kept = bloom.count()
    val incoming = in.count()
    assert(kept > 0 && kept < incoming,
      s"fixture must drop some and keep some (kept $kept of $incoming)")
  }

  test("streaming bloom gate equals the batch gate (same kept set)") {
    val batch = graft.operators.Bloom.ingestDedupBloom(
      docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 3 = 0"))
      .agg(count(lit(1)).as("n_kept"),
        sum("doc_id").cast("long").as("sum_ids"))
    val stream = graft.streaming.Streams.ingestBloomAvailableNow(
      spark, sfDir, "bloom_gate_spec")
    assert(rows(stream) == rows(batch))
  }

  test("the probe is map-side: no exchange, no join, in the flagged plan") {
    val ex = docs.filter("doc_id % 2 = 0").select(md5(col("text")).as("h"))
    val in = docs.filter("doc_id % 3 = 0")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val df = Bloom.probableFlag(in, "h", ex, "h", 1L << 20, 0.01)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("might_contain("),
      "probe expression missing from the executed plan")
    // The tree string includes the bloom-building scalar subquery, whose
    // global aggregate legitimately carries ONE SinglePartition exchange
    // (it reduces the set side to a bitset). Beyond that, the probed
    // side must see no data-partitioning exchange and no join operator.
    val s = plan.toString
    assert(!s.contains("Exchange hashpartitioning"),
      s"probing must not shuffle the probed side:\n$s")
    assert(!Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").exists(s.contains),
      s"probing must not join the probed side:\n$s")
  }
}
