package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Pipeline3Queries

/** Corpus census queries: the sampled two-pass heavy hitter must agree
  * with the exact census on the fixture, and the sketch profile
  * (HLL distinct + approx quantile) must sit inside its documented error
  * bounds against the exact twin.
  */
class CensusSpec extends AnyFunSuite {
  import TestSpark._

  test("sampled two-pass heavy hitters equal the exact top-20 on the fixture") {
    val exact = Queries.byName("text_hot_ngrams").build(spark, sfDir)
    val sampled = Queries.byName("text_hot_ngrams_sampled").build(spark, sfDir)
    assert(rows(sampled) == rows(exact),
      "every top-20 gram must have 1-in-7 sample support here; if the " +
        "fixture changes, widen the candidate pool")
  }

  test("sketch profile estimates sit inside error bounds vs the exact twin") {
    val exact = Queries.byName("stats_corpus_profile").build(spark, sfDir)
      .selectExpr("lang", "n_sources", "median_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val sketch = Pipeline3Queries.profileSketch.build(spark, sfDir).collect()
    assert(sketch.nonEmpty)
    sketch.foreach { r =>
      val lang = r.getString(0)
      val (nSources, median) = exact(lang)
      val hll = r.getLong(1)
      // default rsd 0.05; tiny cardinalities go through exact linear
      // counting, so 10% is generous
      assert(math.abs(hll - nSources) <= math.max(1L, (0.1 * nSources).toLong),
        s"$lang: hll=$hll exact=$nSources")
      val approxMed = r.getLong(2)
      // percentile_approx picks a data value at the target rank; the
      // exact twin averages the two middle values — they can differ by
      // one middle-gap, not more
      assert(math.abs(approxMed - median) <= 0.05 * median,
        s"$lang: approx median=$approxMed exact=$median")
    }
  }
}
