package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Trigram substring search: exact equality with the LIKE scan, the
  * false-candidate mechanism (trigram containment ignores adjacency —
  * the confirm probe must close it), and degenerate needles.
  */
class SearchSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("index search equals the LIKE scan on the corpus") {
    for (needle <- Seq("merge batch", "sort table", "zz never there zz")) {
      val viaIndex = Search.substringSearch(docs, needle)
      val viaScan = docs.filter(col("text").contains(needle)).select("doc_id")
      assert(rows(viaIndex) == rows(viaScan), s"needle '$needle'")
    }
    assert(Search.substringSearch(docs, "merge batch").count() > 0,
      "fixture needle must be non-vacuous")
  }

  test("a false candidate (all trigrams, wrong adjacency) is confirmed away") {
    val s = spark
    import s.implicits._
    val planted = Seq(
      (1L, "a merge batch here"),      // true match
      (2L, "value batch merge x"),     // every needle trigram, NOT contiguous
      (3L, "nothing relevant")
    ).toDF("doc_id", "text")
    val needle = "merge batch"
    val grams = needle.sliding(3).toSeq.distinct
    val cands = Search.trigramIndex(planted)
      .filter(col("g").isInCollection(grams))
      .groupBy("doc_id").agg(countDistinct("g").as("m"))
      .filter(col("m") === grams.size)
      .collect().map(_.getLong(0)).toSet
    assert(cands == Set(1L, 2L),
      s"doc 2 must be a candidate (trigram containment is adjacency-blind): $cands")
    val confirmed = Search.substringSearch(planted, needle)
      .collect().map(_.getLong(0)).toSet
    assert(confirmed == Set(1L), confirmed)
  }

  test("fuzzy search recovers one-typo matches that LIKE cannot see") {
    // every doc literally containing "merge batch" must survive a
    // one-typo probe at tau=0.7 (the typo kills ≤ 3 of 9 trigrams)
    val exactMatches = docs.filter(col("text").contains("merge batch"))
      .select("doc_id")
    val fuzzy = Search.fuzzySearch(docs, "merge batxh", 0.7).select("doc_id")
    assert(exactMatches.join(fuzzy, Seq("doc_id"), "left_anti").isEmpty,
      "an exact match fell below the fuzzy threshold")
    assert(exactMatches.count() > 0, "fixture needle must be non-vacuous")
    // the literal scan for the typo'd needle finds NOTHING — the recall
    // is the fuzzy index's alone
    assert(docs.filter(col("text").contains("merge batxh")).isEmpty)
  }

  test("needles shorter than a trigram are rejected loudly") {
    assertThrows[IllegalArgumentException](Search.substringSearch(docs, "ab"))
    assertThrows[IllegalArgumentException](Search.fuzzySearch(docs, "ab"))
    assertThrows[IllegalArgumentException](
      Search.fuzzySearch(docs, "abcdef", tau = 0.0))
  }
}
