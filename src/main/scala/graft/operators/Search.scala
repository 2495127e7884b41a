package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trigram-index substring search (the pg_trgm pattern, Spark-first).
  *
  * A literal `LIKE '%needle%'` is unindexable by min/max pruning — at
  * 100 TB it is a full-corpus scan per query. The trigram route builds
  * a posting index ONCE (char 3-grams → doc_id, per-doc distinct, the
  * same offline artifact discipline as `TextAnalysis.invertedIndex`),
  * then answers a needle by (1) probing ONLY the needle's ≤ |needle|−2
  * posting lists, (2) keeping docs that hold ALL of them — a superset
  * of the true matches, since trigram containment ignores adjacency —
  * and (3) confirming with one `contains()` over the candidates only.
  * Results are therefore EXACT; the full scan is replaced by
  * |needle-grams| posting probes + a candidate-sized confirm.
  *
  * The reference's only text search is LIKE itself
  * (`/root/reference/qpmodel/Expr.cs` LikeExpr); this is the operator a
  * corpus-scale deployment actually runs.
  */
object Search {

  /** Char-trigram posting frame: (g, doc_id), per-doc distinct.
    * Built once per corpus; a deployment persists it bucketed by `g`.
    */
  def trigramIndex(docs: DataFrame): DataFrame =
    Par.spread(docs.select(col("doc_id"), col("text")))
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(1, length(text) - 2),
          |  i -> substring(text, i, 3)))""".stripMargin)).as("g"))

  /** doc_ids whose text contains `needle`, exact, via [[trigramIndex]].
    * The candidate set (all-grams-present) over-approximates — trigram
    * containment ignores adjacency — and the final `contains` probe
    * closes it, touching only candidates, never the corpus.
    */
  def substringSearch(docs: DataFrame, needle: String): DataFrame =
    substringSearchWithIndex(trigramIndex(docs), docs, needle)

  /** [[substringSearch]] against an already-built (normally persisted)
    * index — the deployment path: the index parquet is range-partitioned
    * and sorted by `g`, so the `g IN (needle grams)` probe prunes to the
    * few row groups holding those postings (PushedFilters does the
    * rest); the corpus itself is touched only for the candidate rows.
    */
  def substringSearchWithIndex(index: DataFrame, docs: DataFrame,
                               needle: String): DataFrame = {
    require(needle.length >= 3,
      s"substring search needs a needle of ≥ 3 chars, got '$needle'")
    val grams = needle.sliding(3).toSeq.distinct
    val cand = index
      .filter(col("g").isInCollection(grams))
      .groupBy("doc_id").agg(countDistinct("g").as("m"))
      .filter(col("m") === grams.size)
      .select("doc_id")
    docs.join(cand, "doc_id")
      .filter(col("text").contains(needle))
      .select("doc_id")
  }

  /** Typo-tolerant search on the same index: docs holding at least
    * `tau` of the NEEDLE's distinct trigrams (containment, the pg_trgm
    * `%`-operator family). A needle with a typo loses only the ≤ 3
    * trigrams overlapping the typo'd character, so one-typo recall is a
    * function of needle length: τ guarantees every one-typo match iff
    * ceil(τ·g) ≤ g−3 over the needle's g distinct trigrams — at τ = 0.7
    * that needs g ≥ 10 (a mid-needle typo on a 9-gram needle kills 3
    * grams and would be missed; an end typo kills only 2). Callers with
    * shorter needles should derive τ ≤ (g−3)/g instead of using the
    * default. EXACT by construction — the
    * posting-probe count IS the similarity (no confirm needed, unlike
    * [[substringSearch]]'s adjacency-blind candidates); only the
    * needle's ≤ |needle|−2 posting lists are ever read.
    */
  def fuzzySearch(docs: DataFrame, needle: String,
                  tau: Double = 0.7): DataFrame = {
    require(needle.length >= 3,
      s"fuzzy search needs a needle of ≥ 3 chars, got '$needle'")
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val grams = needle.sliding(3).toSeq.distinct
    val need = math.ceil(tau * grams.size).toLong
    trigramIndex(docs)
      .filter(col("g").isInCollection(grams))
      .groupBy("doc_id").agg(countDistinct("g").as("shared"))
      .filter(col("shared") >= need)
  }

  /** Persist the index in probe-friendly layout: range-partitioned and
    * sorted by `g`, so per-gram probes prune at row-group granularity.
    */
  def writeTrigramIndex(docs: DataFrame, path: String,
                        partitions: Int = 64): Unit =
    trigramIndex(docs)
      .repartitionByRange(partitions, col("g"))
      .sortWithinPartitions("g")
      .write.mode("overwrite").parquet(path)
}
