package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered variants of the corpus-hygiene sweeps.
  *
  * [[Dedup.contamination]] broadcasts the holdout gram set and is
  * explicit that holdouts are small BY CONTRACT — a corpus-sized
  * "holdout" fails loudly at the broadcast threshold. These variants
  * retire that contract: the small side is folded into a fixed-size
  * Bloom filter (size chosen from the target capacity and false-positive
  * rate, NOT from the data — 1 M keys at 1% FPR is ~1.14 MB regardless
  * of key width or corpus size), the 100 TB side probes the filter
  * map-side inside WholeStageCodegen, and only the probable rows — true
  * matches plus an `fpp` fraction of the big side — reach the exact
  * confirm join. Results are therefore EXACT at any scale (the confirm
  * join removes every false positive; a Bloom negative is a guaranteed
  * true negative), while the join input shrinks by ~1/fpp.
  *
  * This is the standard scale path when the "small" side outgrows a
  * broadcast hash map but a few megabytes of bitset still fit anywhere:
  * the reference has no analog (single-node, `qpmodel/Optimizer.cs`
  * plans only broadcast-free local joins); Spark's own optimizer applies
  * the same trick internally as InjectRuntimeFilter (SPARK-32268), which
  * is exactly the machinery reused here (`bloom_agg` /
  * `bloom_might_contain` in `GraftExtensions`).
  *
  * Capacity is a CONFIG, not a measurement: callers size `expectedItems`
  * from table stats (ANALYZE). Overfilling degrades the FPR — more rows
  * reach the confirm join, never a wrong result — and Spark clamps the
  * bitset at `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
  * (default 8 MB; a 100 TB deployment raises it and budgets ~10 bits
  * per expected key).
  */
object Bloom {
  private val viewSeq = new AtomicInteger

  /** Optimal bitset size for `expectedItems` keys at false-positive rate
    * `fpp`: m = -n·ln(p)/ln(2)², the textbook Bloom sizing (Bloom 1970).
    */
  def numBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: items=$expectedItems fpp=$fpp")
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
  }

  /** `big` with a `probable` flag: true iff xxhash64(big.keyCol) might be
    * in the set {xxhash64(small.smallKey)}. False is a GUARANTEED miss.
    *
    * The filter is built by one distributed aggregate over `small` and
    * reaches the probe as a scalar-subquery result (a literal at
    * execution — `BloomFilterMightContain` requires exactly that, so the
    * bitset deserializes once per task, not per row); the probe itself
    * is a codegen'd filter in `big`'s scan stage — `big` is never
    * shuffled, collected, or joined to produce the flag.
    */
  def probableFlag(big: DataFrame, keyCol: String, small: DataFrame,
                   smallKey: String, expectedItems: Long,
                   fpp: Double): DataFrame = {
    // Interpolated identifiers are backtick-quoted (with embedded
    // backticks doubled) so key columns needing quoting can't break or
    // alter the query text, and the temp views are dropped immediately
    // after analysis — the analyzed plan has inlined them, so execution
    // doesn't need the catalog entries and nothing accumulates over the
    // session lifetime (both r10 ADVICE findings).
    def quoted(name: String): String = "`" + name.replace("`", "``") + "`"
    val id = viewSeq.incrementAndGet()
    val vb = s"__graft_bloom_big_$id"
    val vs = s"__graft_bloom_small_$id"
    big.createOrReplaceTempView(vb)
    small.createOrReplaceTempView(vs)
    val bits = numBits(expectedItems, fpp)
    try {
      big.sparkSession.sql(
        s"""SELECT b.*, bloom_might_contain(
           |  (SELECT bloom_agg(xxhash64(${quoted(smallKey)}),
           |          ${expectedItems}L, ${bits}L)
           |   FROM $vs),
           |  xxhash64(b.${quoted(keyCol)})) AS probable
           |FROM $vb b""".stripMargin)
    } finally {
      big.sparkSession.catalog.dropTempView(vb)
      big.sparkSession.catalog.dropTempView(vs)
    }
  }

  /** The capacity-sizing measurement the scaladoc prescribes: the
    * distinct holdout gram count, the number a production deployment
    * reads from ANALYZE stats instead of recomputing (one cheap
    * distinct-count job either way — never part of the sweep itself).
    */
  def holdoutGramCount(holdout: DataFrame, n: Int = 8): Long =
    Dedup.wordGrams(holdout, "holdout_id", n).select("g").distinct().count()

  /** [[Dedup.contamination]] with the holdout gram set Bloom-folded
    * instead of broadcast: same output exactly (same n-gram semantics,
    * same `maxDf` boilerplate cap, FPs removed by the confirm join), but
    * no broadcast of anything holdout-sized — the holdout may be another
    * corpus. The train gram frame is probed map-side; only probable
    * grams (matches + ~fpp of the rest) enter the equi-join, which is
    * deliberately UNhinted: both remaining sides scale with their
    * corpora, so stats/AQE pick the join strategy.
    */
  def contaminationBloom(train: DataFrame, holdout: DataFrame, n: Int = 8,
                         maxDf: Int = 100, expectedItems: Long = 1L << 20,
                         fpp: Double = 0.01): DataFrame = {
    val t = Dedup.wordGrams(train, "train_id", n)
    val h = Dedup.wordGrams(holdout, "holdout_id", n)
    // df-cap join is holdout ⋈ holdout-gram-census — both holdout-sized,
    // so no broadcast pin here either (contrast Dedup.contamination).
    val hKept = h.join(
      h.groupBy("g").agg(countDistinct("holdout_id").as("df"))
        .filter(col("df") <= maxDf).select("g"),
      "g")
    // The filter is built from the UNCAPPED gram set: a Bloom filter may
    // soundly hold a superset of the join keys (extra members only admit
    // rows the exact confirm join then rejects), and skipping the df-cap
    // census inside the scalar subquery halves the holdout pipeline —
    // the census runs once, in the main plan, not again in the subquery.
    val probable = probableFlag(t, "g", h.select("g"), "g",
      expectedItems, fpp).filter(col("probable")).drop("probable")
    probable.join(hKept, "g")
      .groupBy("train_id")
      .agg(countDistinct("g").as("n_shared_grams"),
        countDistinct("holdout_id").as("n_holdout_docs"))
  }

  /** Exact-duplicate ingest gate: incoming docs whose full text (by md5)
    * already exists in the corpus are dropped; returns the kept
    * (doc_id, h) rows. The corpus fingerprint set is Bloom-folded, so
    * the common case — a new document — is decided map-side with NO join
    * at all (a Bloom negative is definitive); only probable dupes
    * (true dupes + ~fpp of the new docs) anti-join against the corpus
    * fingerprints to weed out false positives. At 100 TB the join input
    * is ingest-batch-sized × fpp, not corpus-sized, and the corpus side
    * of the anti-join prunes to the probable keys' partitions.
    */
  def ingestDedupBloom(existing: DataFrame, incoming: DataFrame,
                       expectedItems: Long = 1L << 20,
                       fpp: Double = 0.01): DataFrame = {
    val ex = existing.select(md5(col("text")).as("h"))
    val in = incoming.select(col("doc_id"), md5(col("text")).as("h"))
    val flagged = probableFlag(in, "h", ex, "h", expectedItems, fpp)
    val newForSure = flagged.filter(!col("probable")).drop("probable")
    val confirmedNew = flagged.filter(col("probable")).drop("probable")
      .join(ex, Seq("h"), "left_anti")
    newForSure.unionByName(confirmedNew).select("doc_id", "h")
  }
}
