package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.topk

/** Deterministic stratified sampling for training-data mixes: k documents
  * per stratum (language, source, quality band), chosen by md5 order —
  * reproducible on any engine, any partitioning, any run.
  *
  * The selection "k smallest content-hash values per group" is exactly a
  * bounded top-k, so it rides the native BoundedTopK aggregate: one
  * k-bounded heap per input partition, k-sized heap-union at final — a
  * single aggregate pass whose shuffle carries |strata| × k rows. The
  * window alternative (`row_number() OVER (PARTITION BY stratum ORDER BY
  * hash)`) shuffles and sorts the ENTIRE corpus into |strata| partitions;
  * at 100 TB with a handful of languages that is a handful of tasks
  * sorting terabytes. (Spark's `sampleBy` is Bernoulli — row-count only
  * approximate and dependent on partition layout; this is exact-k and
  * bit-deterministic.)
  *
  * The reference has no sampling beyond row-level Bernoulli
  * (`/root/reference/qpmodel/PhysicalNode.cs` PhysicSampleScan); exact-k
  * stratified selection is the training-pipeline upgrade.
  */
object Sampling {

  /** k ids per stratum, selected by ascending md5 of the id (a fixed,
    * engine-reproducible pseudo-random order). Output: one row per
    * selected (stratum, id) with its selection rank 1..k.
    *
    * The hash score is the first 12 hex digits of md5 as a BIGINT —
    * integral and < 2^48, so its DOUBLE image is exact and orders
    * identically in any engine. Negated because BoundedTopK keeps the
    * HIGHEST scores: max(-h) = min(h).
    */
  def stratifiedByHash(df: DataFrame, stratum: String, id: String,
                       k: Int): DataFrame =
    df.select(col(stratum).as("stratum"), col(id).as("__id"))
      .withColumn("__score",
        -expr(s"conv(substring(md5(CAST(__id AS STRING)), 1, 12), 16, 10)")
          .cast("double"))
      .groupBy("stratum")
      .agg(topk(col("__score"), col("__id"), k).as("tk"))
      .select(col("stratum"), posexplode(col("tk")))
      .select(col("stratum"), (col("pos") + 1).as("pick_rank"),
        col("col.nn_id").as(id))

  /** Per-row weighted Bernoulli keep: keep a row iff its hash fraction
    * (first 12 md5 hex digits / 2^48 — uniform on [0,1), exact in
    * DOUBLE) falls below its weight expression. Deterministic per id, so
    * resampling with a higher rate KEEPS every previously kept row (the
    * rates nest) — the property that lets a pipeline up-sample a source
    * without reshuffling what it already emitted. Pure narrow projection:
    * no shuffle at any scale.
    */
  def weightedKeep(df: DataFrame, id: String, weightExpr: String): DataFrame = {
    require(!df.columns.contains("__frac"),
      "weightedKeep reserves the __frac column")
    df.withColumn("__frac",
        expr(s"conv(substring(md5(CAST($id AS STRING)), 1, 12), 16, 10)")
          .cast("double") / math.pow(2, 48))
      .filter(col("__frac") < expr(weightExpr))
      .drop("__frac")
  }

  /** Deterministic shuffle-and-shard for training-data interleaving:
    * every row lands in a hash-assigned shard, ordered within its shard
    * by (md5, id) — the "shuffle the corpus identically on every rerun,
    * then hand shard files to trainers" step. One shuffle on the shard
    * key and a per-shard sort (the within-shard rank window partitions
    * on shard, so it runs |shards|-way parallel — a GLOBAL rank window
    * would funnel the corpus into one task, the pattern BoundedTopK
    * exists to avoid; shard ranks are what shard files need anyway).
    */
  def deterministicShard(df: DataFrame, id: String, nShards: Int): DataFrame = {
    require(Seq("__h", "shard", "shard_rank").forall(!df.columns.contains(_)),
      "deterministicShard reserves __h/shard/shard_rank")
    df.withColumn("__h", md5(col(id).cast("string")))
      .withColumn("shard",
        expr(s"pmod(conv(substring(__h, 1, 12), 16, 10), $nShards)")
          .cast("int"))
      .withColumn("shard_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("__h"), col(id))))
      .drop("__h")
  }

  /** Sequence packing (concat-then-chunk): documents are laid end to end
    * in the deterministic shard order and cut into fixed `budget`-token
    * contexts; a document's context is where its span STARTS (spans may
    * cross context boundaries — the standard packed-pretraining layout).
    * One running-sum window per shard (|shards|-way parallel), exact
    * integer arithmetic throughout.
    */
  def packContexts(df: DataFrame, id: String, tokensCol: String,
                   budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    require(Seq("__h", "__end", "__start", "shard")
        .forall(!df.columns.contains(_)),
      "packContexts reserves __h/__end/__start/shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(id))
    df.withColumn("__h", md5(col(id).cast("string")))
      .withColumn("shard",
        expr(s"pmod(conv(substring(__h, 1, 12), 16, 10), $nShards)")
          .cast("int"))
      .withColumn("__end", sum(col(tokensCol)).over(w))
      .withColumn("__start", col("__end") - col(tokensCol))
      .select(col(id), col("shard"),
        // integer division, NOT double-divide-then-cast: DuckDB's
        // double->int cast rounds where Spark's truncates
        expr(s"__start div $budget").as("ctx_id"),
        (col("__start") % budget).as("ctx_offset"))
  }
}
