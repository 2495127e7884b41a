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
}
