package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row operators (shingling, per-word
  * hashing, signature computation).
  *
  * Spark parallelizes a parquet scan by row group; a source with fewer
  * row groups than cores (single-row-group files, small file counts)
  * pins every downstream narrow transformation to those few tasks — one
  * task computing every MinHash signature while 31 cores idle.
  *
  * `spread` repartitions ONLY when the source provides fewer partitions
  * than the cluster's parallelism. At 100 TB inputs arrive with
  * thousands of splits, so this is a no-op there (no added shuffle); it
  * exists for the small-file / local tail, and for CPU-bound stages
  * whose per-row cost dwarfs one round-robin exchange of their input.
  *
  * NOT for cheap scan-side work (plain filters/projections/partial
  * aggregation): those are better left in the scan task than paid for
  * with an exchange of the full input.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
