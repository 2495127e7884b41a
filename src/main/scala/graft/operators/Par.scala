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
    // Estimate the scan's split count from the file listing (already cached
    // by the shared FileIndex) instead of df.rdd.getNumPartitions, which
    // eagerly builds the whole physical plan + RDD lineage at construction
    // time. Scan-rooted inputs (the only place spread() is used) split at
    // most per-file locally (single-row-group testdata) and at least
    // per-file at scale, so file count is the honest lower bound. Inputs
    // with no file source (post-shuffle) are already cluster-parallel:
    // leave them alone.
    val files = df.queryExecution.analyzed.collectLeaves().map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.length
          case _ => Int.MaxValue
        }
      case _ => Int.MaxValue
    }
    val estimate = if (files.isEmpty) Int.MaxValue else files.min
    if (estimate < target) df.repartition(target) else df
  }
}
