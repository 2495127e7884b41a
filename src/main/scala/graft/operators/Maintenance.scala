package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance utilities — the operational side of running a lake
  * at 100 TB, where streaming ingest and fine-grained partitioning leave
  * millions of small files that degrade every subsequent scan (driver
  * file listing, task-per-file scheduling, poor columnar compression).
  */
object Maintenance {

  /** Compact a parquet directory to approximately `targetBytes`-sized
    * files: one pass — size the input from the file listing, pick the
    * output file count, round-robin repartition (even output sizes
    * without a key), rewrite. The repartition shuffle is the cost and
    * the point: it is what evens out the skewed tiny inputs. Runs
    * per-partition-directory in a real deployment so only cold
    * partitions rewrite.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def dataFiles(dir: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(f => f.getPath.getName.endsWith(".parquet"))
    val inBytes = dataFiles(inDir).map(_.getLen).sum
    val nOut = math.max(1, math.ceil(inBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    dataFiles(outDir).length.toLong
  }
}
