package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr, max, min}

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

  /** Z-order (Morton-curve) layout rewrite: cluster a table's files on
    * the interleaved bits of two columns so that a 2-D range predicate
    * prunes most row groups on BOTH dimensions — what Delta/Iceberg's
    * OPTIMIZE ZORDER does, rebuilt on vanilla parquet. A single sort
    * column gives tight min/max file stats on one dimension and
    * full-range stats on every other; the Morton curve trades a little
    * tightness on each dimension for locality on all of them, which is
    * the difference between scanning 1/√F and scanning every file when
    * the filter constrains two columns at once.
    *
    * Shape: one 1-row min/max aggregate (broadcast back onto the scan),
    * the z-value as a fused codegen'd bit-interleave expression (an
    * `aggregate` fold over 16 bit positions — no UDF), then ONE
    * range-partitioning shuffle (`repartitionByRange` samples the
    * z-distribution, so files come out evenly sized even under skew) and
    * a within-partition sort that makes each row group's z-range — and
    * therefore both columns' min/max — tight. At 100 TB this runs
    * per-partition-directory like [[compact]], and the one shuffle IS
    * the price of every later scan reading 100× less.
    *
    * The layout changes bytes on disk, never results: the paired
    * QueryDef's oracle runs the probe over the ORIGINAL table, and
    * OperatorSpec measures the actual row-group pruning win vs a
    * linear layout via scan SQLMetrics.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  outDir: String, nFiles: Int, bits: Int = 16): Unit = {
    // Internal working columns use a reserved prefix so a user table with
    // a column literally named "z"/"za"/"za_min" is never overwritten
    // (withColumn REPLACES silently) and never dropped from the rewrite.
    val internal = Seq("__zg_amin", "__zg_amax", "__zg_bmin", "__zg_bmax",
      "__zg_a", "__zg_b", "__zg_z")
    require(internal.forall(!df.columns.contains(_)),
      s"zorderWrite reserves column names ${internal.mkString(", ")}")
    val scaleMax = (1L << bits) - 1
    val stats = df.agg(
      min(col(colA)).cast("double").as("__zg_amin"),
      max(col(colA)).cast("double").as("__zg_amax"),
      min(col(colB)).cast("double").as("__zg_bmin"),
      max(col(colB)).cast("double").as("__zg_bmax"))
    val bucket = (c: String, lo: String, hi: String) =>
      s"CAST(round(($c - $lo) / greatest($hi - $lo, 1e-300) * $scaleMax) AS BIGINT)"
    df.crossJoin(broadcast(stats))
      .withColumn("__zg_a", expr(bucket(colA, "__zg_amin", "__zg_amax")))
      .withColumn("__zg_b", expr(bucket(colB, "__zg_bmin", "__zg_bmax")))
      .withColumn("__zg_z", expr(
        s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
           |  acc | shiftleft(shiftright(__zg_a, i) & 1, 2 * i + 1)
           |      | shiftleft(shiftright(__zg_b, i) & 1, 2 * i))""".stripMargin))
      .repartitionByRange(nFiles, col("__zg_z"))
      .sortWithinPartitions("__zg_z")
      .drop(internal: _*)
      .write.mode("overwrite").parquet(outDir)
  }
}
