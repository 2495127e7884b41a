package graft

import org.apache.spark.sql.SparkSession

/** A/B measurement of [[graft.plans.ColumnGroupCertifiedBroadcast]] at a
  * given SF: the same correlated-composite-key probe as the
  * `colgroup_certified_broadcast` gate row, executed with and without
  * the registered column group, so BASELINE.md carries the measured
  * cost of the shuffle the certificate eliminates (and the plan each
  * side ran, so the numbers can't silently measure the same plan
  * twice).
  *
  *   sbt "runMain graft.ColumnGroupSoak /root/testdata/sf0.1 3"
  */
object ColumnGroupSoak {

  /** The gate query's shape with the realistic asymmetry: the
    * preserved side is the FULL-WIDTH fact table (the side a broadcast
    * spares from the shuffle), the enrichment side is the correlated
    * composite-key join output whose size Spark's min-per-key rule
    * over-states ~30x.
    */
  private val Probe =
    """SELECT w.l_orderkey, count(p.l_orderkey) AS pair_cnt,
      |       sum(w.l_extendedprice) AS price_sum
      |FROM gcgs_wide w LEFT JOIN
      |     (SELECT a.l_orderkey
      |      FROM gcgs_li a JOIN gcgs_li b
      |        ON a.l_partkey = b.l_partkey
      |       AND a.l_suppkey = b.l_suppkey) p
      |  ON p.l_orderkey = w.l_orderkey
      |GROUP BY w.l_orderkey""".stripMargin

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def runPasses(spark: SparkSession, passes: Int): Seq[Double] =
    (1 to passes).map { _ =>
      time(spark.sql(Probe).write.format("noop").mode("overwrite").save())._2
    }

  private def joinLine(spark: SparkSession): String =
    spark.sql(Probe).queryExecution.sparkPlan.toString.linesIterator
      .filter(l => l.contains("Join") && l.contains("l_orderkey"))
      .map(_.trim.take(90)).mkString(" | ")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(32, Some(sfDir))
    spark.sql("DROP TABLE IF EXISTS gcgs_li")
    spark.sql("DROP TABLE IF EXISTS gcgs_wide")
    spark.sql(s"""CREATE TABLE gcgs_li USING PARQUET AS
                 |SELECT l_orderkey, l_partkey, l_suppkey
                 |FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin)
    spark.sql(s"""CREATE TABLE gcgs_wide USING PARQUET AS
                 |SELECT * FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin)
    spark.sql("ANALYZE TABLE gcgs_li COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE gcgs_wide COMPUTE STATISTICS FOR ALL COLUMNS")

    val baseline = runPasses(spark, passes)
    val baseJoin = joinLine(spark)

    val ndv = graft.catalog.ExtendedStats.analyzeColumnGroup(
      spark, "gcgs_li", Seq("l_partkey", "l_suppkey"))
    val certified = runPasses(spark, passes)
    val certJoin = joinLine(spark)

    // Locale.ROOT: f"%.3f" under a comma-decimal default locale would
    // emit 2,640 and corrupt the JSON line.
    def s3(t: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    println(s"""{"sf_dir":"$sfDir","tuple_ndv":$ndv,""" +
      s""""baseline_sec":[${baseline.map(s3).mkString(",")}],""" +
      s""""certified_sec":[${certified.map(s3).mkString(",")}],""" +
      s""""baseline_join":"$baseJoin","certified_join":"$certJoin"}""")
    spark.sql("DROP TABLE IF EXISTS gcgs_li")
    spark.sql("DROP TABLE IF EXISTS gcgs_wide")
    spark.stop()
  }
}
