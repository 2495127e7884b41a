package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.StatsImport

/** External stats injection (reference imports Presto-format stats and
  * plans JOBench data-free, `/root/reference/qpmodel/PrestoStats.cs:38-119`).
  * The contract under test: injecting the SAME numbers ANALYZE would have
  * computed makes CBO plan the SAME join order — no data scan needed.
  */
class StatsInjectionSpec extends AnyFunSuite {
  import TestSpark._

  private val tables = Seq("customer", "orders", "lineitem", "nation", "region")

  private def createExternal(prefix: String): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}$t")
    spark.sql(
      s"CREATE TABLE ${prefix}$t USING PARQUET LOCATION '$sfDir/$t.parquet'")
  }

  /** Hostile FROM order: the literal left-deep tree opens with
    * region × lineitem (cartesian); connected order requires reordering.
    */
  private def hostileJoin(p: String): DataFrame = spark.sql(
    s"""SELECT r_name, COUNT(*) AS cnt
       |FROM ${p}region, ${p}lineitem, ${p}customer, ${p}orders, ${p}nation
       |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
       |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |GROUP BY r_name""".stripMargin)

  /** Join-tree leaf order of the optimized plan, as base table names. */
  private def leafOrder(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val table = "(region|nation|customer|supplier|part|orders|lineitem)\\.parquet".r
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          table.findFirstMatchIn(fs.location.rootPaths.mkString(","))
            .map(_.group(1))
        case _ => None
      }
      case _ => None
    }
  }

  test("injected stats == ANALYZE stats, and CBO reorders identically") {
    createExternal("stan_")
    tables.foreach(t =>
      spark.sql(s"ANALYZE TABLE stan_$t COMPUTE STATISTICS FOR ALL COLUMNS"))

    // Round-trip: export the ANALYZE-computed stats, re-key them to the
    // injection-side table names, inject — no ANALYZE on stinj_*.
    val json = StatsImport.export(spark, tables.map("stan_" + _))
    createExternal("stinj_")
    val injected = StatsImport.inject(spark, json.replace("\"stan_", "\"stinj_"))
    assert(injected.toSet == tables.map("stinj_" + _).toSet)

    // The injected relation carries rowCount + column stats for CBO.
    val anStats = spark.table("stan_lineitem").queryExecution.optimizedPlan.stats
    val injStats = spark.table("stinj_lineitem").queryExecution.optimizedPlan.stats
    assert(injStats.rowCount.isDefined && injStats.rowCount == anStats.rowCount,
      s"injected rowCount ${injStats.rowCount} != analyzed ${anStats.rowCount}")
    assert(injStats.attributeStats.nonEmpty, "expected injected column stats")
    // The session computes equi-height histograms under ANALYZE
    // (statistics.histogram.enabled=true) — they must survive the
    // export→inject round trip, not silently drop.
    assert(anStats.attributeStats.exists(_._2.histogram.isDefined),
      "precondition: ANALYZE produced histograms")
    assert(injStats.attributeStats.exists(_._2.histogram.isDefined),
      "histograms were lost in the export->inject round trip")

    // Same stats -> same CBO join order, away from the hostile FROM order.
    val an = hostileJoin("stan_")
    val inj = hostileJoin("stinj_")
    val (anOrder, injOrder) = (leafOrder(an), leafOrder(inj))
    assert(anOrder == injOrder,
      s"injected-stats join order $injOrder != analyzed $anOrder")
    assert(injOrder != Seq("region", "lineitem", "customer", "orders", "nation"),
      "optimizer left the hostile FROM order in place")
    val plan = finalPlan(inj)
    assert(!plan.contains("CartesianProduct"), plan)
    // Identical results too (stats change plans, never answers).
    assert(rows(an) == rows(inj))
  }

  test("inject plans from hand-authored JSON without any ANALYZE") {
    spark.sql("DROP TABLE IF EXISTS stjson_nation")
    spark.sql(
      s"CREATE TABLE stjson_nation USING PARQUET LOCATION '$sfDir/nation.parquet'")
    StatsImport.inject(spark,
      """{"tables": {"stjson_nation": {
        |  "rowCount": 25, "sizeInBytes": 2048,
        |  "columns": {
        |    "n_nationkey": {"ndv": 25, "nullCount": 0, "min": "0",
        |                    "max": "24", "avgLen": 4, "maxLen": 4}}}}}""".stripMargin)
    val stats = spark.table("stjson_nation").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(25)), stats)
    assert(stats.attributeStats.nonEmpty)
  }
}
