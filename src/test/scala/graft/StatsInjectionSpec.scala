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
    val table = "(region|nation|customer|supplier|part|orders|lineitem|events)\\.parquet".r
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

  test("data-free planning: all 16 JOBench analogs plan like the ANALYZE path") {
    // The reference plans its full JOBench corpus from imported stats
    // with no data (`/root/reference/test/UnitTest.cs:357-381`). Same
    // sweep here: ANALYZE one set of catalog tables, export the stats,
    // create a FRESH set of external tables that are never analyzed,
    // inject, and require every JOBench analog's optimized join-leaf
    // order to be identical between the two — i.e. the CBO sees nothing
    // less through injection than through a full ANALYZE scan.
    val all = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events")
    def create(prefix: String): Unit = all.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}$t")
      spark.sql(
        s"CREATE TABLE ${prefix}$t USING PARQUET LOCATION '$sfDir/$t.parquet'")
    }
    create("stanj_")
    all.foreach(t =>
      spark.sql(s"ANALYZE TABLE stanj_$t COMPUTE STATISTICS FOR ALL COLUMNS"))
    val json = StatsImport.export(spark, all.map("stanj_" + _))
    create("stinjj_")
    StatsImport.inject(spark, json.replace("\"stanj_", "\"stinjj_"))

    val tableRe = ("\\b(" + all.mkString("|") + ")\\b").r
    def rewrite(sql: String, p: String): String =
      tableRe.replaceAllIn(sql, m => p + m.group(1))
    val defs = Queries.all.filter(_.name.startsWith("jobench_"))
    assert(defs.size == 16, s"expected 16 JOBench analogs, got ${defs.size}")
    defs.foreach { d =>
      val sql = d.sqlText.getOrElse(fail(s"${d.name} has no SQL text"))
      val anOrder = leafOrder(spark.sql(rewrite(sql, "stanj_")))
      val injOrder = leafOrder(spark.sql(rewrite(sql, "stinjj_")))
      assert(anOrder.nonEmpty, s"${d.name}: no recognizable join leaves")
      assert(anOrder == injOrder,
        s"${d.name}: injected-stats join order $injOrder != ANALYZE order $anOrder")
    }
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
