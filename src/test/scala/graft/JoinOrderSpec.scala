package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Tables

/** Join-order stress assertions for the JOBench-style corpus (reference
  * optimizes 113 JOBench queries plan-only, `/root/reference/test/
  * UnitTest.cs:357-381`). Each query lists relations in a hostile FROM
  * order whose literal left-deep execution would start with a cartesian
  * product; the optimizer must rebuild a connected join order. We assert
  * (a) the executed plan is cartesian-free, and (b) the optimized join
  * tree's leaf order is NOT the literal FROM order — i.e. the reorder
  * actually happened, it didn't just survive by accident.
  */
class JoinOrderSpec extends AnyFunSuite {
  import TestSpark._

  Tables.registerAll(spark, sfDir)

  /** Left-to-right table-name sequence of the optimized plan's scan
    * leaves (DFS = join tree order). Temp views resolve to parquet
    * relations whose location path carries the table name.
    */
  private def leafTables(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val table = "(region|nation|customer|supplier|part|orders|lineitem|events|documents|embeddings)\\.parquet".r
    df.queryExecution.optimizedPlan.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          table.findFirstMatchIn(fs.location.rootPaths.mkString(","))
            .map(_.group(1)).getOrElse("?")
        case _ => "?"
      }
      case _ => "?"
    }
  }

  private val fromOrders = Map(
    "jobench_j1_two_regions" -> Seq("region", "region", "nation", "nation",
      "customer", "supplier", "orders", "lineitem", "part"),
    "jobench_j2_part_pair" -> Seq("part", "supplier", "lineitem", "nation",
      "region", "lineitem", "supplier", "nation"),
    "jobench_j3_nation_pair" -> Seq("nation", "nation", "part", "supplier",
      "lineitem", "orders", "customer", "region"),
    "jobench_j4_order_pair" -> Seq("customer", "part", "part", "orders",
      "lineitem", "nation", "region", "orders", "lineitem", "supplier"),
    "jobench_j5_multi_supplier" -> Seq("region", "region", "nation",
      "supplier", "lineitem", "orders", "customer", "nation", "lineitem",
      "part"),
    "jobench_j6_clickstream" -> Seq("events", "part", "customer", "orders",
      "lineitem", "nation", "region", "supplier", "nation"),
    "jobench_j7_same_nation" -> Seq("part", "customer", "lineitem",
      "supplier", "orders", "nation", "nation", "region", "region"),
    "jobench_j8_twelve_rel" -> Seq("region", "events", "part", "supplier",
      "customer", "orders", "lineitem", "lineitem", "nation", "nation",
      "region", "orders"),
    "jobench_j9_chain" -> Seq("region", "lineitem", "part", "region",
      "nation", "supplier", "orders", "customer", "nation"),
    "jobench_j10_double_snowflake" -> Seq("customer", "part", "lineitem",
      "supplier", "nation", "region", "orders", "nation", "region",
      "events"),
    "jobench_j11_event_pair" -> Seq("events", "part", "events", "customer",
      "orders", "lineitem", "nation", "region"),
    "jobench_j12_triple_self" -> Seq("lineitem", "orders", "part",
      "lineitem", "lineitem", "supplier", "nation"),
    "jobench_j13_customer_pair" -> Seq("customer", "lineitem", "customer",
      "nation", "region", "orders", "orders", "part"),
    "jobench_j14_diamond_cycle" -> Seq("nation", "orders", "part",
      "lineitem", "supplier", "customer", "nation", "region", "region"),
    "jobench_j15_coregion_suppliers" -> Seq("supplier", "orders", "part",
      "lineitem", "lineitem", "supplier", "nation", "nation", "region",
      "customer"),
    "jobench_j16_mega" -> Seq("region", "part", "events", "customer",
      "orders", "lineitem", "supplier", "nation", "region", "nation",
      "orders"))

  for ((name, fromOrder) <- fromOrders)
    test(s"$name: cartesian-free and reordered away from the FROM order") {
      val df = Queries.byName(name).build(spark, sfDir)
      val plan = finalPlan(df)
      assert(!plan.contains("CartesianProduct"), plan)
      // j3's nation pair is connected only by an OR'd name disjunction —
      // inherently a theta join between two constant-size 25-row dims, so
      // a broadcast nested loop there IS the right plan (TPC-H q7 has the
      // same shape). Everything else must stay pure hash joins.
      if (name != "jobench_j3_nation_pair")
        assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val leaves = leafTables(df)
      assert(leaves.sorted == fromOrder.sorted,
        s"leaf multiset mismatch — expected the query's relations, got $leaves")
      assert(leaves != fromOrder,
        s"optimizer kept the literal (cartesian-prone) FROM order: $leaves")
      // Result sanity: aggregates over a non-empty join.
      assert(df.collect().head.getLong(df.columns.indexOf("cnt")) > 0)
    }
}
