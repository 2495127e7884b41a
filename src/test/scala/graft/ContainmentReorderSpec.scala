package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ExtendedStats

/** ContainmentJoinReorder: the containment statistics must change the
  * JOIN ORDER, not just the reported estimate — and must change nothing
  * without evidence.
  *
  * Scenario: a fact table whose composite key (k1, k2) is correlated —
  * tuple-ndv 4000 against per-key ndv 400. Spark prices the pair join
  * fact ⋈ dim with the MINIMUM per-key containment estimate
  * |F|·|D|/max(ndv_k) = 200k, 10× OVER the truth (20k: every fact pair
  * hits exactly one dim row), so its CBO reorder defers the pair join
  * and puts the t3 probe (priced 60k by both models) first. Under the
  * registered column-group ndv the pair join is 20k rows — the cheaper
  * first join — and the rule must restructure to dim-first, with
  * results identical.
  */
class ContainmentReorderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val tables = Seq("cjr_fact", "cjr_dim", "cjr_t3")

  override def beforeAll(): Unit = {
    spark = GraftSession.local(cores = 4)
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(
      """CREATE TABLE cjr_fact USING parquet AS
        |SELECT id % 400 AS k1, (id % 4000) div 10 AS k2, id % 200 AS k3,
        |       id AS payload
        |FROM range(20000)""".stripMargin)
    spark.sql(
      """CREATE TABLE cjr_dim USING parquet AS
        |SELECT k1, k2, k1 * 1000 + k2 AS dim_val
        |FROM (SELECT DISTINCT k1, k2 FROM cjr_fact)""".stripMargin)
    spark.sql(
      """CREATE TABLE cjr_t3 USING parquet AS
        |SELECT id % 200 AS k3, id AS t3_val FROM range(600)""".stripMargin)
    tables.foreach(t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    ExtendedStats.analyzeColumnGroup(spark, "cjr_fact", Seq("k1", "k2"))
    ExtendedStats.analyzeColumnGroup(spark, "cjr_dim", Seq("k1", "k2"))
  }

  override def afterAll(): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private val query =
    """SELECT f.payload, d.dim_val, t.t3_val
      |FROM cjr_fact f
      |JOIN cjr_dim d ON f.k1 = d.k1 AND f.k2 = d.k2
      |JOIN cjr_t3 t ON f.k3 = t.k3""".stripMargin

  /** Tables joined DEEPEST-first in the optimized plan's join tree. */
  private def joinOrder(df: DataFrame): Seq[String] = {
    def leaves(p: LogicalPlan): Seq[String] = p.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.catalogTable.isDefined => r.catalogTable.get.identifier.table
    }
    df.queryExecution.optimizedPlan.collect {
      case j: Join => leaves(j)
    }.lastOption.getOrElse(Nil) // deepest join = last in preorder collect
  }

  private def withMode[T](mode: String)(f: => T): T =
    GraftSession.withConf(spark, "spark.graft.containmentReorder", mode)(f)

  test("the over-estimated pair join is promoted: containment joins dim " +
    "first where Spark's min-per-key estimate deferred it behind t3") {
    val sparkOrder = withMode("off")(joinOrder(spark.sql(query)))
    val steered = withMode("apply")(joinOrder(spark.sql(query)))
    assert(sparkOrder.sorted == Seq("cjr_fact", "cjr_t3"),
      s"scenario lost its teeth: Spark now picks $sparkOrder first " +
        "(min-per-key overestimate gone?)")
    assert(steered.sorted == Seq("cjr_dim", "cjr_fact"),
      s"containment reorder did not fire: deepest join is $steered")
  }

  test("log mode prices the disagreement but rewrites nothing") {
    val off = withMode("off")(
      spark.sql(query).queryExecution.optimizedPlan.canonicalized)
    val log = withMode("log")(
      spark.sql(query).queryExecution.optimizedPlan.canonicalized)
    assert(off == log, "log mode changed the plan")
  }

  test("steered and unsteered plans return identical results") {
    val a = withMode("apply")(
      spark.sql(query).collect().map(_.toSeq).sortBy(_.toString))
    val b = withMode("off")(
      spark.sql(query).collect().map(_.toSeq).sortBy(_.toString))
    // every fact row matches exactly one dim pair and three t3 rows
    assert(a.length == 60000, s"unexpected result size ${a.length}")
    assert(a.toSeq == b.toSeq)
  }

  test("no evidence, no opinion: temp views plan identically with the " +
    "rule on and off") {
    // range()-derived views: no catalog relation, no column stats — the
    // evidence gate must leave these plans untouched
    spark.sql("""SELECT id % 400 AS k1, (id % 4000) div 10 AS k2,
                 |id % 200 AS k3, id AS payload FROM range(20000)"""
      .stripMargin).createOrReplaceTempView("cjr_fact_v")
    spark.sql("""SELECT k1, k2, k1 * 1000 + k2 AS dim_val FROM
                 |(SELECT DISTINCT k1, k2 FROM cjr_fact_v)"""
      .stripMargin).createOrReplaceTempView("cjr_dim_v")
    spark.sql("SELECT id % 200 AS k3, id AS t3_val FROM range(600)")
      .createOrReplaceTempView("cjr_t3_v")
    val q = query.replace("cjr_fact", "cjr_fact_v")
      .replace("cjr_dim", "cjr_dim_v").replace("cjr_t3", "cjr_t3_v")
    val on = withMode("apply")(
      spark.sql(q).queryExecution.optimizedPlan.canonicalized)
    val off = withMode("off")(
      spark.sql(q).queryExecution.optimizedPlan.canonicalized)
    assert(on == off)
  }
}
