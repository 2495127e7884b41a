package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The engine-surface contract of [[graft.plans.CorrelationRepair]]:
  * reference-legal multi-level correlation runs at [[SqlRunner.exec]]
  * under the opt-in conf, clean SQL is NEVER rewritten, and with the
  * conf off the analyzer error surfaces untouched.
  */
class CorrelationRepairSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val ConfKey = graft.plans.CorrelationRepair.ConfKey

  private val twoLevel =
    "select a1 from a where a.a1 = (select b1 from b bo where b2 = a2 " +
      "and b1 = (select b1 from b where b3 = a3 and b3>1) and b2<3)"

  override def beforeAll(): Unit = {
    spark = GraftSession.local(cores = 4)
    Seq("a" -> "a", "b" -> "b").foreach { case (v, p) =>
      spark.sql(
        s"""CREATE OR REPLACE TEMP VIEW $v AS
           |SELECT id AS ${p}1, id+1 AS ${p}2, id+2 AS ${p}3, id+3 AS ${p}4
           |FROM range(3)""".stripMargin)
    }
  }

  override def afterAll(): Unit =
    spark.conf.unset(ConfKey)

  test("opt-in off (the default): the analyzer rejection surfaces, " +
    "nothing is rewritten") {
    spark.conf.unset(ConfKey)
    val e = intercept[Exception](SqlRunner.exec(spark, twoLevel))
    assert(Option(e.getMessage).exists(_.contains("UNRESOLVED_COLUMN")),
      s"expected the raw analyzer error, got: ${e.getMessage}")
  }

  test("opt-in on: the reference-verbatim two-level statement runs at " +
    "the engine surface (UnitTest.cs:1046 expects 0;1)") {
    spark.conf.set(ConfKey, "true")
    try {
      val rows = SqlRunner.exec(spark, twoLevel)
        .collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(0L, 1L))
    } finally spark.conf.unset(ConfKey)
  }

  test("clean SQL is never rewritten: statements that analyze resolve " +
    "to the identical plan with the conf on") {
    // same sub-query nesting flavor, but legal one-level correlation
    val clean =
      "select a1 from a where a.a1 = (select min(b1) from b where b2 = a2)"
    spark.conf.unset(ConfKey)
    val off = SqlRunner.exec(spark, clean)
      .queryExecution.analyzed.canonicalized
    spark.conf.set(ConfKey, "true")
    try {
      val on = SqlRunner.exec(spark, clean)
        .queryExecution.analyzed.canonicalized
      assert(on == off, "repair surface rewrote a clean statement")
    } finally spark.conf.unset(ConfKey)
  }

  test("a statement whose failure is NOT a correlation shape keeps its " +
    "original error under the conf") {
    spark.conf.set(ConfKey, "true")
    try {
      val e = intercept[Exception](
        SqlRunner.exec(spark, "select no_such_col from a"))
      assert(Option(e.getMessage).exists(_.contains("no_such_col")))
    } finally spark.conf.unset(ConfKey)
  }
}
