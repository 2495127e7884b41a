package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftContext

/** DSL explain verb (reference `EXPLAIN [ANALYZE|FULL]`, ExplainMode
  * `/root/reference/qpmodel/Plan.cs:125`): assert on plan node classes
  * and phase markers, never golden text.
  */
class DslSpec extends AnyFunSuite {
  import TestSpark._

  test("explain exposes formatted/cost/extended plan views") {
    val ctx = new GraftContext(spark, sfDir)
    val ds = ctx.read("part").filter("p_size > 30").select("p_name", "p_size")

    val formatted = ds.explain("formatted")
    assert(formatted.contains("Scan parquet") || formatted.contains("FileScan"),
      formatted)
    assert(formatted.contains("PushedFilters"), formatted)

    val cost = ds.explain("cost")
    assert(cost.contains("Statistics") && cost.contains("sizeInBytes"), cost)

    val extended = ds.explain("extended")
    assert(extended.contains("== Analyzed Logical Plan ==") &&
      extended.contains("== Physical Plan =="), extended)
  }

  test("groupBy accepts function-call keys (top-level comma split)") {
    val ctx = new GraftContext(spark, sfDir)
    // substr(c_name, 1, 2) carries commas INSIDE the key expression; a
    // naive comma split would shatter it into three bogus expressions.
    val got = ctx.read("customer")
      .groupBy("substr(c_name, 1, 2), c_nationkey % 2", "count(*) AS n")
      .toDF
    assert(got.columns.length == 3)
    val oracle = ctx.sql(
      """SELECT substr(c_name, 1, 2), c_nationkey % 2, count(*) AS n
        |FROM customer GROUP BY 1, 2""".stripMargin)
    assert(got.count() == oracle.count() && got.count() > 0)
  }

  test("groupBy splits string literals containing commas correctly") {
    val ctx = new GraftContext(spark, sfDir)
    val got = ctx.read("nation")
      .groupBy("concat(n_name, 'x,y'), n_regionkey", "count(*) AS n")
      .toDF
    assert(got.columns.length == 3 && got.count() == 25)
  }
}
