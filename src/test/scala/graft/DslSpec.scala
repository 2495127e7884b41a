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
}
