package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.regress.RefRegress

/** The reference's own regression goldens, executed verbatim: its
  * `tpch/q01.sql…q22.sql` and `tpch/select/sql01…08.sql`, on its own
  * `.tbl` load from `tpch/data/0001`, row-diffed against the result tails of
  * its committed expect files (`test/regress/expect/tpch0001[_select]`;
  * reference runner `test/UnitTest.cs:295-355`). No schema adaptation,
  * no oracle re-derivation — the rows the reference engine printed are
  * the rows asserted here, byte-for-byte in its own output format
  * (modulo fp-tolerance fallback, which none of these needed: all 22
  * TPC-H goldens match in exact order).
  *
  * Queries run through [[RefRegress.qpmodelize]], which reproduces the
  * reference's three documented non-standard execution semantics
  * (30/365-day intervals, dropped DISTINCT-in-aggregate, double
  * literals) — the engine's standard-semantics behavior for the same
  * constructs is oracle-tested in the main corpus; see the shim's
  * scaladoc for the file:line evidence of each quirk.
  */
class RegressParitySpec extends AnyFunSuite {

  private val Ref = "/root/reference"

  /** Isolated session: the regress views (lineitem, orders, …) must not
    * clobber other suites' registrations of the same names over the
    * driver testdata — newSession shares the SparkContext but owns its
    * temp-view catalog.
    */
  private lazy val session: SparkSession = {
    val s = TestSpark.spark.newSession()
    val loaded = RefRegress.loadTables(
      s, s"$Ref/tpch/sql_scripts/tpch.sql", s"$Ref/tpch/data/0001")
    assert(loaded.size == 8, s"expected the 8 TPC-H tables, got $loaded")
    s
  }

  private def check(sqlFile: String, expectFile: String): Unit = {
    val sql = RefRegress.qpmodelize(RefRegress.querySql(sqlFile))
    val exp = RefRegress.expectedRows(expectFile)
    val act = RefRegress.resultLines(session.sql(sql))
    // Full-mode expects carry "(actual rows=N)" markers; an expect
    // without them is a committed explain-only golden (sql06) whose
    // result rows the reference never wrote — assert executability only.
    val fullMode = Files.readString(Paths.get(expectFile))
      .contains("(actual rows")
    if (fullMode) {
      RefRegress.diff(exp, act) match {
        case RefRegress.Mismatch(detail) => fail(s"$sqlFile: $detail")
        case _ => ()
      }
    }
  }

  (1 to 22).foreach { i =>
    val q = f"q$i%02d"
    test(s"reference golden tpch0001/$q — verbatim SQL, reference data") {
      check(s"$Ref/tpch/$q.sql", s"$Ref/test/regress/expect/tpch0001/$q.txt")
    }
  }

  // select/ subquery-variant suite: every member with a committed expect
  // (sql07 ships without one).
  (1 to 8).map(i => f"sql$i%02d")
    .filter(q => Files.exists(
      Paths.get(s"$Ref/test/regress/expect/tpch0001_select/$q.txt")))
    .foreach { q =>
      test(s"reference golden tpch0001_select/$q") {
        check(s"$Ref/tpch/select/$q.sql",
          s"$Ref/test/regress/expect/tpch0001_select/$q.txt")
      }
    }
}
