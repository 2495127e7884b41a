package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.regress.CeBattery

/** Cardinality-estimation parity on the reference's own CE battery
  * (`test/regress/sql/ce.sql` + committed `expect/ce.out`): 13 probes,
  * both estimators' q-errors compared on identical data and identical
  * (qpmodel-semantics) predicates. Measured state this spec pins:
  *
  *  - every probe gets an EXACT CBO rowCount (ANALYZE-fed estimation,
  *    never the size-based fallback);
  *  - our worst probe (the correlated 2-key join, ~7×) is far inside
  *    the reference's worst (LIKE, 35×);
  *  - group-count probes 10–12 are estimated EXACTLY (distinct-count
  *    stats) where the reference errs 2.9×/2.1×;
  *  - geometric-mean q-error beats the reference's on its own battery.
  */
class CeParitySpec extends AnyFunSuite {

  test("reference CE battery: our CBO beats the reference's estimator " +
    "on gmean and worst-case q-error; group counts estimated exactly") {
    val s = TestSpark.spark.newSession()
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(new java.io.File("/root/repo/target/warehouse/graft_ce.db"))
    s.sql("CREATE DATABASE IF NOT EXISTS graft_ce")
    s.catalog.setCurrentDatabase("graft_ce")
    val ddl = Files.readString(
      Paths.get("/root/reference/tpch/sql_scripts/tpch.sql"))
    SqlRunner.splitStatements(ddl).map(_.trim).filter(_.nonEmpty)
      .foreach(stmt => SqlDialect.exec(s, stmt))
    Seq("region", "nation", "part", "supplier", "partsupp", "customer",
      "orders", "lineitem").foreach { t =>
      SqlDialect.exec(s,
        s"copy $t from '/root/reference/tpch/data/0001/$t.tbl'")
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val probes = CeBattery.run(s)
    assert(probes.size == 13, probes.map(_.idx))
    // our true counts must equal the reference's recorded actuals —
    // same data, same (shimmed) semantics
    probes.foreach(p => assert(p.ourAct == p.refAct,
      s"probe ${p.idx}: actual ${p.ourAct} != reference ${p.refAct}"))
    // group-count probes: exact
    Seq(10, 11, 12).foreach { i =>
      val p = probes(i - 1)
      assert(p.ourEst == p.ourAct, s"probe $i: est ${p.ourEst} != " +
        s"act ${p.ourAct} (distinct-count stats should be exact here)")
    }
    val ourG = CeBattery.gmean(probes.map(_.ourQ))
    val refG = CeBattery.gmean(probes.map(_.refQ))
    assert(ourG < refG,
      f"gmean q-error ours=$ourG%.3f vs reference=$refG%.3f")
    assert(probes.map(_.ourQ).max < probes.map(_.refQ).max,
      s"worst-case: ours=${probes.map(_.ourQ).max} " +
        s"ref=${probes.map(_.refQ).max}")
    // and the comparison stays honest: the reference is BETTER on the
    // correlated two-key join (probe 7) — pin that too so the claim
    // can't silently overreach
    assert(probes(6).refQ < probes(6).ourQ,
      "probe 7 (2-key join correlation) is the reference's win")
  }
}
