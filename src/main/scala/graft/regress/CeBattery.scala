package graft.regress

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** The reference's cardinality-estimation battery, run on BOTH
  * estimators: `test/regress/sql/ce.sql` holds 13 probes (filters,
  * equi-joins, group-bys) over TPC-H 0001, and `expect/ce.out` is the
  * reference's committed EXPLAIN ANALYZE output — its estimate and the
  * true cardinality per probe root (`Cardinality.PrimitiveTest`,
  * `UnitTest.cs:3716-3744`). This runner extracts the reference's
  * (est, actual) pairs from that golden and computes this engine's
  * (CBO rowCount after ANALYZE FOR ALL COLUMNS, true count) for the
  * same probes — the estimator-quality comparison rendered as q-error
  * (max(est/act, act/est)).
  */
object CeBattery {

  final case class Probe(idx: Int, node: String, refEst: Long,
                         refAct: Long, ourEst: Long, ourAct: Long) {
    def refQ: Double = qerr(refEst, refAct)
    def ourQ: Double = qerr(ourEst, ourAct)
    private def qerr(e: Long, a: Long): Double = {
      val (x, y) = (math.max(e, 1).toDouble, math.max(a, 1).toDouble)
      math.max(x / y, y / x)
    }
  }

  /** The reference side: root-node `rows=E … actual rows=A` per probe
    * of the committed golden.
    */
  def referencePairs(): Seq[(Long, Long)] = {
    val txt = Files.readString(
      Paths.get("/root/reference/test/regress/expect/ce.out"))
    txt.split("\nTotal cost").toSeq.flatMap { block =>
      block.linesIterator.find(l => l.contains("Physic") &&
        l.contains("rows=")).flatMap { root =>
        val est = """rows=(\d+)""".r.findFirstMatchIn(root).map(_.group(1))
        val act = """actual rows=(\d+)""".r.findFirstMatchIn(root)
          .map(_.group(1))
        (est, act) match {
          case (Some(e), Some(a)) => Some((e.toLong, a.toLong))
          case _ => None
        }
      }
    }
  }

  /** Run the 13 probes on an ANALYZE'd catalog load of the same data;
    * per probe, the first non-wrapper operator's CBO estimate and the
    * true row count.
    */
  def run(spark: SparkSession): Seq[Probe] = {
    val ref = referencePairs()
    val (ic, dc) = RefRegress.columnTypeSets(
      "/root/reference/tpch/sql_scripts/tpch.sql")
    val probes = Files.readString(
      Paths.get("/root/reference/test/regress/sql/ce.sql"))
    val wrappers = Set("ResultQueryStage", "WholeStageCodegen",
      "AQEShuffleRead", "InputAdapter", "ColumnarToRow",
      "ShuffleQueryStage", "AdaptiveSparkPlan", "Exchange", "Project",
      "BroadcastQueryStage", "BroadcastExchange", "TableCacheQueryStage")
    val stmts =
      graft.SqlRunner.splitStatements(probes).map(_.trim).filter(_.nonEmpty)
    require(ref.size == stmts.size,
      s"parsed ${ref.size} (est, actual) pairs from " +
        s"/root/reference/test/regress/expect/ce.out but ce.sql has " +
        s"${stmts.size} probes — golden format drift")
    stmts.zipWithIndex.map { case (sql, k) =>
        // qpmodelize: probe 3's `.06 - 0.01` BETWEEN must run under the
        // reference's double-literal semantics or the TRUE cardinality
        // itself differs (1131 vs 1135) and the comparison is apples to
        // oranges.
        val df = spark.sql(RefRegress.qpmodelize(sql, ic, dc))
        val act = df.count()
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val prof = graft.api.PlanIntrospection.estimateVsActual(df)
        val root = prof.find(p => p.estRows.isDefined &&
          !wrappers.exists(p.node.startsWith)).getOrElse(prof.head)
        require(root.estExact,
          s"probe ${k + 1}: no CBO rowCount — ANALYZE missing?")
        Probe(k + 1, root.node,
          ref(k)._1, ref(k)._2,
          root.estRows.get.min(BigInt(Long.MaxValue)).toLong, act)
      }
  }

  /** Geometric-mean q-error over the battery. */
  def gmean(qs: Seq[Double]): Double =
    math.exp(qs.map(math.log).sum / qs.size)
}
