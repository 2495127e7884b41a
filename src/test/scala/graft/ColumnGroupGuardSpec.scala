package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ExtendedStats

/** ColumnGroupCertifiedBroadcast: column-group statistics must change
  * the PLAN, not just the reported estimate.
  *
  * The scenario is a correlated composite key at sf0.01: a lineitem
  * self-join on (l_partkey, l_suppkey). Spark prices a multi-key join
  * with the MINIMUM per-key containment estimate — here
  * |L|²/ndv(partkey) ≈ 2.3M rows — while the pairs are nearly unique,
  * so the truth (= the registered F2 moment) is ~78k rows (~1.3 MB).
  * The over-estimate denies the broadcast, the downstream join pays a
  * full both-sides shuffle it never needed, and at 100 TB that shuffle
  * is the bottleneck. The rule must certify the side from √(F2_L·F2_R)
  * — a true Cauchy–Schwarz bound, not an estimate — and flip the
  * static plan to a broadcast join, with results byte-identical.
  */
class ColumnGroupGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"
  private var spark: SparkSession = _
  private val cols = Seq("l_partkey", "l_suppkey")

  override def beforeAll(): Unit = {
    spark = GraftSession.local(cores = 4)
    spark.sql("DROP TABLE IF EXISTS cg_li")
    spark.sql("DROP TABLE IF EXISTS cg_li_wide")
    // A previous JVM's crash can orphan the managed locations.
    Seq("cg_li", "cg_li_wide").foreach { t =>
      val dir = new java.io.File(s"/root/repo/target/warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    spark.sql(
      s"""CREATE TABLE cg_li USING parquet AS
         |SELECT l_orderkey, l_partkey, l_suppkey
         |FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin)
    spark.sql(
      s"""CREATE TABLE cg_li_wide USING parquet AS
         |SELECT * FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin)
    spark.sql("ANALYZE TABLE cg_li COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cg_li_wide COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS cg_li")
    spark.sql("DROP TABLE IF EXISTS cg_li_wide")
  }

  private def dropGroup(): Unit =
    spark.sql("ALTER TABLE cg_li UNSET TBLPROPERTIES IF EXISTS " +
      s"('${ExtendedStats.propertyKey(cols)}', " +
      s"'${ExtendedStats.f2PropertyKey(cols)}')")

  /** The probe: self-join on the composite pair, feeding the right side
    * of a downstream LEFT join (outer joins don't reorder, so the pair
    * join survives as a unit; an inner chain would be restructured by
    * CBO). Without the group stat the downstream join is a sort-merge
    * join over a 2.3M-row fiction; with it, a certified broadcast of
    * the real ~78k rows.
    */
  private val probe =
    """SELECT w.l_orderkey, count(p.l_orderkey) AS pair_cnt
      |FROM cg_li_wide w LEFT JOIN
      |     (SELECT a.l_orderkey
      |      FROM cg_li a JOIN cg_li b
      |        ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey) p
      |  ON p.l_orderkey = w.l_orderkey
      |GROUP BY w.l_orderkey
      |ORDER BY pair_cnt DESC, w.l_orderkey LIMIT 20""".stripMargin

  /** True iff the static plan broadcasts the OUTPUT OF A JOIN — the
    * missed opportunity the rule exists to reclaim. (Broadcasting a
    * base-table side inside the pair join itself doesn't count.)
    */
  private def broadcastsAJoinOutput(p: SparkPlan): Boolean =
    p.collect { case j: BroadcastHashJoinExec =>
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      build.collect { case x: BaseJoinExec => x }.nonEmpty
    }.exists(identity)

  private def hasBroadcastHint(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
      .exists(h => Seq(h.leftHint, h.rightHint).flatten
        .exists(_.strategy.contains(BROADCAST)))

  private def withThreshold[T](bytes: Long)(f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try f finally spark.conf.set(key, old)
  }

  test("rule placement: User Provided Optimizers runs after Join Reorder") {
    val names = spark.sessionState.optimizer.batches.map(_.name)
    val reorder = names.indexOf("Join Reorder")
    val user = names.indexOf("User Provided Optimizers")
    assert(reorder >= 0 && user >= 0 && reorder < user,
      s"batch order changed: $names")
    assert(spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.ColumnGroupCertifiedBroadcast]))
  }

  test("scenario teeth: Spark's min-per-key rule over-estimates; the " +
    "containment lower bound never exceeds it") {
    dropGroup()
    val pair = spark.sql(
      """SELECT a.l_orderkey FROM cg_li a JOIN cg_li b
        |ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey"""
        .stripMargin)
    val est = pair.queryExecution.optimizedPlan.stats.rowCount.get
    val actual = pair.count()
    assert(est.toDouble / actual > 5.0,
      s"Spark no longer over-estimates the correlated pair join " +
        s"(est=$est actual=$actual) — re-derive the scenario")
    // Why the rule has no broadcast-BLOCKING direction: tuple-ndv ≥ any
    // single-key ndv, so the group lower bound |L|²/g sits at or under
    // Spark's min-per-key estimate — a side Spark sizes as
    // broadcastable is never one the group stat sizes over threshold.
    val ndv = ExtendedStats.analyzeColumnGroup(spark, "cg_li", cols)
    try {
      val n = spark.table("cg_li").count()
      assert(BigInt(n) * BigInt(n) / BigInt(ndv) <= est)
    } finally dropGroup()
  }

  test("without the group stat, the over-estimate denies the broadcast") {
    dropGroup()
    withThreshold(4L << 20) {
      val plan = spark.sql(probe).queryExecution.sparkPlan
      assert(!broadcastsAJoinOutput(plan),
        s"pair-join output broadcast without certification?\n$plan")
    }
  }

  test("with the group stat, the certified bound flips the plan to a broadcast join") {
    ExtendedStats.analyzeColumnGroup(spark, "cg_li", cols)
    try {
      withThreshold(4L << 20) {
        val df = spark.sql(probe)
        assert(hasBroadcastHint(df),
          "certified-broadcast hint missing from the optimized plan")
        val plan = df.queryExecution.sparkPlan
        assert(broadcastsAJoinOutput(plan),
          s"pair-join output still shuffled despite certification:\n$plan")

        // The certificate is tight, not just under-threshold: for a
        // self-join the Cauchy–Schwarz bound IS the true cardinality
        // (F2 = Σc² exactly), modulo the stored double's 1.001 slack.
        val actual = spark.sql(
          """SELECT count(*) FROM cg_li a JOIN cg_li b
            |ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey"""
            .stripMargin).head().getLong(0)
        val f2 = ExtendedStats.groupF2FromProperties(
          spark.sessionState.catalog.getTableMetadata(
            spark.sessionState.sqlParser.parseTableIdentifier("cg_li"))
            .properties, cols).get
        assert(f2 == actual.toDouble,
          s"self-join F2 $f2 should equal the true join size $actual")
      }
    } finally dropGroup()
  }

  test("certified and uncertified plans return identical results") {
    ExtendedStats.analyzeColumnGroup(spark, "cg_li", cols)
    try {
      withThreshold(4L << 20) {
        val certified = spark.sql(probe).collect().map(_.toSeq).toSeq
        dropGroup()
        val plain = spark.sql(probe).collect().map(_.toSeq).toSeq
        assert(certified == plain)
      }
    } finally dropGroup()
  }

  test("no hint for single-key joins, over-bound thresholds, or sides " +
    "Spark already broadcasts") {
    ExtendedStats.analyzeColumnGroup(spark, "cg_li", cols)
    try {
      // Single-key self-join: no group applies.
      val single = spark.sql(
        """SELECT count(*) FROM cg_li a JOIN cg_li b
          |ON a.l_orderkey = b.l_orderkey""".stripMargin)
      assert(!hasBroadcastHint(single))
      // Threshold below the certified bound (~1.3 MB): stay silent.
      withThreshold(512L << 10) {
        assert(!hasBroadcastHint(spark.sql(probe)))
      }
      // Threshold above Spark's own estimate (~37 MB): the planner
      // broadcasts on its own, the rule must not double-hint.
      withThreshold(64L << 20) {
        val df = spark.sql(probe)
        assert(!hasBroadcastHint(df))
        assert(broadcastsAJoinOutput(df.queryExecution.sparkPlan))
      }
    } finally dropGroup()
  }
}
