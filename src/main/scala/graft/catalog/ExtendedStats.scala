package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Extended statistics: COLUMN-GROUP NDV — the number of distinct
  * value TUPLES over a set of columns, the statistic that fixes
  * multi-key join estimation.
  *
  * Per-column stats force an independence assumption: Spark's
  * `JoinEstimation` prices a 2-key equi-join by multiplying the two
  * per-key selectivities, so a composite key whose components are
  * correlated (every (ps_partkey, ps_suppkey) pair is one partsupp row;
  * lineitem references exactly those pairs) is underestimated by the
  * ratio ndv₁·ndv₂ / ndv(tuple). The reference's estimator makes the
  * OPPOSITE simplification — `LogicCard.cs:154-200` multiplies
  * min(dl,dr) per key — and wins on its own CE battery's probe 7 for
  * that reason. Warehouse engines close this with multi-column
  * statistics (Oracle extended stats / column groups, CockroachDB
  * multi-column stats); this module is that facility for graft:
  *
  *   - [[analyzeColumnGroup]] computes ndv(tuple) with ONE distributed
  *     aggregate and persists it in the table's TBLPROPERTIES
  *     (`graft.stats.colgroup.<c1>,<c2>` — sorted, so lookup is
  *     order-insensitive), next to where ANALYZE keeps row counts;
  *   - [[StatsImport]]-style injection works too — the property is
  *     plain catalog metadata, settable without a scan;
  *   - [[joinCorrection]] applies the containment bound to a physical
  *     multi-key equi-join when BOTH input sides carry a registered
  *     group: |L|·|R| / max(g_L, g_R). This is the estimate graft's
  *     introspection surface ([[graft.api.PlanIntrospection]]) reports
  *     for the node, and what the CE battery grades;
  *   - the F2 moment recorded alongside the ndv feeds
  *     [[graft.plans.ColumnGroupCertifiedBroadcast]], which turns the
  *     statistic into actual plan changes (certified broadcasts Spark's
  *     min-per-key estimator would deny).
  *
  * At 100 TB the analyze cost is ONE distributed aggregate over the
  * group (partial map-side combine, one shuffle on the tuple), run for
  * the handful of composite join keys a schema actually has; the payoff
  * is join-size estimates that no longer carry the ×ndv-correlation
  * error into every downstream broadcast/shuffle decision.
  */
object ExtendedStats {

  private val Prefix = "graft.stats.colgroup."
  private val F2Prefix = "graft.stats.colgroupf2."
  private val RowsPrefix = "graft.stats.colgrouprows."

  def propertyKey(cols: Seq[String]): String =
    Prefix + cols.map(_.toLowerCase).sorted.mkString(",")

  /** Property key of the tuple-frequency SECOND MOMENT F2 = Σ_t c(t)² —
    * the self-join size of the column group (AMS/sketching literature's
    * F2). For any equi-join on the tuple, Cauchy–Schwarz gives
    * |L ⋈ R| = Σ_t c_L(t)·c_R(t) ≤ √(F2_L · F2_R): a TRUE upper bound,
    * which is what a broadcast decision may safely act on (an estimate,
    * however good, cannot certify that a build side fits).
    */
  def f2PropertyKey(cols: Seq[String]): String =
    F2Prefix + cols.map(_.toLowerCase).sorted.mkString(",")

  /** Property key of the table row count AT ANALYZE TIME — the moments
    * above are a snapshot, and rows inserted after the analyze silently
    * under-state F2. A consumer that acts on F2 as a HARD certificate
    * (the broadcast rule) must be able to tell the snapshot is still
    * current: it compares this recorded count against the catalog's
    * live rowCount and declines when the table has grown. (Deletes are
    * safe without any check: removing rows can only shrink every tuple
    * frequency, so the recorded F2 stays a true upper bound.)
    */
  def rowsPropertyKey(cols: Seq[String]): String =
    RowsPrefix + cols.map(_.toLowerCase).sorted.mkString(",")

  /** Compute ndv, F2 and the row count over the column tuple (exact —
    * the groups a DBA registers are join keys, where exactness matters,
    * and all three come out of the SAME single aggregate pass) and
    * persist them on the table. Returns the ndv.
    */
  def analyzeColumnGroup(spark: SparkSession, table: String,
                         cols: Seq[String]): Long = {
    require(cols.size >= 2, s"a column group needs ≥2 columns, got $cols")
    val tuple = cols.map(c => s"`$c`").mkString(", ")
    // F2 as double: Σc² overflows int64 past ~10^9.5 rows of one tuple,
    // and a statistic needs relative precision, not exactness. The
    // coalesce covers the empty table: ndv=0, F2=0, rows=0 are its true
    // values (any join on the tuple yields zero rows).
    val row = spark.sql(
      s"""SELECT count(*) AS ndv,
         |       coalesce(sum(cast(c AS double) * c), 0D) AS f2,
         |       coalesce(sum(c), 0L) AS rows
         |FROM (SELECT count(*) AS c FROM $table GROUP BY $tuple)"""
        .stripMargin).head()
    val (ndv, f2, rows) = (row.getLong(0), row.getDouble(1), row.getLong(2))
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('${propertyKey(cols)}' = '$ndv', '${f2PropertyKey(cols)}' = '$f2'," +
      s" '${rowsPropertyKey(cols)}' = '$rows')")
    // The broadcast rule verifies snapshot freshness against the
    // catalog's LIVE rowCount; a never-ANALYZEd table has none, which
    // would leave this statement silently insufficient to arm the
    // certificate. Establish one (a count, not a column scan) so
    // `ANALYZE ... FOR COLUMN GROUP` alone is self-sufficient.
    val hasRowCount = scala.util.Try {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      spark.sessionState.catalog.getTableMetadata(id).stats
        .exists(_.rowCount.isDefined)
    }.getOrElse(true) // non-catalog relation: nothing to establish
    if (!hasRowCount) spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    ndv
  }

  /** The registered group ndv of `cols` from a table-properties map —
    * the snapshot a resolved plan already carries in its
    * `LogicalRelation.catalogTable`, so optimizer rules can consult the
    * statistic without a catalog round-trip per join node.
    */
  def groupNdvFromProperties(props: Map[String, String],
                             cols: Seq[String]): Option[Long] =
    props.get(propertyKey(cols)).map(_.toLong)

  /** The registered F2 (tuple-frequency second moment) of `cols` from a
    * table-properties map; see [[f2PropertyKey]].
    */
  def groupF2FromProperties(props: Map[String, String],
                            cols: Seq[String]): Option[Double] =
    props.get(f2PropertyKey(cols)).map(_.toDouble)

  /** The analyze-time row count recorded next to the group moments; see
    * [[rowsPropertyKey]]. Absent on snapshots written before the count
    * was recorded or injected without one — consumers that need a hard
    * certificate must treat absence as "cannot verify freshness".
    */
  def groupRowsFromProperties(props: Map[String, String],
                              cols: Seq[String]): Option[Long] =
    props.get(rowsPropertyKey(cols)).map(_.toLong)

  /** The registered group ndv of `cols` on `table`, if analyzed. None
    * for a missing table too — an introspection convenience must never
    * throw where its caller would just fall back to Spark's estimate.
    */
  def columnGroupNdv(spark: SparkSession, table: String,
                     cols: Seq[String]): Option[Long] =
    scala.util.Try {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      spark.sessionState.catalog.getTableMetadata(id).properties
    }.toOption.flatMap(groupNdvFromProperties(_, cols))

  /** Collect nodes through AQE stage boundaries (QueryStageExec hides
    * its subtree behind a leaf).
    */
  private def collectThroughStages[T](n: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val buf = scala.collection.mutable.ArrayBuffer[T]()
    def go(p: SparkPlan): Unit = {
      if (pf.isDefinedAt(p)) buf += pf(p)
      p match {
        case q: QueryStageExec => go(q.plan)
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case _ => p.children.foreach(go)
      }
    }
    go(n)
    buf.toSeq
  }

  /** The CBO row count of a join input: first node down the side with a
    * propagated logical rowCount.
    */
  private def inputCard(side: SparkPlan): Option[BigInt] =
    collectThroughStages(side) {
      case p if p.logicalLink.exists(_.stats.rowCount.isDefined) =>
        p.logicalLink.get.stats.rowCount.get
    }.headOption

  /** Resolve a side's join-key attributes to (table properties,
    * columns) — defined only when every key column comes from the SAME
    * base-table scan (aliased/derived keys keep Spark's own estimate).
    * Properties come from the scan's own `logicalLink` catalog snapshot
    * (no catalog round-trip, and database-qualification is moot); the
    * fallback metadata lookup uses the scan's FULL identifier and
    * degrades to None rather than throwing — a same-named table in the
    * current database must never be consulted by accident.
    */
  private def keyOrigin(spark: SparkSession, side: SparkPlan,
                        keys: Seq[AttributeReference])
      : Option[(Map[String, String], Seq[String])] = {
    val scans = collectThroughStages(side) { case s: FileSourceScanExec => s }
    val home = scans.filter(s =>
      keys.forall(k => s.output.exists(_.exprId == k.exprId)))
    home match {
      case Seq(s) =>
        s.logicalLink
          .collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation
                if r.catalogTable.isDefined => r.catalogTable.get.properties
          }
          .orElse(s.tableIdentifier.flatMap(ti => scala.util.Try(
            spark.sessionState.catalog.getTableMetadata(ti).properties)
            .toOption))
          .map(_ -> keys.map(_.name))
      case _ => None
    }
  }

  /** Containment-bound estimate for a multi-key INNER equi-join whose
    * key tuples have registered column-group ndv on both sides:
    * |L|·|R| / max(g_L, g_R), clamped to [1, |L|·|R|]. None when the
    * node is not such a join or a group is missing — callers fall back
    * to Spark's estimate.
    */
  def joinCorrection(spark: SparkSession, n: SparkPlan): Option[BigInt] = {
    val parts = n match {
      case j: ShuffledHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        Some((j.leftKeys, j.rightKeys, j.left, j.right))
      case j: SortMergeJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        Some((j.leftKeys, j.rightKeys, j.left, j.right))
      case j: BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        Some((j.leftKeys, j.rightKeys, j.left, j.right))
      case _ => None
    }
    for {
      (lk, rk, left, right) <- parts
      if lk.size >= 2
      lAttrs <- Option(lk.collect { case a: AttributeReference => a })
        .filter(_.size == lk.size)
      rAttrs <- Option(rk.collect { case a: AttributeReference => a })
        .filter(_.size == rk.size)
      (lProps, lCols) <- keyOrigin(spark, left, lAttrs)
      (rProps, rCols) <- keyOrigin(spark, right, rAttrs)
      gL <- groupNdvFromProperties(lProps, lCols)
      gR <- groupNdvFromProperties(rProps, rCols)
      cardL <- inputCard(left)
      cardR <- inputCard(right)
    } yield {
      val cross = cardL * cardR
      (cross / BigInt(math.max(gL, gR)).max(1)).min(cross).max(1)
    }
  }
}
