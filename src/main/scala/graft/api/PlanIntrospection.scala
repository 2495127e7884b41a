package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Queryable optimizer introspection — the reference exposes its memo as
  * system tables (`sys_memo_expr` / `sys_memo_property`,
  * `/root/reference/qpmodel/optimizer.cs:1239-1328`) so users can SELECT
  * over what the optimizer did. Catalyst has no memo, but its analog is
  * the QueryExecution phase chain: this surface renders each phase's
  * plan tree as ROWS (phase, preorder position, depth, node name) so
  * plan shape is itself queryable/joinable — e.g. count exchanges per
  * phase, diff analyzed vs optimized node counts, assert no cartesian.
  *
  * Driver-sized by construction: a plan tree is O(100) nodes of
  * metadata, never data — the one place collect-to-driver is the right
  * shape.
  */
object PlanIntrospection {

  /** (phase, ord, depth, node) rows for the three deterministic plan
    * phases of `df`: "analyzed", "optimized", "physical" (pre-AQE; the
    * adaptive final plan is only defined post-execution).
    */
  def nodes(spark: SparkSession, df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    val rows = Seq(
      "analyzed" -> treeRows(qe.analyzed),
      "optimized" -> treeRows(qe.optimizedPlan),
      "physical" -> treeRows(qe.sparkPlan)
    ).flatMap { case (phase, ns) =>
      ns.map { case (ord, depth, node) => (phase, ord, depth, node) }
    }
    import spark.implicits._
    rows.toDF("phase", "ord", "depth", "node")
  }

  /** Required-vs-provided plan properties as rows — the Catalyst analog
    * of the reference's `sys_memo_property` table (required/provided
    * ordering+distribution per memo group, `optimizer.cs:1239-1328`,
    * `Catalog.cs:312-317`), completing the introspection triptych next
    * to [[nodes]] (what was chosen) and [[ruleTrace]] (what rewrote it).
    *
    * One row per (operator, child slot) across two phases:
    *
    *  - `planned`: the physical plan BEFORE enforcement — `satisfied =
    *    false` rows are exactly the places EnsureRequirements must
    *    insert an exchange/sort (the reference's enforcer inserts its
    *    Redistribute/Order nodes from the same required-vs-provided
    *    comparison).
    *  - `final`: the executed adaptive plan — every requirement shows
    *    how it was met (by an exchange, a bucketed scan, AQE reuse, …).
    *
    * Satisfaction verdicts are Spark's own (`Partitioning.satisfies` /
    * `SortOrder.orderingSatisfies`) — the exact tests EnsureRequirements
    * runs, re-exposed as data. Expression ids (`#123`) are stripped so
    * the rows are stable across sessions. Requires execution (for the
    * final phase); plan-tree-sized, driver-safe by construction.
    */
  def properties(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.SortOrder
    def norm(s: String): String =
      s.replaceAll("#\\d+[L]?", "").replaceAll("@[0-9a-f]+", "")
    def rows(phase: String, root: SparkPlan)
        : Seq[(String, Int, Int, String, Int, String, String, Boolean,
          String, String, Boolean)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Int, Int,
        String, Int, String, String, Boolean, String, String, Boolean)]()
      var ord = -1
      def go(n: SparkPlan, depth: Int): Unit = {
        ord += 1
        val myOrd = ord
        val kids: Seq[SparkPlan] = n match {
          case q: QueryStageExec => Seq(q.plan)
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case _ => n.children
        }
        if (n.children.nonEmpty) {
          n.children.zipWithIndex.foreach { case (c, i) =>
            val reqD = n.requiredChildDistribution(i)
            val reqO = n.requiredChildOrdering(i)
            buf += ((phase, myOrd, depth, n.nodeName, i,
              norm(reqD.toString), norm(c.outputPartitioning.toString),
              c.outputPartitioning.satisfies(reqD),
              norm(reqO.map(_.sql).mkString(", ")),
              norm(c.outputOrdering.map(_.sql).mkString(", ")),
              SortOrder.orderingSatisfies(c.outputOrdering, reqO)))
          }
        }
        kids.foreach(go(_, depth + 1))
      }
      go(root, 0)
      buf.toSeq
    }
    val planned = rows("planned", df.queryExecution.sparkPlan)
    // force execution so the adaptive plan is final
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val fin = rows("final", df.queryExecution.executedPlan)
    import spark.implicits._
    (planned ++ fin).toDF("phase", "ord", "depth", "node", "child",
      "required_dist", "provided_dist", "dist_satisfied",
      "required_order", "provided_order", "order_satisfied")
  }

  /** EXPLAIN ANALYZE parity (reference `PhysicProfiling` row/loop
    * counters on every physical node, `PhysicalExec.cs:332-408`, surfaced
    * by `EXPLAIN ANALYZE`, `Plan.cs:125-141`): EXECUTE `df`, then render
    * the final adaptive physical plan with each operator's post-execution
    * SQLMetrics row count as rows (phase="executed", ord, depth, node,
    * rows). `rows` is NULL for operators that carry no numOutputRows
    * metric (e.g. exchanges report data size instead).
    *
    * Execution discards rows executor-side (foreachPartition over the
    * dataset's own RDD — the same QueryExecution whose metrics are read,
    * nothing shipped to the driver), so profiling a 100 TB query costs
    * one run of the query, never a collect.
    */
  def executed(spark: SparkSession, df: DataFrame): DataFrame = {
    df.queryExecution.toRdd.foreachPartition(_ => ())
    import spark.implicits._
    estimateVsActual(df).map { p =>
      // clamp: a size-derived estimate can exceed Long range in theory
      (p.ord, p.depth, p.node,
        p.estRows.map(b => b.min(BigInt(Long.MaxValue)).longValue),
        p.actualRows)
    }.toDF("ord", "depth", "node", "est_rows", "rows")
      .selectExpr("'executed' AS phase", "ord", "depth", "node",
        "est_rows", "rows")
  }

  /** Post-execution per-operator profile of an ALREADY-executed df:
    * preorder (ord, depth, node, numOutputRows). Reading metrics before
    * any action ran yields zeros — callers own the execution (see
    * [[executed]] for the run-and-profile wrapper).
    */
  def executedProfile(df: DataFrame): Seq[(Int, Int, String, Option[Long])] =
    estimateVsActual(df).map(p => (p.ord, p.depth, p.node, p.actualRows))

  /** The optimizer's DERIVATION as rows — the closest Catalyst analog to
    * the reference's memo-exploration tables (`sys_memo_expr` renders
    * every logically-equivalent alternative the memo explored,
    * `optimizer.cs:1239-1328`). Catalyst is a rewrite system, not a memo:
    * what it "explored" is the rule sequence, so this surface renders the
    * per-rule planning summary — invocations, EFFECTIVE invocations (the
    * rule actually rewrote the plan), and planning time — for every rule
    * that fired effectively at least once while analyzing/optimizing/
    * planning `df`. SELECTing it answers the questions the reference's
    * memo tables answer ("did join reorder engage? what did resolution
    * cost?") in Catalyst's vocabulary.
    *
    * Rule NAMES and effective-counts are deterministic for a fixed query
    * and conf; `time_ns` is wall-clock and is exposed for profiling, not
    * comparison.
    */
  def ruleTrace(spark: SparkSession, df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    qe.executedPlan // force analyze → optimize → plan under the tracker
    import spark.implicits._
    qe.tracker.rules.toSeq
      .map { case (rule, s) =>
        (rule.substring(rule.lastIndexOf('.') + 1),
          s.numInvocations, s.numEffectiveInvocations, s.totalTimeNs)
      }
      .filter(_._3 > 0)
      .sortBy { case (name, _, eff, _) => (-eff, name) }
      .toDF("rule", "invocations", "effective", "time_ns")
  }

  /** Estimated rows the optimizer planned a physical operator from —
    * the CBO's rowCount when the estimation chain produced one, else the
    * size-based fallback sizeInBytes / sizePerRow, which is the same
    * quantity Spark's own broadcast-vs-shuffle decisions reduce to. None
    * for physical-only nodes with no logical counterpart (e.g. exchanges
    * inserted by EnsureRequirements, AQE readers).
    *
    * The reference renders per-member cost ESTIMATES in its memo system
    * tables (`/root/reference/qpmodel/optimizer.cs:1239-1328`) but never
    * places them next to execution feedback; at 100 TB the estimate
    * ERROR is what silently picks a catastrophic join strategy, so the
    * pairing (est, actual) is the auditable artifact — see PlanAudit's
    * worst-miss column.
    */
  /** One executed operator's planned-vs-actual cardinality. `estExact`
    * distinguishes a real CBO rowCount (propagated from injected /
    * ANALYZE stats) from the size-derived fallback — the fallback
    * compounds multiplicatively through joins, so its error factor
    * measures "Spark had no row estimate here", not a CBO miss.
    */
  final case class OpProfile(ord: Int, depth: Int, node: String,
      estRows: Option[BigInt], estExact: Boolean, actualRows: Option[Long])

  /** The engine estimator's cardinality for one node of a STATIC
    * (pre-execution) physical plan — what [[estimateVsActual]] pairs
    * with actuals post-execution, reusable by plan-only harnesses
    * (Tpch1Plan grades root estimates on data-free catalogs). Walks
    * preorder from `root`, skipping pure plumbing wrappers, and returns
    * the first node's estimate.
    */
  def plannedRootEstimate(spark: SparkSession,
                          root: SparkPlan): Option[BigInt] = {
    val wrappers = Seq("WholeStageCodegen", "InputAdapter", "ColumnarToRow",
      "AdaptiveSparkPlan", "ResultQueryStage", "Exchange", "AQEShuffleRead",
      "ShuffleQueryStage", "BroadcastQueryStage", "BroadcastExchange")
    def go(n: SparkPlan): Option[BigInt] =
      if (wrappers.exists(n.nodeName.startsWith)) n match {
        case q: QueryStageExec => go(q.plan)
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case _ => n.children.headOption.flatMap(go)
      }
      else estimatedRows(spark, n) match {
        // EXACT estimates only (stats-fed CBO or the graft corrections)
        // — the size-derived quotient means "no row estimate here", and
        // grading it as the root estimate would compare noise.
        case (est, true) => est
        case _ => None
      }
    go(root)
  }

  private def estimatedRows(spark: SparkSession,
                            n: SparkPlan): (Option[BigInt], Boolean) = {
    // Extended statistics refine what Spark's estimation chain gets
    // wrong (see graft.catalog.ExtendedStats): equi-joins are priced by
    // per-edge containment composed recursively through join chains
    // (column-group ndv for correlated composite keys, catalog ndv per
    // single key), and LIKE-prefix filters by the registered string
    // equal-depth histogram. Everything else reports Spark's own CBO
    // rowCount, falling back to the size-derived quotient.
    graft.catalog.ExtendedStats.containmentEstimate(spark, n)
      .orElse(graft.catalog.ExtendedStats.groupedChainEstimate(spark, n))
      .orElse(likePrefixEstimate(n)) match {
      case Some(corrected) => (Some(corrected), true)
      case None =>
        n.logicalLink.map { l =>
          val st = l.stats
          st.rowCount match {
            case Some(rc) => (Some(rc), true)
            case None =>
              val per = org.apache.spark.sql.catalyst.plans.logical
                .statsEstimation.EstimationUtils.getSizePerRow(l.output)
              (if (per > 0) Some(st.sizeInBytes / per) else None, false)
          }
        }.getOrElse((None, false))
    }
  }

  /** Corrected estimate for a Filter whose condition carries top-level
    * `col LIKE 'prefix%'` conjuncts over columns with a registered
    * string histogram. Spark's FilterEstimation has no handler for
    * StartsWith (selectivity 1.0 — its histograms cover numeric types
    * only), so the correction multiplies Spark's own estimate for the
    * REMAINING conjuncts by the histogram range selectivity of
    * [prefix, succ(prefix)) per LIKE. Only positive top-level
    * conjuncts are priced — a StartsWith under OR/NOT keeps Spark's
    * estimate rather than guessing a polarity.
    */
  /** Catalyst's own conjunct splitter (protected in PredicateHelper,
    * re-exposed through a private holder) — the same splitter
    * ColumnGroupCertifiedBroadcast uses, not a re-implementation.
    */
  private object Conjuncts
      extends org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      splitConjunctivePredicates(e)
  }

  private def likePrefixEstimate(n: SparkPlan): Option[BigInt] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, IsNotNull, Literal, StartsWith}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.types.StringType
    n.logicalLink.collect {
      case f @ LFilter(cond, child) =>
        val conjs = Conjuncts.split(cond)
        val prefixes = conjs.collect {
          case StartsWith(a: AttributeReference, Literal(p, StringType))
              if p != null => (a, p.toString)
        }
        if (prefixes.isEmpty) None
        else {
          val sels = prefixes.map { case (a, p) =>
            child.collectFirst {
              case r: LogicalRelation
                  if r.catalogTable.isDefined &&
                    r.output.exists(_.exprId == a.exprId) =>
                r.catalogTable.get
            }.flatMap { t =>
              // Spark's base estimate (the rowCount below) has already
              // priced an explicit/inferred isnotnull(a) conjunct when
              // one is present — scaling by the histogram's null
              // fraction again would double-count it.
              val nullsExcluded = conjs.exists {
                case IsNotNull(ar: AttributeReference) =>
                  ar.exprId == a.exprId
                case _ => false
              }
              graft.catalog.ExtendedStats.prefixSelectivity(
                t.properties, a.name, p,
                t.stats.flatMap(_.rowCount).getOrElse(BigInt(0)),
                nullsAlreadyExcluded = nullsExcluded)
            }
          }
          for {
            _ <- Option(()).filter(_ => sels.forall(_.isDefined))
            base <- f.stats.rowCount
          } yield {
            val est = sels.flatten.foldLeft(BigDecimal(base))(_ * _)
            est.setScale(0, BigDecimal.RoundingMode.HALF_UP)
              .toBigInt.max(1)
          }
        }
    }.flatten
  }

  /** Post-execution per-operator [[OpProfile]] rows — the optimizer's
    * planned cardinality NEXT TO the SQLMetrics actual, per operator of
    * the final adaptive plan. Callers own execution, same contract as
    * [[executedProfile]].
    */
  def estimateVsActual(df: DataFrame): Seq[OpProfile] = {
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val buf = scala.collection.mutable.ArrayBuffer[OpProfile]()
    def go(n: SparkPlan, depth: Int): Unit = {
      val (est, exact) = estimatedRows(df.sparkSession, n)
      buf += OpProfile(buf.size, depth, n.nodeName, est, exact,
        n.metrics.get("numOutputRows").map(_.value))
      // Query stages and nested adaptive plans hide their subtree behind
      // a leaf node — descend into the materialized plan so the profile
      // covers every executed operator.
      n match {
        case q: QueryStageExec => go(q.plan, depth + 1)
        case a: AdaptiveSparkPlanExec => go(a.executedPlan, depth + 1)
        case _ => n.children.foreach(go(_, depth + 1))
      }
    }
    go(finalPlan, 0)
    buf.toSeq
  }

  /** Preorder (ord, depth, nodeName) traversal of one plan tree. */
  private def treeRows(
      plan: org.apache.spark.sql.catalyst.trees.TreeNode[_])
      : Seq[(Int, Int, String)] = {
    val buf = scala.collection.mutable.ArrayBuffer[(Int, Int, String)]()
    def go(n: org.apache.spark.sql.catalyst.trees.TreeNode[_],
           depth: Int): Unit = {
      buf += ((buf.size, depth, n.nodeName))
      n.children.foreach(c =>
        go(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]],
          depth + 1))
    }
    go(plan, 0)
    buf.toSeq
  }
}
