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
    executedProfile(df).toDF("ord", "depth", "node", "rows")
      .selectExpr("'executed' AS phase", "ord", "depth", "node", "rows")
  }

  /** Post-execution per-operator profile of an ALREADY-executed df:
    * preorder (ord, depth, node, numOutputRows). Reading metrics before
    * any action ran yields zeros — callers own the execution (see
    * [[executed]] for the run-and-profile wrapper).
    */
  def executedProfile(df: DataFrame): Seq[(Int, Int, String, Option[Long])] = {
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val buf = scala.collection.mutable.ArrayBuffer[(Int, Int, String, Option[Long])]()
    def go(n: SparkPlan, depth: Int): Unit = {
      buf += ((buf.size, depth, n.nodeName,
        n.metrics.get("numOutputRows").map(_.value)))
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
