package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

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
