package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Reference distribution parity: tables declared `replicated`
  * (`/root/reference/qpmodel/Catalog.cs:76-124`, `create table ar (...)
  * replicated`) are always broadcast to every node. The Spark-native
  * mapping is a join-hint optimizer rule: any join side that scans a
  * replicated table gets a BROADCAST hint, independent of the size
  * threshold — the planner then picks BroadcastHashJoin/BNLJ exactly as
  * the reference's property enforcement would place a PhysicBroadcast.
  *
  * Injected via GraftExtensions (spark.sql.extensions); runs in the
  * user-provided optimizer batch, after join reordering. Idempotent: a
  * side with an existing hint is left untouched.
  */
class ReplicatedTableHints extends Rule[LogicalPlan] {

  /** Parquet file names treated as replicated (the graft catalog's small
    * dims, graft.catalog.Tables.broadcastable).
    */
  private val replicated = Set("region.parquet", "nation.parquet")

  private def scansReplicated(plan: LogicalPlan): Boolean = plan.exists {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.exists(p => replicated.contains(p.getName))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: Join =>
      val lh = j.hint.leftHint.orElse(
        if (scansReplicated(j.left)) Some(HintInfo(Some(BROADCAST))) else None)
      val rh = j.hint.rightHint.orElse(
        if (scansReplicated(j.right)) Some(HintInfo(Some(BROADCAST))) else None)
      if ((lh, rh) == (j.hint.leftHint, j.hint.rightHint)) j
      else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
  }
}
