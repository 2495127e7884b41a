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

  /** A join side is replicated iff it derives from replicated tables
    * ONLY — every base relation under it is a replicated scan (the
    * reference closes replication under local operators: any result
    * computed purely from replicated inputs is itself computable on
    * every node, `Catalog.cs:76-124`). An `exists`-style test here would
    * be a scale-killer: after join reorder, a multi-join intermediate
    * that merely CONTAINS nation/region would get force-broadcast
    * regardless of its actual size — the r7 10× soak caught exactly
    * that (a 9-relation query statically broadcasting a 1.3 GB
    * intermediate into the driver because one leaf was nation).
    */
  private def onlyReplicated(plan: LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.nonEmpty &&
          fs.location.rootPaths.forall(p => replicated.contains(p.getName))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: Join =>
      val lh = j.hint.leftHint.orElse(
        if (onlyReplicated(j.left)) Some(HintInfo(Some(BROADCAST))) else None)
      val rh = j.hint.rightHint.orElse(
        if (onlyReplicated(j.right)) Some(HintInfo(Some(BROADCAST))) else None)
      if ((lh, rh) == (j.hint.leftHint, j.hint.rightHint)) j
      else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
  }
}
