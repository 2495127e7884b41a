package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.catalog.ExtendedStats

/** Join-order steering from the containment estimator — the planning
  * half of the r13 statistics work, closing the gap the tpch1 audit
  * measured: the introspection estimator prices join chains at gmean
  * q-error 1.02 (CE battery, beating the reference's 1.71), yet join
  * ORDER was still chosen by Spark's CBO, which re-derives per-column
  * ndv on every intermediate and compounds the error multiplicatively
  * (tpch1 audit: root gmean 2.04, 8/22 reference-exact join trees).
  * The reference's memo orders joins directly from per-edge base-table
  * statistics (`/root/reference/qpmodel/LogicCard.cs:154-200`,
  * DPccp/DPBushy solvers in `optimizer.cs`); this rule is the Spark
  * analog, running AFTER CostBasedJoinReorder and re-ordering only
  * where the evidence is complete.
  *
  * Model: for an inner-join cluster with items R₁..Rₙ and equi-edges E,
  * the containment cardinality of any item subset S is
  *
  *   card(S) = Π_{i∈S} |Rᵢ| · Π_{e∈S×S} 1/divisor(e)
  *
  * where |Rᵢ| is Spark's own rowCount for the (filtered) item — the
  * leaf estimates ANALYZE already prices near-exactly — and divisor(e)
  * is the containment bound max(min(ndv_L,|R_L|), min(ndv_R,|R_R|)):
  * ndv read from the BASE tables' catalog column stats (exact
  * registered ndv preferred; the registered column-group ndv for
  * composite edges), each side capped at its item's filtered row count
  * (r15 — a filtered item cannot carry more distinct keys than rows,
  * and the uncapped base ndv under-ranked selective-side-first orders). This is the same
  * per-edge composition [[graft.catalog.ExtendedStats.containmentEstimate]]
  * applies to physical plans — notably TREE-SHAPE-INDEPENDENT, which is
  * what makes it a sound ORDERING cost: Spark's chain re-derivation
  * prices the same subset differently depending on history.
  *
  * Search: exact dynamic programming over connected subsets (the
  * DPccp-lite every item count here permits — n ≤ 12 matches Spark's
  * own `joinReorder.dp.threshold`), minimizing Cout = Σ intermediate
  * card(S). Cross products are never considered (only connected
  * subsets combine). The rewrite applies only when
  *
  *   - every join in the cluster is INNER, hint-free, and every
  *     condition conjunct is a plain column equality between two
  *     different items (a residual non-equi or disjunctive condition
  *     declines the whole cluster — its selectivity is outside this
  *     model);
  *   - every item carries a CBO rowCount and every edge has base-table
  *     ndv evidence on both sides — no evidence, no opinion: plans
  *     over bare temp views are untouched;
  *   - the DP's best tree is strictly cheaper under the SAME model
  *     than the tree CostBasedJoinReorder chose (ties keep Spark's
  *     order).
  *
  * Inner-join reordering with the full conjunct set preserved is
  * semantics-exact (the relational algebra equivalence CBO itself
  * relies on); a Project wrapper restores the original output order,
  * so parents see an identical schema. `spark.graft.containmentReorder`
  * = off | log | apply (default apply; log prices and reports the
  * disagreement without rewriting).
  *
  * Scope: INNER clusters only — and that is a closed adjudication, not
  * a deferral. A semi/anti join inside the plan becomes an opaque ITEM
  * (its CBO rowCount prices it, so the cluster AROUND it still
  * reorders); the join itself is never moved. The freedom a memo
  * optimizer has that this rule doesn't — interleaving the semi/anti
  * probe elsewhere in the order (the reference reorders them,
  * `JoinOrder.cs:364,439`) — is worthless under Cout: Spark's
  * PushDownLeftSemiAntiJoin has already pushed each semi/anti onto the
  * item providing its keys before this rule runs, and applying a
  * reducer (selectivity f ≤ 1) as early as possible minimizes every
  * downstream intermediate, so the pushed-down placement is always
  * Cout-optimal. Deferring a semi probe can only win under a cost
  * model that prices build/probe work per join — the documented
  * cost-model difference with the reference, not a search-space gap.
  */
class ContainmentJoinReorder extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.containmentReorder"
  private val MaxItems = 12

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = conf.getConfString(ConfKey, "apply")
    if (mode == "off" || !conf.cboEnabled) return plan
    plan.transformDown {
      case j: Join if eligibleRoot(j) =>
        reorder(j, mode).getOrElse(j)
    }
  }

  /** Quick structural pre-check before the (costlier) flatten: an inner
    * hint-free join whose PARENT is not itself part of the same cluster
    * (transformDown visits parents first, so the first eligible join we
    * see is a cluster root).
    */
  private def eligibleRoot(j: Join): Boolean =
    j.joinType == Inner && j.hint == JoinHint.NONE

  // ------------------------------------------------------------ flatten

  /** One equi-edge: item indices (a < b) and the divisor its conjuncts
    * contribute, plus the original conjuncts for reconstruction.
    */
  private case class Edge(a: Int, b: Int, divisor: Double,
                          conjuncts: Seq[Expression])

  private case class Cluster(items: IndexedSeq[LogicalPlan],
                             conjuncts: Seq[Expression])

  /** Flatten a maximal inner-join cluster: descend through inner
    * hint-free joins AND the pure-pruning Projects ColumnPruning
    * interleaves between them (all-attribute projections neither
    * rename nor compute, and [[rebuild]] re-establishes the pruning);
    * anything else is an item. None when any join in the cluster
    * carries a non-conjunctive-equi condition (the model cannot price
    * it) — the cluster is left exactly as CBO shaped it.
    */
  private def flatten(p: LogicalPlan): Option[Cluster] = p match {
    case Join(l, r, Inner, cond, hint) if hint == JoinHint.NONE =>
      for {
        lc <- flatten(l)
        rc <- flatten(r)
      } yield Cluster(lc.items ++ rc.items,
        lc.conjuncts ++ rc.conjuncts ++
          cond.toSeq.flatMap(splitConjunctivePredicates))
    case Project(pl, j: Join)
        if pl.forall(_.isInstanceOf[AttributeReference]) &&
          j.joinType == Inner && j.hint == JoinHint.NONE =>
      flatten(j)
    case other => Some(Cluster(IndexedSeq(other), Nil))
  }

  // ----------------------------------------------------------- evidence

  /** Base-relation column behind a join-key attribute of one item:
    * the catalog snapshot and column name, resolved by exprId through
    * the item's own subtree (aliases that RENAME a plain column keep
    * the exprId; computed keys don't resolve and decline).
    */
  private def baseColumn(item: LogicalPlan, a: Attribute)
      : Option[(org.apache.spark.sql.catalyst.catalog.CatalogTable, String)] =
    item.collectFirst {
      case r: LogicalRelation
          if r.catalogTable.isDefined &&
            r.output.exists(_.exprId == a.exprId) =>
        (r.catalogTable.get,
          r.output.find(_.exprId == a.exprId).get.name)
    }

  private def columnNdv(t: org.apache.spark.sql.catalyst.catalog.CatalogTable,
                        col: String): Option[Double] =
    ExtendedStats.exactNdvFromProperties(t.properties, col)
      .map(_.toDouble)
      .orElse(t.stats.flatMap(_.colStats.get(col)
        .flatMap(_.distinctCount).map(_.toDouble)))

  /** Divisors for the edges of a cluster: group conjuncts by the item
    * pair they connect; a pair with one equality divides by
    * max(ndv_L, ndv_R); a composite pair divides by the registered
    * column-group tuple-ndv when both sides carry one, else by the
    * per-key containment product (an ordering heuristic only — the
    * reported estimate surface never multiplies per-key divisors).
    * None when any conjunct is not a two-item column equality or any
    * ndv lacks evidence.
    *
    * Each side's ndv is capped at the ITEM's own row count (r15): a
    * filtered item cannot contribute more distinct key values than it
    * has rows, so pricing its edges from the BASE table's ndv while
    * its rows are filter-scaled under-ranks selective-side-first
    * orders (the standard filter-aware containment refinement —
    * min(ndv, |R_filtered|) per side, divisor still the max across
    * sides).
    */
  private def edges(c: Cluster, rows: IndexedSeq[Double]): Option[Seq[Edge]] = {
    val itemOf: Map[Long, Int] = c.items.zipWithIndex.flatMap {
      case (it, i) => it.outputSet.map(_.exprId.id -> i)
    }.toMap
    val perPair = scala.collection.mutable.LinkedHashMap
      .empty[(Int, Int), Vector[(Attribute, Attribute, Expression)]]
    c.conjuncts.foreach {
      case e @ EqualTo(x: AttributeReference, y: AttributeReference) =>
        (itemOf.get(x.exprId.id), itemOf.get(y.exprId.id)) match {
          case (Some(i), Some(j)) if i != j =>
            val ((a, b), (ka, kb)) = if (i < j) ((i, j), (x, y))
                                     else ((j, i), (y, x))
            perPair((a, b)) =
              perPair.getOrElse((a, b), Vector.empty) :+ ((ka, kb, e))
          case _ => return None // same-item or unresolvable equality
        }
      case _ => return None // non-equi conjunct: outside the model
    }
    val out = perPair.toSeq.map { case ((i, j), keys) =>
      val divisor: Option[Double] =
        if (keys.size >= 2) {
          val grouped = for {
            (tL, colsL) <- sameTableCols(c.items(i), keys.map(_._1))
            (tR, colsR) <- sameTableCols(c.items(j), keys.map(_._2))
            gL <- ExtendedStats.groupNdvFromProperties(tL.properties, colsL)
            gR <- ExtendedStats.groupNdvFromProperties(tR.properties, colsR)
          } yield math.max(math.min(gL.toDouble, rows(i)),
            math.min(gR.toDouble, rows(j)))
          grouped.orElse {
            // No registered tuple-ndv: approximate each SIDE's tuple
            // ndv as the product of its per-key ndvs, capped at the
            // item's rows BEFORE taking the cross-side max — capping
            // per key and multiplying afterwards can still exceed the
            // row count (10 rows, two keys of ndv 10 → divisor 100),
            // re-opening the very bound the cap enforces (r15 review).
            val per = keys.map { case (ka, kb, _) =>
              pairNdvs(c.items(i), ka, c.items(j), kb) }
            if (per.forall(_.isDefined)) {
              val ps = per.flatten
              Some(math.max(
                math.min(ps.map(_._1).product, rows(i)),
                math.min(ps.map(_._2).product, rows(j))))
            } else None
          }
        } else pairNdvs(c.items(i), keys.head._1, c.items(j), keys.head._2)
          .map { case (dL, dR) =>
            math.max(math.min(dL, rows(i)), math.min(dR, rows(j))) }
      divisor.map(d => Edge(i, j, math.max(1.0, d), keys.map(_._3)))
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }

  private def sameTableCols(item: LogicalPlan, as: Seq[Attribute])
      : Option[(org.apache.spark.sql.catalyst.catalog.CatalogTable,
                Seq[String])] = {
    val resolved = as.map(baseColumn(item, _))
    if (resolved.forall(_.isDefined)) {
      val rs = resolved.flatten
      if (rs.map(_._1.identifier).distinct.size == 1)
        Some((rs.head._1, rs.map(_._2))) else None
    } else None
  }

  /** Raw base-table ndv per side of one key pair — the caller applies
    * the min(ndv, item rows) caps (per side for a single key; on the
    * per-side PRODUCTS for a composite edge).
    */
  private def pairNdvs(li: LogicalPlan, la: Attribute,
                       ri: LogicalPlan, ra: Attribute)
      : Option[(Double, Double)] =
    for {
      (tL, cL) <- baseColumn(li, la)
      (tR, cR) <- baseColumn(ri, ra)
      dL <- columnNdv(tL, cL)
      dR <- columnNdv(tR, cR)
    } yield (dL, dR)

  // ----------------------------------------------------------------- DP

  /** card(S) under the containment model, in log space (the products
    * overflow doubles on wide clusters long before they matter).
    */
  private def logCard(mask: Int, rows: IndexedSeq[Double],
                      es: Seq[Edge]): Double = {
    var v = 0.0
    var i = 0
    while (i < rows.size) {
      if ((mask & (1 << i)) != 0) v += math.log(rows(i))
      i += 1
    }
    es.foreach { e =>
      if ((mask & (1 << e.a)) != 0 && (mask & (1 << e.b)) != 0)
        v -= math.log(e.divisor)
    }
    math.max(0.0, v) // floor at card 1
  }

  private case class Best(cost: Double, left: Int, right: Int)

  /** Exact DP over connected subsets minimizing Cout (Σ exp(logCard) of
    * every intermediate). Returns the partition table, or None when the
    * join graph is disconnected (a combine would need a cross product).
    */
  private def dp(n: Int, rows: IndexedSeq[Double], es: Seq[Edge])
      : Option[Array[Best]] = {
    val full = (1 << n) - 1
    val best = new Array[Best](full + 1)
    val adjacency = Array.fill(n)(0)
    es.foreach { e =>
      adjacency(e.a) |= 1 << e.b
      adjacency(e.b) |= 1 << e.a
    }
    (0 until n).foreach(i => best(1 << i) = Best(0.0, 0, 0))
    var size = 2
    while (size <= n) {
      var s = (1 << size) - 1
      while (s <= full) {
        if (Integer.bitCount(s) == size) {
          var bc = Double.PositiveInfinity
          var bl = 0
          // card(s) is invariant per mask — hoisted out of the submask
          // loop (3^n (s, s1) pairs each paying O(n+|E|) would be a
          // planning-path constant on every multi-join query)
          val cardS = math.exp(math.min(700.0, logCard(s, rows, es)))
          // enumerate proper submasks; count each unordered split once
          var s1 = (s - 1) & s
          while (s1 > 0) {
            val s2 = s ^ s1
            if (s1 > s2 && best(s1) != null && best(s2) != null &&
              connected(s1, s2, adjacency)) {
              val c = best(s1).cost + best(s2).cost + cardS
              if (c < bc) { bc = c; bl = s1 }
            }
            s1 = (s1 - 1) & s
          }
          if (bl != 0) best(s) = Best(bc, bl, s ^ bl)
        }
        s += 1
      }
      size += 1
    }
    if (best(full) == null) None else Some(best)
  }

  private def connected(s1: Int, s2: Int, adjacency: Array[Int]): Boolean = {
    var i = 0
    while (i < adjacency.length) {
      if ((s1 & (1 << i)) != 0 && (adjacency(i) & s2) != 0) return true
      i += 1
    }
    false
  }

  /** Cout of the tree CBO chose, under the same model — the comparison
    * baseline. Leaf items cost 0; every join node costs card(its item
    * set). Items are matched by IDENTITY (two scans of the same table
    * in a self-join are structurally equal but distinct items).
    * None on a non-item boundary: flatten and this walk are meant to
    * descend identically, but if they ever diverge the rule must
    * DECLINE the cluster (keep CBO's tree), not fail the user's query
    * from inside the optimizer (the r14 advisory).
    */
  private def currentCost(p: LogicalPlan, items: IndexedSeq[LogicalPlan],
                          rows: IndexedSeq[Double], es: Seq[Edge])
      : Option[(Int, Double)] = p match {
    case Join(l, r, Inner, _, hint) if hint == JoinHint.NONE =>
      for {
        (ml, cl) <- currentCost(l, items, rows, es)
        (mr, cr) <- currentCost(r, items, rows, es)
      } yield {
        val m = ml | mr
        (m, cl + cr + math.exp(math.min(700.0, logCard(m, rows, es))))
      }
    case Project(pl, j: Join) // mirror flatten's pruning-Project descent
        if pl.forall(_.isInstanceOf[AttributeReference]) &&
          j.joinType == Inner && j.hint == JoinHint.NONE =>
      currentCost(j, items, rows, es)
    case other =>
      val i = items.indexWhere(_ eq other)
      if (i < 0) {
        logWarning(s"containment reorder: non-item boundary " +
          s"${other.nodeName} — declining the cluster")
        None
      } else Some((1 << i, 0.0))
  }

  // ------------------------------------------------------------ rebuild

  private def rebuild(mask: Int, best: Array[Best],
                      items: IndexedSeq[LogicalPlan],
                      placed: java.util.IdentityHashMap[Expression, Unit],
                      conjuncts: Seq[Expression]): LogicalPlan =
    if (Integer.bitCount(mask) == 1)
      items(Integer.numberOfTrailingZeros(mask))
    else {
      val b = best(mask)
      val l = rebuild(b.left, best, items, placed, conjuncts)
      val r = rebuild(b.right, best, items, placed, conjuncts)
      val out = l.outputSet ++ r.outputSet
      val here = conjuncts.filter(c =>
        !placed.containsKey(c) && c.references.subsetOf(out))
      here.foreach(placed.put(_, ()))
      Join(l, r, Inner,
        here.reduceOption(And), JoinHint.NONE)
    }

  /** Re-establish the column pruning the flatten dissolved: each node
    * keeps only the attributes its ancestors need (the cluster root's
    * output plus every enclosing join condition's references) —
    * the same shape ColumnPruning would produce, so a reordered tree
    * never ships wider shuffles than the original.
    */
  private def prune(p: LogicalPlan,
      needed: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : LogicalPlan = p match {
    case Join(l, r, Inner, cond, h) =>
      val need = needed ++
        cond.map(_.references).getOrElse(
          org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)
      val j = Join(prune(l, need), prune(r, need), Inner, cond, h)
      if (j.output.forall(needed.contains)) j
      else Project(j.output.filter(needed.contains), j)
    case Filter(c, child) => Filter(c, prune(child, needed ++ c.references))
    case item =>
      val keep = item.output.filter(needed.contains)
      if (keep.size == item.output.size) item else Project(keep, item)
  }

  // ------------------------------------------------------------- driver

  private def reorder(root: Join, mode: String): Option[LogicalPlan] =
    for {
      cluster <- flatten(root)
      n = cluster.items.size
      if n >= 3 && n <= MaxItems
      rowCounts <- {
        val rcs = cluster.items.map(_.stats.rowCount)
        if (rcs.forall(_.isDefined))
          Some(rcs.flatten.map(rc => math.max(1.0, rc.toDouble)))
        else None
      }
      es <- edges(cluster, rowCounts.toIndexedSeq)
      if es.nonEmpty
      table <- dp(n, rowCounts.toIndexedSeq, es)
      (_, curCost) <-
        currentCost(root, cluster.items, rowCounts.toIndexedSeq, es)
      result <- {
        val full = (1 << n) - 1
        val bestCost = table(full).cost
        if (bestCost >= curCost * 0.999) {
          logInfo(s"containment reorder: CBO order already optimal " +
            f"(Cout $curCost%.3g) over $n items")
          None
        } else {
          logInfo(f"containment reorder: Cout $curCost%.3g -> " +
            f"$bestCost%.3g over $n items" +
            (if (mode == "log") " (log only)" else ""))
          if (mode != "apply") None
          else {
            val placed = new java.util.IdentityHashMap[Expression, Unit]()
            val tree = rebuild(full, table, cluster.items, placed,
              cluster.conjuncts)
            val rest = cluster.conjuncts.filterNot(placed.containsKey)
            val filtered = rest.reduceOption(And).map(Filter(_, tree))
              .getOrElse(tree)
            val pruned = prune(filtered,
              org.apache.spark.sql.catalyst.expressions
                .AttributeSet(root.output))
            Some(Project(root.output, pruned))
          }
        }
      }
    } yield result
}
