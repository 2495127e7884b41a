package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

import graft.catalog.ExtendedStats

/** Certified broadcast from COLUMN-GROUP statistics — the planning half
  * of [[graft.catalog.ExtendedStats]].
  *
  * Spark prices a multi-key inner equi-join with the MINIMUM of the
  * per-key containment estimates (the most selective single key wins;
  * measured on sf0.01: lineitem self-joined on (l_partkey, l_suppkey)
  * is estimated at |L|²/ndv(partkey) ≈ 2.3M rows where the truth is
  * ~470k). Because a tuple has at least as many distinct values as any
  * of its components, that single-key estimate can only OVER-state a
  * correlated composite-key join — so the join output misses the
  * broadcast threshold, the planner falls back to a sort-merge join,
  * and at 100 TB the downstream join pays a full both-sides shuffle
  * that was never necessary. (AQE's runtime shuffle→broadcast
  * conversion recovers the join strategy but only AFTER paying the
  * build side's complete shuffle-map write; a static broadcast skips
  * the shuffle entirely.)
  *
  * An ordinary cardinality estimate must never force a broadcast — if
  * it under-states, the driver collects an arbitrarily large build side
  * and the query dies unrecoverably. What makes this rule safe is that
  * the registered statistic yields a TRUE BOUND, not an estimate: with
  * F2 = Σ_t c(t)² (the tuple-frequency second moment recorded by
  * `analyzeColumnGroup` in the same pass as the tuple-ndv),
  * Cauchy–Schwarz gives |L ⋈ R| = Σ_t c_L(t)·c_R(t) ≤ √(F2_L·F2_R) for
  * ANY equi-join on the tuple. Filters under or over the join and extra
  * join conjuncts only shrink the output, so the bound survives them.
  * The rule therefore hints BROADCAST on a join side exactly when
  *
  *   - the side's row-non-increasing chain (Filter/Project) roots at an
  *     inner multi-key equi-join whose key tuples carry registered F2
  *     on both base tables (reached by Filter/Project only — anything
  *     row-increasing in between, another join, a generator, would
  *     break the bound and disqualifies the side);
  *   - the statistic snapshot is verifiably CURRENT (analyze-time
  *     (rowCount, sizeInBytes) identity vs live catalog stats, exact
  *     match — see [[groupF2]]);
  *   - every output byte is accounted for by evidence, not schema
  *     defaults (fixed-width types or ANALYZE maxLen — see
  *     [[certifiedRowWidth]]);
  *   - Spark's own size estimate denies the broadcast, but
  *     √(F2_L·F2_R) · certified-row-width fits under
  *     `autoBroadcastJoinThreshold`.
  *
  * Runs in the `User Provided Optimizers` batch
  * (`experimental.extraOptimizations`, registered by
  * [[graft.GraftSession]]), which Spark places AFTER the `Join Reorder`
  * batch — a hint attached any earlier would make CostBasedJoinReorder
  * skip the whole chain (it only reorders hint-free inner joins), so
  * placement is load-bearing: reorder first on Spark's own estimates,
  * then certify the final shape. Idempotent (hinted sides are left
  * untouched), so the batch's fixed-point re-run converges immediately.
  *
  * The mirror direction — blocking a broadcast the group stat says is
  * too big — is provably unreachable under Spark's current rule: the
  * containment bound |L|·|R|/max(g_L,g_R) with tuple-ndv g ≥ any
  * single-key ndv is never LARGER than Spark's min-per-key estimate,
  * so a side Spark sizes under the threshold is never one the group
  * stat sizes over it. No code for it, by that argument (asserted by
  * ColumnGroupGuardSpec's ordering test).
  */
class ColumnGroupCertifiedBroadcast extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.autoBroadcastJoinThreshold <= 0) plan
    else plan.transformUp {
      case j: Join =>
        val lh = j.hint.leftHint.orElse(certify(j.left))
        val rh = j.hint.rightHint.orElse(certify(j.right))
        if ((lh, rh) == (j.hint.leftHint, j.hint.rightHint)) j
        else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
    }
  }

  /** BROADCAST iff Spark's estimate denies the broadcast but the F2
    * bound certifies the side fits under the threshold.
    *
    * Ordering is load-bearing: `side.stats` is touched ONLY after the
    * F2 lookup succeeds. `LogicalPlan.stats` memoizes on first call,
    * and a call made mid-optimizer freezes values that later phases
    * would compute differently (measured: a lazily-localCheckpointed
    * frame's size estimate differs between optimization time and
    * planning time, and the frozen copy flipped an unrelated corpus
    * query's join strategy). Checking the registered statistic first
    * makes the rule provably inert on every plan without column
    * groups.
    */
  private def certify(side: LogicalPlan): Option[HintInfo] = {
    val threshold = BigInt(conf.autoBroadcastJoinThreshold)
    for {
      join <- joinRoot(side)
      rowBound <- joinRowUpperBound(join)
      width <- certifiedRowWidth(side)
      if rowBound * BigDecimal(width) <= BigDecimal(threshold)
      if side.stats.sizeInBytes > threshold // not already broadcastable
    } yield HintInfo(Some(BROADCAST))
  }

  /** A row width the certificate may multiply the row bound by — None
    * when no trustworthy width exists, in which case the side is NOT
    * certified. A bound on rows times a GUESSED width is not a bound on
    * bytes: Spark's schema-default widths price every string at 20
    * bytes, so a side carrying long VARCHARs could exceed the broadcast
    * threshold by the width error while "certified" (the r12 advisory).
    * Accepted evidence, per output attribute:
    *
    *   - a fixed-width type: the width is the type's, no stats needed;
    *   - a string/binary attribute whose ORIGIN column carries an
    *     ANALYZE `maxLen` (read off the base relations' catalog
    *     snapshots under the side): maxLen, plus Spark's own per-string
    *     object overhead so the figure matches what the broadcast
    *     actually builds;
    *   - anything else (no maxLen, a computed variable-width value, an
    *     array/map/struct): decline.
    *
    * maxLen, not avgLen: the broadcast side is join OUTPUT rows, and
    * when key multiplicity correlates with value length (hot keys
    * carrying long strings) the output's MEAN width exceeds the base
    * table's avgLen — rows·avgLen is then not a byte bound (the r13
    * advisory). rows·maxLen is, for any multiplicity mix, because no
    * single value exceeds maxLen. ANALYZE's string maxLen counts CODE
    * POINTS (Spark's AnalyzeColumnCommand uses `Length` =
    * `UTF8String.numChars`, one per UTF-8 sequence — not bytes), while
    * the broadcast builds UTF8String BYTES: a code point encodes to at
    * most 4 UTF-8 bytes (supplementary plane), so ×4 converts the
    * count to a true byte bound. The conservatism only narrows when
    * the rule fires, never its safety; the ×1.001 slack on the row
    * bound absorbs the stored double's rounding, and the 8-byte row
    * overhead mirrors `EstimationUtils.getSizePerRow`.
    */
  private def certifiedRowWidth(side: LogicalPlan): Option[BigInt] = {
    lazy val maxLens: Map[Long, Long] = side.collect {
      case r: LogicalRelation if r.catalogTable.isDefined =>
        val colStats = r.catalogTable.get.stats
          .map(_.colStats).getOrElse(Map.empty)
        r.output.flatMap(a =>
          colStats.get(a.name).flatMap(_.maxLen).map(a.exprId.id -> _))
    }.flatten.toMap
    val widths = side.output.map { a =>
      a.dataType match {
        case _: NumericType | BooleanType | DateType | TimestampType |
             TimestampNTZType | _: DayTimeIntervalType |
             _: YearMonthIntervalType | NullType =>
          Some(BigInt(a.dataType.defaultSize))
        case StringType =>
          // ×4: code points → UTF-8 byte bound (see docstring);
          // + (8 + 4) = UTF8String object + offset overhead, the same
          // constant Spark's own estimator adds on top of the length.
          maxLens.get(a.exprId.id).map(l => BigInt(l) * 4 + 8 + 4)
        case BinaryType =>
          // binary maxLen already counts BYTES (no ×4), but the built
          // rows carry the same per-value object + offset overhead as
          // strings — omitting it under-counted the hard byte bound by
          // 12 bytes/row/column (the r14 advisory).
          maxLens.get(a.exprId.id).map(l => BigInt(l) + 8 + 4)
        case _ => None
      }
    }
    if (widths.forall(_.isDefined)) Some(widths.flatten.sum + 8) else None
  }

  /** The nearest Join under row-non-increasing operators; the F2 bound
    * on its output bounds the whole side's row count.
    */
  @tailrec private def joinRoot(p: LogicalPlan): Option[Join] = p match {
    case j: Join => Some(j)
    case Project(_, c) => joinRoot(c)
    case Filter(_, c) => joinRoot(c)
    case _ => None
  }

  /** √(F2_L·F2_R) for an inner multi-key equi-join whose key tuples
    * carry registered F2 on both sides' base tables; None otherwise.
    * The ×1.001 absorbs double rounding in the stored moments — the
    * statistic is exact in value but serialized through a double.
    */
  private def joinRowUpperBound(j: Join): Option[BigDecimal] = {
    if (j.joinType != Inner) return None
    val pairs = j.condition.map(splitConjunctivePredicates).getOrElse(Nil)
      .collect {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
          (a, b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if j.left.outputSet.contains(b) && j.right.outputSet.contains(a) =>
          (b, a)
      }
    if (pairs.size < 2) None
    else
      for {
        f2L <- groupF2(j.left, pairs.map(_._1))
        f2R <- groupF2(j.right, pairs.map(_._2))
      } yield BigDecimal(math.sqrt(f2L * f2R) * 1.001)
  }

  /** Registered F2 for `keys` on `side` — defined only when the side is
    * a Filter/Project chain over a cataloged base relation that carries
    * every key attribute. The chain restriction is correctness, not
    * convenience: an operator that can RAISE per-tuple multiplicities
    * (a join, a generator, a union) would invalidate the base table's
    * moment as a bound for this side.
    *
    * Freshness gate: the moment is a point-in-time snapshot, and data
    * changed AFTER the analyze can under-state it — Spark's native
    * stats only bias a threshold-guarded cost decision, but this rule
    * acts on F2 as a hard certificate, so staleness it can detect must
    * decline it. The snapshot identity recorded next to F2 (analyze-
    * time rowCount AND catalog sizeInBytes) must match the catalog's
    * live stats EXACTLY: growth under-states F2 directly, and a
    * one-sided "growth only" check would pass an INSERT OVERWRITE that
    * keeps the row count while concentrating keys — equal cardinality,
    * arbitrarily larger true join output (the r13 advisory). Deletes
    * alone can only shrink tuple frequencies, but a shrunk count is
    * indistinguishable from delete+rewrite, so any mismatch declines.
    * Anything missing → cannot verify → no certificate. Catalog stats
    * themselves stale (no re-ANALYZE after the change) are undetectable
    * by ANY stats consumer; the contract is the standard one — stats
    * reflect the last ANALYZE.
    */
  @tailrec private def groupF2(side: LogicalPlan,
                               keys: Seq[AttributeReference]): Option[Double] =
    side match {
      case r: LogicalRelation =>
        r.catalogTable
          .filter(_ => keys.forall(k => r.output.exists(_.exprId == k.exprId)))
          .filter(snapshotFresh(_, keys.map(_.name)))
          .flatMap(t => ExtendedStats.groupF2FromProperties(
            t.properties, keys.map(_.name)))
      case Project(_, c) => groupF2(c, keys)
      case Filter(_, c) => groupF2(c, keys)
      case _ => None
    }

  private def snapshotFresh(t: CatalogTable, cols: Seq[String]): Boolean =
    (for {
      recordedRows <- ExtendedStats.groupRowsFromProperties(t.properties, cols)
      recordedSize <- ExtendedStats.groupSizeFromProperties(t.properties, cols)
      stats <- t.stats
      currentRows <- stats.rowCount
    } yield currentRows == BigInt(recordedRows) &&
      stats.sizeInBytes == recordedSize).getOrElse(false)
}
