package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * interval(point-in-range) join. Both are composed from existing
  * shuffle/window primitives — preference (a) of the build plan — with
  * plan shapes that hold at 100 TB (single hash shuffle per input; no
  * per-row subqueries, no cross joins).
  */
object Temporal {

  /** As-of join: for each left row, the latest right row with the same
    * key and right time <= left time (inclusive). The canonical
    * trade/quote, click/attribution, feature/label alignment operator.
    *
    * Implementation: union both sides tagged, one window pass per key in
    * time order carrying the last-seen right payload forward — exactly
    * one shuffle of each input on the key, state bounded by one payload
    * per row. (The naive alternatives — per-left-row scalar subquery or
    * a range cross-join — are quadratic in hot keys and do not survive
    * 100 TB.)
    *
    * The right side must be unique per (key, time) — pre-aggregate
    * upstream if not — so the "latest" row is well-defined and the
    * result is deterministic in any engine.
    *
    * Output: all left columns plus the right side's non-key columns
    * (null where no right row precedes the left row — LEFT as-of).
    *
    * `forward = true` flips the direction: the EARLIEST right row with
    * right time >= left time (the "next event after" alignment) — the
    * same single window pass traversed in descending time order.
    * `toleranceSql` (a SQL interval expression, e.g. `INTERVAL '1'
    * HOUR`) bounds the match staleness as in pandas `merge_asof`: a
    * carried right row farther than the tolerance from the left time is
    * masked back to null. Both are post-window column expressions —
    * the plan (one shuffle, one window) is unchanged.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               forward: Boolean = false,
               toleranceSql: Option[String] = None): DataFrame = {
    val lcols = left.columns.filterNot(_ == key).toSeq
    val rcols = right.columns.filterNot(_ == key).toSeq
    // Guard the silent-misbehavior modes up front: shared payload names
    // would produce ambiguous duplicate output columns, and __-prefixed
    // inputs would collide with the operator's internal columns.
    val shared = lcols.toSet.intersect(rcols.toSet)
    require(shared.isEmpty,
      s"asofJoin: non-key column names must be disjoint; both sides have ${shared.mkString(", ")}")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asofJoin: column names may not start with '__' (reserved): ${reserved.mkString(", ")}")
    val lType = org.apache.spark.sql.types.StructType(
      left.schema.filterNot(_.name == key))
    val rType = org.apache.spark.sql.types.StructType(
      right.schema.filterNot(_.name == key))
    // Tag sorts right (0) before left (1) at equal time → inclusive <=.
    val r = right.select(col(key), col(rightTime).as("__t"),
      lit(0).as("__tag"), lit(null).cast(lType).as("__l"),
      struct(rcols.map(col): _*).as("__r"))
    val l = left.select(col(key), col(leftTime).as("__t"),
      lit(1).as("__tag"), struct(lcols.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    // Backward walks time ascending (last right <= t); forward walks it
    // descending (so "last seen" is the earliest right >= t). Tag keeps
    // rights before lefts at equal time either way → inclusive bounds.
    val order =
      if (forward) Seq(col("__t").desc, col("__tag"))
      else Seq(col("__t"), col("__tag"))
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val inTol = toleranceSql.map { tol =>
      if (forward) col("__m")(rightTime) <= col("__t") + expr(tol)
      else col("__m")(rightTime) >= col("__t") - expr(tol)
    }.getOrElse(lit(true))
    val cols: Seq[Column] = col(key) +:
      (lcols.map(c => col("__l")(c).as(c)) ++
        rcols.map(c => when(inTol, col("__m")(c)).as(c)))
    l.unionByName(r)
      .withColumn("__m", matched)
      .filter(col("__tag") === 1)
      .select(cols: _*)
  }

  /** Interval-point join WITHOUT an equi key, binned: each interval is
    * exploded onto fixed-width time bins, each point maps to exactly one
    * bin, and the join becomes a hash equi-join on the bin plus an exact
    * range filter. No duplicate results (a point has one bin) and no
    * cross join: cost is |points| + |intervals| * (width / bin), versus
    * the quadratic range cross-join. Pick binSeconds near the typical
    * interval width.
    */
  def binnedIntervalJoin(points: DataFrame, pointTime: String,
                         intervals: DataFrame, lo: String, hi: String,
                         binSeconds: Long): DataFrame = {
    val binned = intervals.withColumn("__bin", explode(expr(
      s"sequence(floor(unix_timestamp($lo) / $binSeconds), " +
        s"floor(unix_timestamp($hi) / $binSeconds))")))
    points
      .withColumn("__bin",
        expr(s"floor(unix_timestamp($pointTime) / $binSeconds)"))
      .join(binned, "__bin")
      .filter(col(pointTime) >= col(lo) && col(pointTime) < col(hi))
      .drop("__bin")
  }

  /** Interval-OVERLAP join WITHOUT an equi key, binned: both interval
    * sets explode onto fixed-width time bins and the join becomes a hash
    * equi-join on the bin plus the exact overlap predicate
    * (`a.lo < b.hi AND b.lo < a.hi`, half-open). Each surviving pair is
    * emitted EXACTLY once with no distinct pass: the overlap region
    * starts at max(a.lo, b.lo), both intervals contain that instant, and
    * floor commutes with max — so keeping only the row where the join
    * bin equals `greatest(floor(a.lo/bin), floor(b.lo/bin))` picks one
    * canonical bin per overlapping pair. Cost is linear in intervals ×
    * (width/bin), never |a|×|b|; pick binSeconds near the typical
    * interval width.
    */
  def binnedOverlapJoin(a: DataFrame, aLo: String, aHi: String,
                        b: DataFrame, bLo: String, bHi: String,
                        binSeconds: Long): DataFrame = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"binnedOverlapJoin: column names must be disjoint; both sides have ${shared.mkString(", ")}")
    def bins(lo: String, hi: String) = explode(expr(
      s"sequence(floor(unix_timestamp($lo) / $binSeconds), " +
        s"floor(unix_timestamp($hi) / $binSeconds))"))
    val ab = a.withColumn("__bin", bins(aLo, aHi))
    val bb = b.withColumn("__bin", bins(bLo, bHi))
    ab.join(bb, "__bin")
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__bin") === greatest(
        expr(s"floor(unix_timestamp($aLo) / $binSeconds)"),
        expr(s"floor(unix_timestamp($bLo) / $binSeconds)")))
      .drop("__bin")
  }

  /** Gap-filled resample with forward fill: bucket an event stream to a
    * fixed interval per key, materialize EVERY bucket between each key's
    * first and last observation, and carry the last observed value into
    * the empty buckets — the regularization step in front of any
    * window-feature or time-series model.
    *
    * The bucket aggregate is `max(value)` (deterministic and
    * drift-free across engines; swap the aggregate upstream if another
    * summary is wanted). The dense grid comes from `sequence()` exploded
    * per key — grid size is span/interval per key, a deliberate,
    * queryable densification, not a join blow-up — and the fill is one
    * window pass per key in time order. Plan: one shuffle for the bucket
    * groupBy, one for the window; the span aggregate rides the first
    * shuffle. No leading nulls by construction: each key's grid starts
    * at its own first OBSERVED bucket.
    *
    * Output: (key, bucket `h`, filled value `v`, `observed` flag).
    */
  def resampleFfill(events: DataFrame, key: String, time: String,
                    value: String, intervalSql: String): DataFrame = {
    // Two consumers (grid span + fill join) read this aggregate; the r15
    // optimization pass A/B'd a lazy localCheckpoint here and measured it
    // NEUTRAL-to-negative at both sf0.1 and 10x (min-of-4 at 10x: 4.98 s
    // recompute vs 5.42 s checkpointed) — the re-aggregation is cheap and
    // parallel while the checkpoint pays serialize+store+read of a frame
    // that is not much smaller than its input. Recompute deliberately.
    val bucketed = events
      .groupBy(col(key), date_trunc(intervalSql, col(time)).as("h"))
      .agg(max(col(value)).as("v_obs"))
    val grid = bucketed
      .groupBy(col(key)).agg(min("h").as("lo"), max("h").as("hi"))
      .select(col(key), explode(expr(
        s"sequence(lo, hi, interval 1 $intervalSql)")).as("h"))
    val w = Window.partitionBy(key).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(key, "h"), "left")
      .select(col(key), col("h"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v"),
        col("v_obs").isNotNull.as("observed"))
  }
}
