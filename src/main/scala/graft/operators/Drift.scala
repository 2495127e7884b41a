package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{abs, broadcast, col, expr, sum}

/** Distribution-drift measurement between two slices of a corpus — the
  * monitoring op a pipeline runs when a new crawl/dump lands: "does this
  * batch's feature distribution match what we trained on?"
  */
object Drift {

  /** Exact two-sample Kolmogorov–Smirnov statistic over an integer
    * feature column: max over feature values of |F_a(v) − F_b(v)|, the
    * standard two-sample drift test. Returns one row
    * (n_a, n_b, ks_at, ks_stat) — ks_at is the smallest value attaining
    * the supremum. If either side is EMPTY the statistic is undefined
    * and ks_stat is NULL (with that side's count 0) — alert on it.
    *
    * Scale shape: the corpus reduces FIRST — one wordcount-style
    * group-by on the feature value (map-side partial sums) — so the
    * cumulative-sum window runs over the DISTINCT-VALUE frame, not the
    * corpus. That frame is bounded by the feature's cardinality (a few
    * thousand for lengths/scores), which is why the single-partition
    * window is fine here and would not be on raw rows; for genuinely
    * continuous features, bucket (e.g. `round(v, 3)`) before calling —
    * the same pre-reduction contract. Every F value is an exact
    * rational of counts, so results are bit-stable cross-engine.
    */
  def ksDrift(df: DataFrame, valueCol: String, sideACond: String): DataFrame = {
    val perV = df
      .selectExpr(s"$valueCol AS v",
        s"CASE WHEN $sideACond THEN 1 ELSE 0 END AS ia")
      .groupBy("v")
      .agg(sum(col("ia")).as("ca"), sum(expr("1 - ia")).as("cb"))
    val tot = perV.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // An empty side makes every F difference 0/0: guard with nullif so
    // ks_stat comes back NULL (desc ordering puts NULLs LAST, so a valid
    // row can never lose to the degenerate one) — a monitoring caller
    // must treat NULL as "split invalid, alert", never as "no drift".
    // The unguarded form yields NaN, which desc-sorts FIRST and silently
    // suppresses real drift rows.
    perV.crossJoin(broadcast(tot))
      .withColumn("d", abs(
        sum(col("ca")).over(w).cast("double") /
          expr("CAST(nullif(n_a, 0) AS DOUBLE)") -
          sum(col("cb")).over(w).cast("double") /
            expr("CAST(nullif(n_b, 0) AS DOUBLE)")))
      .orderBy(col("d").desc, col("v"))
      .limit(1)
      .select(col("n_a"), col("n_b"), col("v").as("ks_at"),
        col("d").as("ks_stat"))
  }

  /** Population Stability Index between the two sides of a split —
    * the industry-standard ML feature-drift score (rule of thumb:
    * < 0.1 stable, 0.1–0.25 moderate, > 0.25 action): fixed-width bins
    * of the feature, PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b). Laplace
    * add-one smoothing on bin counts keeps empty bins (and even an
    * empty SIDE) defined without dropping them — a bin present on one
    * side only is exactly the drift signal PSI exists to amplify.
    *
    * Scale shape: identical to [[ksDrift]] — one map-side-combined
    * group-by reduces the corpus to the bin frame (cardinality =
    * feature range / binWidth), everything after runs on that bounded
    * frame. Returns one row (n_a, n_b, n_bins, psi).
    */
  def psiDrift(df: DataFrame, valueCol: String, sideACond: String,
               binWidth: Int = 100): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // Floor-division binning (not `div`, which truncates toward zero):
    // for negative feature values truncation would merge the two bins
    // straddling zero (-99..99 → bin 0) and diverge from both the DuckDB
    // oracle's `//` and the streaming twin's floor(value/width) — the
    // r10 ADVICE finding. Integer-exact (no double round-trip), so bins
    // stay right even for |value| beyond 2^53.
    val perB = df
      .selectExpr(
        s"(($valueCol - ((($valueCol % $binWidth) + $binWidth) % $binWidth))" +
          s" div $binWidth) AS b",
        s"CASE WHEN $sideACond THEN 1 ELSE 0 END AS ia")
      .groupBy("b")
      .agg(sum(col("ia")).as("ca"), sum(expr("1 - ia")).as("cb"))
    val tot = perB.agg(
      expr("CAST(SUM(ca) AS BIGINT)").as("ta"),
      expr("CAST(SUM(cb) AS BIGINT)").as("tb"),
      expr("CAST(COUNT(*) AS BIGINT)").as("nb"))
    // Per-bin terms are quantized to nano-units (round(x·1e9) as BIGINT)
    // before summing — the text_lm_nll discipline: double sums are
    // order-dependent in the last ulps and the oracle gate rounds to
    // 6 dp, so a float SUM can straddle a rounding boundary between
    // engines; an integer sum of identically-quantized terms cannot.
    // 1.0D, not 1.0: Spark parses a bare decimal literal as DECIMAL and
    // would run the whole ratio chain in limited-scale decimal division
    // (~1e-7 relative error vs the oracle's IEEE doubles — measured).
    perB.crossJoin(broadcast(tot))
      .groupBy(col("ta"), col("tb"), col("nb"))
      .agg(expr(
        """SUM(CAST(round((((ca + 1.0D) / (ta + nb) - (cb + 1.0D) / (tb + nb))
          |  * ln(((ca + 1.0D) / (ta + nb)) / ((cb + 1.0D) / (tb + nb))))
          |  * 1e9) AS BIGINT)) / 1e9""".stripMargin).as("psi"))
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        col("nb").as("n_bins"), col("psi"))
  }
}
