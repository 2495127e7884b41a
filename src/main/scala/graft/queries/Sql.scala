package graft.queries

/** SQL fragments shared by the corpus.
  *
  * Cross-engine determinism rules (see QueryDef scaladoc): double sums go
  * through an exact DECIMAL cast so Spark's parallel, partial-agg sum and
  * DuckDB's serial sum produce bit-identical results regardless of
  * accumulation order. The testdata doubles carry at most 2 decimal
  * places, so `DECIMAL(18,4)` casts are exact (no rounding at all);
  * products of two such values fit `DECIMAL(18,6)` after one rounding
  * step that both engines perform identically on the same IEEE double.
  */
object Sql {
  /** Order-independent exact sum of a double expression.
    *
    * Two exact encodings, picked by scale:
    *  - scale <= 4: sum scaled BIGINTs — ROUND(x*10^s) is the same
    *    nearest-integer (half away from zero) in both engines on the same
    *    IEEE double, long addition is exact and an order-of-magnitude
    *    faster than decimal (primitive codegen vs BigDecimal buffer).
    *    Magnitudes here keep the scaled sum far below 2^53, so the final
    *    double division is exact too.
    *  - scale > 4: DECIMAL(18,s) casts (scaled longs would overflow for
    *    high-scale products at large scale factors; Spark's non-ANSI long
    *    sum wraps silently where DuckDB widens to int128).
    */
  def dsum(expr: String, scale: Int = 4): String =
    if (scale <= 4) {
      val f = math.pow(10, scale).toLong
      // CAST-to-DOUBLE before dividing: Spark types `BIGINT / 10000.0` as
      // DECIMAL while DuckDB types it DOUBLE — the raw-value hash gate
      // sees Decimal-vs-float and fails. DOUBLE / INT is DOUBLE in both.
      s"(CAST(SUM(CAST(ROUND(($expr) * $f) AS BIGINT)) AS DOUBLE) / $f)"
    } else
      s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Order-independent average (exact sum / count). */
  def davg(expr: String, scale: Int = 4): String =
    s"${dsum(expr, scale)} / COUNT($expr)"
}
