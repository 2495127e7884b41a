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
    * Three exact encodings, picked by scale (q := ROUND(x*10^s) is the
    * same nearest-integer, half away from zero, in both engines on the
    * same IEEE double; all-BIGINT sums are primitive codegen, measured
    * 2.2× faster than DECIMAL aggregation buffers at sf0.1):
    *
    *  - scale <= 4: single-limb SUM(q). Safe while rows/group × max|x|
    *    × 10^s < 2^63 — ~9e9 rows per group for x ~ 1e5 at scale 4.
    *  - scale 5..6: two-limb — q is split as hi = (q - q%f)/f (exact:
    *    q - q%f is a multiple of f <= 2^53, so the double division is
    *    an exact integer) and lo = q%f, each summed as BIGINT. |lo| <
    *    10^s bounds the lo sum to ~9e12 rows/group at scale 6; hi is
    *    bounded by |x| — 100 TB-fact-table safe. The reconstruction
    *    SUM(hi) + SUM(lo)/f rounds identically in both engines.
    *  - scale > 6: DECIMAL(18,s) casts (no practical row bound; Spark's
    *    non-ANSI long sum would wrap silently where DuckDB widens to
    *    int128). The corpus never needs it: products of 2-decimal
    *    inputs are exact at scale 6.
    *
    * CAST-to-DOUBLE before dividing everywhere: Spark types
    * `BIGINT / 10000.0` as DECIMAL while DuckDB types it DOUBLE — the
    * raw-value hash gate sees Decimal-vs-float and fails. DOUBLE / INT
    * is DOUBLE in both.
    */
  def dsum(expr: String, scale: Int = 4): String =
    if (scale <= 4) {
      val f = math.pow(10, scale).toLong
      s"(CAST(SUM(CAST(ROUND(($expr) * $f) AS BIGINT)) AS DOUBLE) / $f)"
    } else if (scale <= 6) {
      val f = math.pow(10, scale).toLong
      val q = s"CAST(ROUND(($expr) * $f) AS BIGINT)"
      val lo = s"$q % $f"
      val hi = s"CAST((CAST($q AS DOUBLE) - CAST($lo AS DOUBLE)) / $f AS BIGINT)"
      s"(CAST(SUM($hi) AS DOUBLE) + CAST(SUM($lo) AS DOUBLE) / $f)"
    } else
      s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Order-independent average (exact sum / count). */
  def davg(expr: String, scale: Int = 4): String =
    s"${dsum(expr, scale)} / COUNT($expr)"

  /** Raw scaled-BIGINT exact sum — the quantized integer itself, not yet
    * divided back to a double. For TPC-DS-style queries that feed an
    * aggregate into a WINDOW over the groups (ratio-to-parent, rank by
    * sum, running sum of sums): keeping the window arithmetic on BIGINT
    * makes the two aggregation levels exact and order-independent in both
    * engines; only the final displayed value divides back to DOUBLE.
    * Single-limb: safe while rows/group × max|x| × 10^s < 2^63 (see dsum).
    */
  def qsum(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale).toLong
    s"SUM(CAST(ROUND(($expr) * $f) AS BIGINT))"
  }

  /** Divide a scaled-BIGINT back to its double value. */
  def unscale(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale).toLong
    s"(CAST($expr AS DOUBLE) / $f)"
  }
}
