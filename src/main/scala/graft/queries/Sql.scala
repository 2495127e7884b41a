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
  /** Order-independent exact sum of a double expression. */
  def dsum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Order-independent average (exact sum / count). */
  def davg(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr)"
}
