package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: a Spark build function plus (optionally)
  * equivalent ANSI SQL the driver runs through DuckDB on the same parquet
  * tables. Column names must match between the two — the driver sorts
  * columns by name and hashes values (see builder contract).
  *
  * Conventions that keep the hash compare robust across engines:
  *  - every computed column is aliased identically on BOTH sides;
  *  - sums over double columns use the exact encodings in
  *    `graft.queries.Sql` (scaled-BIGINT or DECIMAL casts): addition is
  *    exact, so the result is order-independent and bit-identical in
  *    Spark and DuckDB (a plain double sum over 60k rows can drift
  *    ~1e-3 between engines);
  *  - per-row double arithmetic is left unrounded (IEEE ops on identical
  *    inputs are bit-identical);
  *  - sums of integers are cast to BIGINT in the oracle (DuckDB sums to
  *    HUGEINT, Spark to LONG);
  *  - no double→int casts (DuckDB rounds, Spark truncates);
  *  - every LIMIT has a total deterministic ORDER BY (unique key last).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Headline queries also timed by Bench. */
    bench: Boolean = false,
    /** The Spark-dialect SQL text when the build IS a SQL statement —
      * what [[SqlRunner]] batch files are made of.
      */
    sqlText: Option[String] = None)

object QueryDef {
  /** Build a QueryDef whose Spark side is SQL text over the registered
    * testdata views (the oracle may be the same text or a DuckDB dialect
    * variant).
    */
  def sqlDef(name: String, sparkSql: String, oracle: String,
             bench: Boolean = false): QueryDef =
    QueryDef(name, (s, dir) => run(s, dir, sparkSql), Some(oracle), bench,
      sqlText = Some(sparkSql))

  /** Same SQL on both engines. */
  def sameSql(name: String, sql: String, bench: Boolean = false): QueryDef =
    sqlDef(name, sql, sql, bench)

  def run(spark: SparkSession, dir: String, text: String): DataFrame = {
    graft.catalog.Tables.registerAll(spark, dir)
    spark.sql(text)
  }
}
