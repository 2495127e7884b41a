package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: a Spark build function plus (optionally)
  * equivalent ANSI SQL the driver runs through DuckDB on the same parquet
  * tables. Column names and row order must match between the two — the
  * driver sorts columns by name and hashes values (see builder contract).
  *
  * Conventions to keep the hash compare robust across engines:
  *  - every floating-point output is `round(x, 4)` on BOTH sides;
  *  - sums of integers are cast to BIGINT in the oracle (DuckDB sums to
  *    HUGEINT, Spark to LONG);
  *  - every query has a total deterministic ORDER BY (unique key last).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Headline queries are also timed by Bench. */
    bench: Boolean = false)

object QueryDef {
  def sql(name: String, spark: SparkSession, dir: String, text: String): DataFrame = {
    graft.catalog.Tables.registerAll(spark, dir)
    spark.sql(text)
  }
}
