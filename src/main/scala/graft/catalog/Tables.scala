package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet data (TESTDATA.md).
  *
  * Mirrors the reference catalog (`/root/reference/qpmodel/Catalog.cs:69-161`:
  * `TableDef` with ordinal-ordered columns) — here a table is simply a parquet
  * directory registered as a temp view; the schema travels with the file.
  *
  * Scale note: on a real cluster these would be catalog tables (ideally
  * bucketed on their join keys — orders/lineitem by orderkey) so repeated
  * joins avoid the shuffle entirely. At 100 TB, registering raw parquet
  * paths still scales: scans are split by file/row-group and filters and
  * projections are pushed into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables a broadcast join should always pick up. */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
