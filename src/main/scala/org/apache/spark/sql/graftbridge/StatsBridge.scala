/* Bridge into Spark's package-private SessionState for catalog statistics
 * injection. `SparkSession.sessionState` is `private[sql]` in Spark 4, so
 * the read/write of `CatalogStatistics` lives in this shim package; the
 * statistics types themselves (`CatalogStatistics`, `CatalogColumnStat`)
 * are public catalyst API and are constructed by the caller.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.CatalogStatistics

object StatsBridge {

  private def state(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState

  /** Overwrite a catalog table's statistics (the same path ANALYZE TABLE
    * takes via `AnalyzeTableCommand` → `SessionCatalog.alterTableStats`),
    * but with externally-supplied numbers — no data scan.
    */
  def setTableStats(spark: SparkSession, table: String,
                    stats: CatalogStatistics): Unit = {
    val id = state(spark).sqlParser.parseTableIdentifier(table)
    state(spark).catalog.alterTableStats(id, Some(stats))
  }

  /** Read back a catalog table's current statistics, if any. */
  def getTableStats(spark: SparkSession,
                    table: String): Option[CatalogStatistics] = {
    val id = state(spark).sqlParser.parseTableIdentifier(table)
    state(spark).catalog.getTableMetadata(id).stats
  }
}
