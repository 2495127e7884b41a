package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.graftbridge.StatsBridge
import org.json4s._
import org.json4s.jackson.JsonMethods

/** External statistics injection — plan with CBO stats WITHOUT running
  * ANALYZE (the reference imports Presto-format stats and plans 113
  * JOBench queries data-free, `/root/reference/qpmodel/PrestoStats.cs:38-119`,
  * `Statis.cs:696-737`).
  *
  * At 100 TB this matters operationally: `ANALYZE TABLE ... FOR ALL
  * COLUMNS` is itself a full-corpus job, while warehouse metadata services
  * (a Presto/Trino stats endpoint, an ingest-time profile, a previous
  * cluster's catalog) already know rowCount/ndv/min/max. This shim maps
  * that knowledge straight onto Spark's `CatalogStatistics`, the exact
  * structure ANALYZE would have written, so join reorder / broadcast
  * decisions plan identically to the ANALYZE path (asserted in
  * `StatsInjectionSpec`).
  *
  * JSON shape (field names mirror the reference's Presto schema —
  * rowCount / columns / distinct+null counts; min/max travel as strings
  * in Spark's external stat format, e.g. "1994-01-01" for dates):
  *
  * {{{
  * { "tables": {
  *     "lineitem": {
  *       "rowCount": 600572, "sizeInBytes": 123456789,
  *       "columns": {
  *         "l_orderkey": { "ndv": 150000, "nullCount": 0,
  *                         "min": "1", "max": "600000",
  *                         "avgLen": 8, "maxLen": 8 } } } } }
  * }}}
  *
  * Only `rowCount` is required per table; `sizeInBytes` defaults to
  * rowCount (any positive number keeps the relation out of the "assume
  * huge" default), and every column field is optional. Equi-height
  * histograms (what ANALYZE computes under
  * `spark.sql.statistics.histogram.enabled`) round-trip too, as
  * `"histogram": {"height": H, "bins": [{"lo":…, "hi":…, "ndv":…}]}` —
  * so export→inject is lossless and filter-selectivity estimates match
  * the ANALYZE path bin for bin.
  */
object StatsImport {

  /** Inject stats for every table in the JSON document. Tables must
    * exist in the session catalog (temp views carry no catalog stats —
    * register with `CREATE TABLE ... USING PARQUET LOCATION ...`).
    * Returns the table names updated.
    */
  def inject(spark: SparkSession, json: String): Seq[String] = {
    val root = JsonMethods.parse(json)
    val tables = (root \ "tables") match {
      case JObject(ts) => ts
      case other => throw new IllegalArgumentException(
        "stats JSON must carry a top-level \"tables\" object " +
          s"""({"tables": {"<name>": {"rowCount": ..., ...}}}); """ +
          s"got ${other.getClass.getSimpleName} for \"tables\"")
    }
    tables.map { case (table, spec) =>
      StatsBridge.setTableStats(spark, table, toCatalogStats(spec))
      table
    }
  }

  def injectFile(spark: SparkSession, path: String): Seq[String] =
    inject(spark, new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Export the current catalog stats of `tables` (e.g. after ANALYZE)
    * as injection-format JSON — the round-trip proves injection ≡ ANALYZE
    * and gives clusters a way to ship stats forward without re-scanning.
    */
  def export(spark: SparkSession, tables: Seq[String]): String = {
    val entries = tables.flatMap { t =>
      StatsBridge.getTableStats(spark, t).map { s =>
        val cols = s.colStats.map { case (c, cs) =>
          val fields = Seq(
            cs.distinctCount.map(v => s""""ndv": $v"""),
            cs.nullCount.map(v => s""""nullCount": $v"""),
            cs.min.map(v => s""""min": ${quote(v)}"""),
            cs.max.map(v => s""""max": ${quote(v)}"""),
            cs.avgLen.map(v => s""""avgLen": $v"""),
            cs.maxLen.map(v => s""""maxLen": $v"""),
            cs.histogram.map { h =>
              val bins = h.bins.map(b =>
                s"""{"lo": ${b.lo}, "hi": ${b.hi}, "ndv": ${b.ndv}}""")
              s""""histogram": {"height": ${h.height}, "bins": [${bins.mkString(", ")}]}"""
            }).flatten
          s"""${quote(c)}: {${fields.mkString(", ")}}"""
        }.mkString(", ")
        val rc = s.rowCount.map(v => s""""rowCount": $v, """).getOrElse("")
        s"""${quote(t)}: {$rc"sizeInBytes": ${s.sizeInBytes}, "columns": {$cols}}"""
      }
    }
    s"""{"tables": {${entries.mkString(", ")}}}"""
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def toCatalogStats(spec: JValue): CatalogStatistics = {
    val rowCount = bigInt(spec \ "rowCount")
    val size = bigInt(spec \ "sizeInBytes")
      .orElse(rowCount).getOrElse(BigInt(1))
    val cols = (spec \ "columns") match {
      case JObject(cs) => cs.map { case (name, c) =>
        name -> CatalogColumnStat(
          distinctCount = bigInt(c \ "ndv"),
          min = str(c \ "min"),
          max = str(c \ "max"),
          nullCount = bigInt(c \ "nullCount"),
          avgLen = long(c \ "avgLen"),
          maxLen = long(c \ "maxLen"),
          histogram = histogramOf(c \ "histogram"))
      }.toMap
      case _ => Map.empty[String, CatalogColumnStat]
    }
    CatalogStatistics(sizeInBytes = size, rowCount = rowCount, colStats = cols)
  }

  private def histogramOf(v: JValue): Option[Histogram] = v match {
    case JObject(_) =>
      val bins = (v \ "bins") match {
        case JArray(bs) => bs.map { b =>
          HistogramBin(
            lo = dbl(b \ "lo").getOrElse(0.0),
            hi = dbl(b \ "hi").getOrElse(0.0),
            ndv = long(b \ "ndv").getOrElse(0L))
        }.toArray
        case _ => Array.empty[HistogramBin]
      }
      Some(Histogram(dbl(v \ "height").getOrElse(0.0), bins))
    case _ => None
  }

  private def dbl(v: JValue): Option[Double] = v match {
    case JDouble(d) => Some(d)
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  private def bigInt(v: JValue): Option[BigInt] = v match {
    case JInt(i) => Some(i)
    case JLong(l) => Some(BigInt(l))
    case JDouble(d) => Some(BigInt(d.toLong))
    case JDecimal(d) => Some(d.toBigInt)
    case _ => None
  }
  private def long(v: JValue): Option[Long] = bigInt(v).map(_.toLong)
  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JInt(i) => Some(i.toString)
    case JLong(l) => Some(l.toString)
    case JDouble(d) => Some(d.toString)
    case JDecimal(d) => Some(d.toString)
    case _ => None
  }
}
