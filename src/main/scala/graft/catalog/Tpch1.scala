package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** TPC-H sf1 catalog, data-free: the 8 tables registered EMPTY with the
  * reference's own serialized sf1 statistics attached — the setup its
  * `TestTpchAndComparePlan("1", …)` uses (`/root/reference/test/
  * UnitTest.cs:541-575`: "for 1g scale, we can't do real run, but we'd
  * like to see the plan" — it loads `tpch/statistics/sf1` via
  * `Statis.cs:721` and plans all 22 queries, diffing plan text against
  * `test/regress/expect/tpch1/`).
  *
  * This module is the Spark-side twin, feeding [[graft.Tpch1Plan]]: the
  * schema comes from parsing the reference's own `tpch.sql` DDL
  * ([[graft.regress.RefRegress.parseDdl]]), and the stats file — keyed
  * by TABLE+COLUMN concatenated, each entry a qpmodel `ColumnStat`
  * (`n_rows_`, `nullfrac_`, `n_distinct_`, equi-depth `hist_` with 100
  * boundary values + per-bucket `distincts_`, and an `mcv_` list) — is
  * converted to [[StatsImport]]'s injection JSON:
  *
  *   - `n_rows_` → table rowCount (max across the table's columns);
  *   - `n_distinct_` → ndv; `nullfrac_ × n_rows_` → nullCount;
  *   - histogram boundaries → min/max plus a Spark equi-height
  *     `Histogram` (bin i = [b_i, b_i+1] holding `depth_` rows, per-bin
  *     ndv from `distincts_`) — dates become days-since-epoch doubles,
  *     the representation Spark's own ANALYZE histograms use;
  *   - MCV-only columns (the file stores sorted MCVs) → min/max from
  *     the first/last value; string columns keep ndv/nullCount/avgLen
  *     only (Spark attaches no min/max/histogram to strings — equality
  *     selectivity is 1/ndv either way, same as the reference's
  *     `Historgram.EstSelectivity` equal-case);
  *   - sizeInBytes = rows × type-derived width, keeping relative table
  *     sizes right for broadcast choice.
  */
object Tpch1 {

  val DdlFile = "/root/reference/tpch/sql_scripts/tpch.sql"
  val StatsFile = "/root/reference/tpch/statistics/sf1"

  def schema(): Seq[(String, StructType)] =
    graft.regress.RefRegress.parseDdl(
      java.nio.file.Files.readString(java.nio.file.Paths.get(DdlFile)))

  /** Create the 8 tables EMPTY in `db` (dropped first). Plan-only:
    * catalog entries exist so analysis resolves and stats attach; no
    * file is written or read.
    */
  def createTables(spark: SparkSession, db: String = "tpch1"): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(s"USE $db")
    schema().foreach { case (table, st) =>
      val ddl = st.fields.map(f => s"${f.name} ${f.dataType.sql}")
        .mkString(", ")
      spark.sql(s"CREATE TABLE $table ($ddl) USING PARQUET")
    }
  }

  /** Convert the reference's sf1 stats file to [[StatsImport]] JSON. */
  def statsImportJson(statsPath: String = StatsFile): String = {
    val raw = JsonMethods.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(statsPath)))

    val tables = schema().map { case (table, st) =>
      var rows = BigInt(0)
      val colJsons = st.fields.toSeq.flatMap { f =>
        raw \ (table + f.name) match {
          case e @ JObject(_) =>
            val nRows = bigInt(e \ "n_rows_").getOrElse(BigInt(0))
            if (nRows > rows) rows = nRows
            val ndv = bigInt(e \ "n_distinct_")
            val nullCount = dbl(e \ "nullfrac_").map(fr =>
              BigInt((fr * nRows.toDouble).round))
            val fields =
              Seq(ndv.map(v => s""""ndv": $v"""),
                nullCount.map(v => s""""nullCount": $v"""),
                Some(s""""avgLen": ${width(f.dataType)}"""),
                Some(s""""maxLen": ${maxLen(f.dataType)}""")) ++
                rangeFields(e, f.dataType, ndv)
            Some(s""""${f.name}": {${fields.flatten.mkString(", ")}}""")
          case _ => None // column absent from the stats file
        }
      }
      val w = st.fields.map(f => width(f.dataType)).sum
      val size = rows * w max BigInt(1)
      s""""$table": {"rowCount": $rows, "sizeInBytes": $size, """ +
        s""""columns": {${colJsons.mkString(", ")}}}"""
    }
    s"""{"tables": {${tables.mkString(", ")}}}"""
  }

  /** min/max (+ histogram when the reference recorded one) for one
    * column entry. Histogram boundaries in the sf1 file are bucket
    * UPPER bounds (boundary i ≈ the value at rank (i+1)·depth; the last
    * is the column max), so bins span consecutive boundaries and the
    * first bucket's low edge is approximated by the first boundary —
    * a ≤1%-of-range understatement of min that plan comparison
    * tolerates.
    */
  private def rangeFields(e: JValue, dt: DataType,
                          ndv: Option[BigInt]): Seq[Option[String]] = {
    def num(v: JValue): Option[Double] = dt match {
      case DateType => v match {
        case JString(s) if s.length >= 10 =>
          scala.util.Try(
            LocalDate.parse(s.take(10)).toEpochDay.toDouble).toOption
        case _ => None
      }
      case _ => dbl(v)
    }
    def ext(d: Double): String = dt match {
      case DateType => LocalDate.ofEpochDay(d.toLong).toString
      case IntegerType | LongType => d.toLong.toString
      case _ => d.toString
    }
    val histBuckets = (e \ "hist_" \ "buckets_") match {
      case JArray(bs) =>
        val vals = bs.flatMap(num)
        if (vals.nonEmpty && vals.size == bs.takeWhile(_ != JNull).size)
          Some(vals)
        else None
      case _ => None
    }
    val mcvVals = (e \ "mcv_" \ "values_") match {
      case JArray(vs) => Some(vs.takeWhile(_ != JNull).flatMap(num))
      case _ => None
    }
    (histBuckets, dt) match {
      case (Some(bs), DateType | IntegerType | LongType | DoubleType |
                      FloatType) if bs.size >= 2 =>
        val height = dbl(e \ "hist_" \ "depth_")
          .getOrElse(1.0).max(1.0)
        val distincts = (e \ "hist_" \ "distincts_") match {
          case JArray(ds) => ds.flatMap(dbl).map(_.toLong)
          case _ => Nil
        }
        val fallbackNdv = math.max(1L,
          ndv.map(_.toLong).getOrElse(bs.size.toLong) / (bs.size - 1))
        val bins = bs.zip(bs.tail).zipWithIndex.map { case ((lo, hi), i) =>
          val bNdv =
            if (i + 1 < distincts.size) math.max(1L, distincts(i + 1))
            else fallbackNdv
          s"""{"lo": $lo, "hi": $hi, "ndv": $bNdv}"""
        }.mkString(", ")
        Seq(Some(s""""min": "${ext(bs.head)}""""),
          Some(s""""max": "${ext(bs.last)}""""),
          Some(s""""histogram": {"height": $height, "bins": [$bins]}"""))
      case _ => mcvVals match {
        case Some(vs) if vs.nonEmpty && numericOrDate(dt) =>
          Seq(Some(s""""min": "${ext(vs.min)}""""),
            Some(s""""max": "${ext(vs.max)}""""))
        case _ => Nil
      }
    }
  }

  private def numericOrDate(dt: DataType): Boolean = dt match {
    case DateType | IntegerType | LongType | DoubleType | FloatType => true
    case _ => false
  }

  private def width(dt: DataType): Int = dt match {
    case IntegerType | DateType | FloatType => 4
    case LongType | DoubleType => 8
    case _ => 24
  }
  private def maxLen(dt: DataType): Int = dt match {
    case StringType => 128
    case other => width(other)
  }

  /** Create tables and inject the reference's sf1 stats — the full
    * data-free catalog setup. Returns the tables updated.
    */
  def register(spark: SparkSession, db: String = "tpch1"): Seq[String] = {
    createTables(spark, db)
    StatsImport.inject(spark, statsImportJson())
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
}
