package graft.catalog

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JOBench (Join Order Benchmark, IMDB) catalog: the 21-table schema and
  * an adapter from the reference's serialized Presto statistics to
  * [[StatsImport]]'s injection format.
  *
  * The reference's strongest join-order stress is planning all 113 real
  * JOB queries DATA-FREE: it creates the IMDB schema, loads
  * `jobench/statistics/jobench_stats`, and optimizes each query purely
  * from statistics (`/root/reference/test/UnitTest.cs:357-381`,
  * `/root/reference/qpmodel/PrestoStats.cs:38-119`). This module gives
  * the Spark engine the same capability: empty catalog tables + injected
  * `CatalogStatistics` drive Catalyst's CBO join reorder and broadcast
  * choice exactly as a 100 TB warehouse's metadata service would — no
  * scan, no ANALYZE.
  *
  * Stats-file format (reference `Statis.cs:696-737` serialization): a
  * single JSON object keyed by TABLE+COLUMN concatenated (no separator
  * — resolved here by iterating the KNOWN schema's (table, column)
  * pairs, which sidesteps the `movie_info` / `movie_info_idx` prefix
  * ambiguity), each entry carrying `n_rows_`, `nullfrac_`,
  * `n_distinct_`, an equi-height histogram `hist_` (100 bucket
  * boundaries, numeric or string), and an MCV list.
  */
object Jobench {

  /** IMDB schema, from the public JOB benchmark DDL (reference
    * `jobench/sql_scripts/schema.sql`). (name, isString) per column —
    * ints otherwise.
    */
  val schema: Seq[(String, Seq[(String, Boolean)])] = Seq(
    "aka_name" -> Seq("id" -> false, "person_id" -> false, "name" -> true,
      "imdb_index" -> true, "name_pcode_cf" -> true, "name_pcode_nf" -> true,
      "surname_pcode" -> true, "md5sum" -> true),
    "aka_title" -> Seq("id" -> false, "movie_id" -> false, "title" -> true,
      "imdb_index" -> true, "kind_id" -> false, "production_year" -> false,
      "phonetic_code" -> true, "episode_of_id" -> false, "season_nr" -> false,
      "episode_nr" -> false, "note" -> true, "md5sum" -> true),
    "cast_info" -> Seq("id" -> false, "person_id" -> false,
      "movie_id" -> false, "person_role_id" -> false, "note" -> true,
      "nr_order" -> false, "role_id" -> false),
    "char_name" -> Seq("id" -> false, "name" -> true, "imdb_index" -> true,
      "imdb_id" -> false, "name_pcode_nf" -> true, "surname_pcode" -> true,
      "md5sum" -> true),
    "comp_cast_type" -> Seq("id" -> false, "kind" -> true),
    "company_name" -> Seq("id" -> false, "name" -> true,
      "country_code" -> true, "imdb_id" -> false, "name_pcode_nf" -> true,
      "name_pcode_sf" -> true, "md5sum" -> true),
    "company_type" -> Seq("id" -> false, "kind" -> true),
    "complete_cast" -> Seq("id" -> false, "movie_id" -> false,
      "subject_id" -> false, "status_id" -> false),
    "info_type" -> Seq("id" -> false, "info" -> true),
    "keyword" -> Seq("id" -> false, "keyword" -> true,
      "phonetic_code" -> true),
    "kind_type" -> Seq("id" -> false, "kind" -> true),
    "link_type" -> Seq("id" -> false, "link" -> true),
    "movie_companies" -> Seq("id" -> false, "movie_id" -> false,
      "company_id" -> false, "company_type_id" -> false, "note" -> true),
    "movie_info" -> Seq("id" -> false, "movie_id" -> false,
      "info_type_id" -> false, "info" -> true, "note" -> true),
    "movie_info_idx" -> Seq("id" -> false, "movie_id" -> false,
      "info_type_id" -> false, "info" -> true, "note" -> true),
    "movie_keyword" -> Seq("id" -> false, "movie_id" -> false,
      "keyword_id" -> false),
    "movie_link" -> Seq("id" -> false, "movie_id" -> false,
      "linked_movie_id" -> false, "link_type_id" -> false),
    "name" -> Seq("id" -> false, "name" -> true, "imdb_index" -> true,
      "imdb_id" -> false, "gender" -> true, "name_pcode_cf" -> true,
      "name_pcode_nf" -> true, "surname_pcode" -> true, "md5sum" -> true),
    "person_info" -> Seq("id" -> false, "person_id" -> false,
      "info_type_id" -> false, "info" -> true, "note" -> true),
    "role_type" -> Seq("id" -> false, "role" -> true),
    "title" -> Seq("id" -> false, "title" -> true, "imdb_index" -> true,
      "kind_id" -> false, "production_year" -> false, "imdb_id" -> false,
      "phonetic_code" -> true, "episode_of_id" -> false,
      "season_nr" -> false, "episode_nr" -> false, "series_years" -> true,
      "md5sum" -> true))

  /** Create the 21 tables EMPTY in database `db` (dropped first). Plan-
    * only: the catalog entries exist so analysis resolves and statistics
    * attach; no file is ever written or read.
    */
  def createTables(spark: SparkSession, db: String = "jobench"): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(s"USE $db")
    schema.foreach { case (table, cols) =>
      val ddl = cols.map { case (c, isStr) =>
        s"$c ${if (isStr) "STRING" else "INT"}"
      }.mkString(", ")
      spark.sql(s"CREATE TABLE $table ($ddl) USING PARQUET")
    }
  }

  /** Convert the reference's stats file to [[StatsImport]] JSON.
    *
    * Mapping: `n_rows_` → table rowCount; `n_distinct_` → ndv;
    * `nullfrac_ × n_rows_` → nullCount; numeric equi-height bucket
    * boundaries → min/max + a Spark `Histogram` (bin i = [b_i, b_i+1],
    * per-bin ndv ≈ ndv/nbuckets — same equi-height semantics ANALYZE
    * writes under `spark.sql.statistics.histogram.enabled`). String
    * histograms carry no Spark analog (Spark histograms are numeric) —
    * those columns keep ndv/nullCount, which is what drives equality
    * selectivity (1/ndv) anyway. sizeInBytes is rows × a type-derived
    * row width, keeping relative table sizes right for broadcast choice.
    */
  def statsImportJson(statsPath: String): String = {
    val raw = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(statsPath)),
      java.nio.charset.StandardCharsets.UTF_8))

    val tables = schema.map { case (table, cols) =>
      var rows = BigInt(0)
      val colJsons = cols.flatMap { case (colName, isStr) =>
        raw \ (table + colName) match {
          case JObject(_) =>
            val e = raw \ (table + colName)
            val nRows = bigInt(e \ "n_rows_").getOrElse(BigInt(0))
            if (nRows > rows) rows = nRows
            val ndv = bigInt(e \ "n_distinct_")
            val nullCount = dbl(e \ "nullfrac_").map(f =>
              BigInt((f * nRows.toDouble).round))
            val numericBuckets = (e \ "hist_" \ "buckets_") match {
              case JArray(bs) if bs.nonEmpty && bs.forall(b => dblOf(b).isDefined) =>
                Some(bs.flatMap(dblOf))
              case _ => None
            }
            val fields = Seq(
              ndv.map(v => s""""ndv": $v"""),
              nullCount.map(v => s""""nullCount": $v"""),
              Some(s""""avgLen": ${if (isStr) 24 else 4}"""),
              Some(s""""maxLen": ${if (isStr) 255 else 4}""")) ++
              numericBuckets.toSeq.flatMap { bs =>
                val height = dbl(e \ "hist_" \ "depth_").getOrElse(
                  nRows.toDouble / math.max(1, bs.size - 1))
                val binNdv = math.max(1L,
                  ndv.map(_.toLong).getOrElse(bs.size.toLong) / math.max(1, bs.size - 1))
                val bins = bs.sliding(2).collect { case Seq(lo, hi) =>
                  s"""{"lo": $lo, "hi": $hi, "ndv": $binNdv}"""
                }.mkString(", ")
                Seq(
                  Some(s""""min": "${fmtNum(bs.head)}""""),
                  Some(s""""max": "${fmtNum(bs.last)}""""),
                  Some(s""""histogram": {"height": $height, "bins": [$bins]}"""))
              }
            Some(s""""$colName": {${fields.flatten.mkString(", ")}}""")
          case _ => None // column absent from the stats file: leave unstated
        }
      }
      val width = cols.map { case (_, isStr) => if (isStr) 24 else 4 }.sum
      val size = rows * width max BigInt(1)
      s""""$table": {"rowCount": $rows, "sizeInBytes": $size, "columns": {${colJsons.mkString(", ")}}}"""
    }
    s"""{"tables": {${tables.mkString(", ")}}}"""
  }

  /** Create tables and inject the reference stats — the full data-free
    * catalog setup. Returns the tables updated.
    */
  def register(spark: SparkSession,
               statsPath: String = "/root/reference/jobench/statistics/jobench_stats",
               db: String = "jobench"): Seq[String] = {
    createTables(spark, db)
    StatsImport.inject(spark, statsImportJson(statsPath))
  }

  /** Ints serialize without a fractional part so `CatalogColumnStat`
    * round-trips them as the column's INT type demands.
    */
  private def fmtNum(d: Double): String =
    if (d == d.floor && d.abs < 1e15) d.toLong.toString else d.toString

  private def dblOf(v: JValue): Option[Double] = v match {
    case JDouble(d) => Some(d)
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }
  private def dbl(v: JValue): Option[Double] = dblOf(v)
  private def bigInt(v: JValue): Option[BigInt] = v match {
    case JInt(i) => Some(i)
    case JLong(l) => Some(BigInt(l))
    case JDouble(d) => Some(BigInt(d.toLong))
    case JDecimal(d) => Some(d.toBigInt)
    case _ => None
  }
}
