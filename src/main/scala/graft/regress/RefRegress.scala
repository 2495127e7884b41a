package graft.regress

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Run the reference's own regression suites verbatim: its `.sql` files,
  * on its own `.tbl` data, diffed against the result rows of its own
  * committed expect files (reference runner
  * `/root/reference/test/UnitTest.cs:295-355` `SQLQueryVerify`; expects
  * under `test/regress/expect/`). This is the strongest parity evidence
  * available — no schema adaptation, no oracle re-derivation: the rows
  * the reference engine printed are the rows this engine must produce.
  *
  * The expect files are `query text + plan dump + result rows`; only the
  * result-row tail is compared (the plan dump is the reference's
  * hand-rolled executor — architecture this engine deliberately does not
  * share). Row text is reproduced in the reference's own format
  * (`PhysicalExec.cs:166-177` Row.ToString: values joined with ",",
  * doubles as C# `"0.####"`, dates as invariant `M/d/yyyy 12:00:00 AM`),
  * so a diff is a byte diff first and a numeric-tolerance diff second
  * (double SUM is order-dependent in the final ulps; a 4-dp rounding can
  * straddle that, so literal-text mismatches fall back to a tokenwise
  * numeric compare).
  */
object RefRegress {

  // ---------------------------------------------------------------- DDL

  private val CreateTable =
    """(?is)create\s+table\s+(\w+)\s*\((.*)\)""".r

  /** Parse the reference's CREATE TABLE script (`tpch/sql_scripts/
    * tpch.sql`, `tpcds/sql_scripts/tpcds.sql`) into (table, schema)
    * pairs, with the reference's type semantics: INTEGER → int,
    * CHAR/VARCHAR → string, DATE → date, and DOUBLE / DECIMAL(p,s) →
    * double — qpmodel executes all fractional numerics as C# double
    * (`Expr.cs`/`PhysicalExec.cs` print via `double.ToString("0.####")`),
    * so loading decimals as decimal here would diverge from the goldens'
    * arithmetic, not match it.
    */
  def parseDdl(script: String): Seq[(String, StructType)] = {
    // strip -- comments, split statements on ';'
    val clean = script.linesIterator
      .map(l => l.indexOf("--") match {
        case -1 => l
        case i => l.substring(0, i)
      })
      .mkString("\n")
    clean.split(";").toSeq.flatMap { stmt =>
      CreateTable.findFirstMatchIn(stmt).map { m =>
        val name = m.group(1).toLowerCase
        val body = m.group(2)
        // split columns at paren-depth 0
        val cols = Seq.newBuilder[String]
        var depth = 0
        val cur = new StringBuilder
        body.foreach {
          case '(' => depth += 1; cur.append('(')
          case ')' => depth -= 1; cur.append(')')
          case ',' if depth == 0 => cols += cur.result(); cur.clear()
          case c => cur.append(c)
        }
        cols += cur.result()
        val fields = cols.result().map(_.trim).filter(_.nonEmpty)
          .filterNot(_.toLowerCase.startsWith("primary key"))
          .map { colDef =>
            val parts = colDef.split("\\s+", 2)
            StructField(parts(0).toLowerCase, sqlType(parts(1)))
          }
        name -> StructType(fields)
      }
    }
  }

  private def sqlType(t: String): DataType = {
    val lt = t.toLowerCase
    if (lt.startsWith("integer") || lt.startsWith("int")) IntegerType
    else if (lt.startsWith("bigint")) LongType
    else if (lt.startsWith("char") || lt.startsWith("varchar") ||
      lt.startsWith("time ") || lt == "time") StringType
    else if (lt.startsWith("date")) DateType
    else if (lt.startsWith("decimal") || lt.startsWith("numeric")) {
      // qpmodel's NumericType executes as C# decimal (exact), distinct
      // from DOUBLE — goldens preserve the declared scale.
      val Dims = """(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      Dims.findFirstMatchIn(lt) match {
        case Some(m) => DecimalType(m.group(1).toInt, m.group(2).toInt)
        case None => DecimalType(38, 18)
      }
    }
    else if (lt.startsWith("double") || lt.startsWith("float")) DoubleType
    else StringType
  }

  /** Register every table of a reference DDL script as a temp view over
    * its `.tbl` file (the reference's `|`-separated external format,
    * with the dbgen trailing `|` read into a dummy column and dropped —
    * `stmtDML.cs:245-285` COPY semantics). Missing `.tbl` files are
    * skipped (the reference ships data only for tables its suites use).
    */
  def loadTables(spark: SparkSession, ddlFile: String,
                 dataDir: String): Seq[String] = {
    val script = Files.readString(Paths.get(ddlFile))
    parseDdl(script).flatMap { case (name, schema) =>
      val path = s"$dataDir/$name.tbl"
      if (!Files.exists(Paths.get(path))) None
      else {
        val withTrail = StructType(
          schema.fields :+ StructField("__trail", StringType))
        // The reference reads .tbl via VB TextFieldParser, which TRIMS
        // field whitespace by default (Utils.cs:277-292) and maps "" to
        // NULL (PhysicalNode.cs:529) — mirror both or golden string
        // columns keep dbgen's leading/trailing spaces.
        val df = spark.read
          .option("delimiter", "|")
          .option("ignoreLeadingWhiteSpace", "true")
          .option("ignoreTrailingWhiteSpace", "true")
          .schema(withTrail)
          .csv(path)
          .drop("__trail")
        df.createOrReplaceTempView(name)
        Some(name)
      }
    }
  }

  /** Synthesize the two fixed-content TPC-DS dimensions whose `.tbl`
    * files the reference repo no longer ships (its LoadTables-tiny.sql
    * still COPYs them; its goldens were made when they existed). Both
    * are data-independent of scale factor and fully determined by the
    * public TPC-DS spec / dsdgen:
    *
    *  - `time_dim`: one row per second of day (86 400). sk = t_time;
    *    hour/minute/second by div/mod; shift / sub-shift / meal-time
    *    from the per-hour calendar distribution. The meal-hour sets are
    *    the only content the runnable goldens depend on (q71 joins on
    *    breakfast+dinner) — validated against the reference's own q71
    *    golden, whose hour column pins them.
    *  - `customer_demographics`: dsdgen's attribute cross-product;
    *    sk→attributes via bitmap_to_dist (successive mod/div in
    *    declaration order, gender fastest) — the formula is PROVEN by
    *    the goldens (q35's two rows carry full attribute tuples whose
    *    sks this formula reproduces exactly). The reference's tiny copy
    *    was a PREFIX of the full 1 920 800 rows: its goldens require
    *    sks 71288/74346 present but 488546+/632595/737408 absent
    *    (q7/q35 row bounds; q69's empty golden needs 488546 gone), so
    *    the row count sits in [74346, 488545] — 100 000 is used; every
    *    value in the interval yields identical results on all five
    *    cd goldens.
    *
    * `inventory` is the third unshipped table, but its quantities are
    * RNG-generated (not fixed content) — queries touching it cannot be
    * reproduced and are excluded with that reason where referenced.
    */
  def registerSyntheticTpcdsDims(spark: SparkSession): Unit = {
    spark.sql(
      """SELECT
        |  CAST(id AS INT) AS t_time_sk,
        |  CONCAT('TIME', LPAD(CAST(id AS STRING), 12, '0')) AS t_time_id,
        |  CAST(id AS INT) AS t_time,
        |  CAST(id DIV 3600 AS INT) AS t_hour,
        |  CAST((id % 3600) DIV 60 AS INT) AS t_minute,
        |  CAST(id % 60 AS INT) AS t_second,
        |  IF(id DIV 3600 < 12, 'AM', 'PM') AS t_am_pm,
        |  CASE WHEN id DIV 3600 BETWEEN 8 AND 15 THEN 'first'
        |       WHEN id DIV 3600 BETWEEN 16 AND 23 THEN 'second'
        |       ELSE 'third' END AS t_shift,
        |  CASE WHEN id DIV 3600 BETWEEN 6 AND 11 THEN 'morning'
        |       WHEN id DIV 3600 BETWEEN 12 AND 17 THEN 'afternoon'
        |       WHEN id DIV 3600 >= 18 THEN 'evening'
        |       ELSE 'night' END AS t_sub_shift,
        |  CASE WHEN id DIV 3600 BETWEEN 6 AND 9 THEN 'breakfast'
        |       WHEN id DIV 3600 BETWEEN 11 AND 14 THEN 'lunch'
        |       WHEN id DIV 3600 BETWEEN 17 AND 19 THEN 'dinner'
        |       ELSE NULL END AS t_meal_time
        |FROM range(86400)""".stripMargin)
      .createOrReplaceTempView("time_dim")
    spark.sql(
      """SELECT
        |  CAST(id + 1 AS INT) AS cd_demo_sk,
        |  ELT(CAST(id % 2 AS INT) + 1, 'M', 'F') AS cd_gender,
        |  ELT(CAST((id DIV 2) % 5 AS INT) + 1,
        |      'M', 'S', 'D', 'W', 'U') AS cd_marital_status,
        |  ELT(CAST((id DIV 10) % 7 AS INT) + 1,
        |      'Primary', 'Secondary', 'College', '2 yr Degree',
        |      '4 yr Degree', 'Advanced Degree', 'Unknown')
        |    AS cd_education_status,
        |  CAST(((id DIV 70) % 20 + 1) * 500 AS INT)
        |    AS cd_purchase_estimate,
        |  ELT(CAST((id DIV 1400) % 4 AS INT) + 1,
        |      'Low Risk', 'High Risk', 'Good', 'Unknown')
        |    AS cd_credit_rating,
        |  CAST((id DIV 5600) % 7 AS INT) AS cd_dep_count,
        |  CAST((id DIV 39200) % 7 AS INT) AS cd_dep_employed_count,
        |  CAST((id DIV 274400) % 7 AS INT) AS cd_dep_college_count
        |FROM range(100000)""".stripMargin)
      .createOrReplaceTempView("customer_demographics")
  }

  // ------------------------------------------------------- expect files

  /** The result-row tail of a reference expect file: trailing non-empty
    * lines below the plan dump (plan lines are indented or start with a
    * node/“Total cost” marker; result rows never are — qpmodel prints
    * them last, one comma-joined line per row, `UnitTest.cs` full mode).
    */
  def expectedRows(expectFile: String): Seq[String] = {
    val lines = new String(
      Files.readAllBytes(Paths.get(expectFile)), StandardCharsets.UTF_8)
      .replace("\r\n", "\n").split("\n", -1).toSeq
    val trimmed = lines.reverse.dropWhile(_.trim.isEmpty)
    def isPlanLine(l: String): Boolean =
      l.startsWith(" ") || l.startsWith("\t") || l.startsWith("->") ||
        l.startsWith("Physic") || l.startsWith("Total cost") ||
        l.startsWith("Explain")
    trimmed.takeWhile(l => l.nonEmpty && !isPlanLine(l)).reverse
  }

  // -------------------------------------------------------- formatting

  private val DateFmt = DateTimeFormatter.ofPattern("M/d/yyyy")

  /** C# `double.ToString("0.####")`: round to 4 decimals on the exact
    * binary value (HALF_EVEN = .NET Core correct rounding), strip
    * trailing zeros, no scientific notation, bare `0` for zero.
    */
  def fmtDouble(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "∞" else "-∞"
    val bd = new JBigDecimal(d).setScale(4, RoundingMode.HALF_EVEN)
      .stripTrailingZeros()
    val s = bd.toPlainString
    if (s == "-0") "0" else s
  }

  def fmtCell(v: Any): String = v match {
    case null => ""
    case d: Double => fmtDouble(d)
    case f: Float => fmtDouble(f.toDouble)
    // DECIMAL columns (TPC-DS) execute as C# decimal in the reference
    // (PhysicalNode.cs:545 decimal.Parse; Row.ToString's 0.#### applies
    // only to double), so scale is PRESERVED in goldens ("301.10") —
    // print the plain scaled value, never the double format. Division
    // scales differ by engine (C# 28-digit vs Spark's bounded scale);
    // the tokenwise numeric fallback absorbs that.
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: scala.math.BigDecimal => bd.underlying.toPlainString
    case dt: java.sql.Date =>
      s"${dt.toLocalDate.format(DateFmt)} 12:00:00 AM"
    case dt: java.time.LocalDate => s"${dt.format(DateFmt)} 12:00:00 AM"
    case ts: java.sql.Timestamp =>
      val lt = ts.toLocalDateTime
      val h24 = lt.getHour
      val ampm = if (h24 < 12) "AM" else "PM"
      val h = { val x = h24 % 12; if (x == 0) 12 else x }
      f"${lt.getMonthValue}/${lt.getDayOfMonth}/${lt.getYear} " +
        f"$h:${lt.getMinute}%02d:${lt.getSecond}%02d $ampm"
    case b: Boolean => if (b) "True" else "False"
    case other => other.toString
  }

  def fmtRow(r: Row): String =
    (0 until r.length).map(i => fmtCell(r.get(i))).mkString(",")

  /** Execute and render in the reference's row format. */
  def resultLines(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(fmtRow)

  // -------------------------------------------------------- comparison

  /** Tokenwise fuzzy line equality: literal characters must match
    * exactly; maximal numeric runs (digits with optional sign/decimal
    * point) are parsed from BOTH lines in lockstep and compared with a
    * tolerance absorbing double-sum order dependence plus 4-dp rounding
    * straddle. String content containing digits (phones, ids) parses to
    * the same numbers on both sides, so the walk needs no quoting
    * knowledge — which matters because reference rows are comma-joined
    * with UNquoted strings that may themselves contain commas.
    */
  def fuzzyLineEq(a: String, b: String): Boolean = {
    def numStart(s: String, i: Int): Boolean =
      i < s.length && (s.charAt(i).isDigit ||
        ((s.charAt(i) == '-' || s.charAt(i) == '+') &&
          i + 1 < s.length && s.charAt(i + 1).isDigit))
    def numEnd(s: String, i: Int): Int = {
      var j = if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+'))
        i + 1 else i
      while (j < s.length && s.charAt(j).isDigit) j += 1
      if (j < s.length && s.charAt(j) == '.' &&
        j + 1 < s.length && s.charAt(j + 1).isDigit) {
        j += 1
        while (j < s.length && s.charAt(j).isDigit) j += 1
      }
      j
    }
    var i = 0
    var j = 0
    while (i < a.length || j < b.length) {
      val na = numStart(a, i)
      val nb = numStart(b, j)
      if (na && nb) {
        val (ia, ib) = (numEnd(a, i), numEnd(b, j))
        val (va, vb) = (a.substring(i, ia).toDouble,
          b.substring(j, ib).toDouble)
        val tol = math.max(1.5e-4, 1e-9 * math.max(math.abs(va),
          math.abs(vb)))
        if (math.abs(va - vb) > tol) return false
        i = ia; j = ib
      } else if (i < a.length && j < b.length &&
        a.charAt(i) == b.charAt(j)) {
        i += 1; j += 1
      } else return false
    }
    true
  }

  sealed trait Verdict
  case object ExactOrder extends Verdict
  case object TieOrder extends Verdict
  final case class Mismatch(detail: String) extends Verdict

  /** Diff rendered result lines against the golden tail. Ordered compare
    * first (most reference queries carry a full ORDER BY); on failure, a
    * greedy fuzzy bipartite match — ORDER BY ties are ordered
    * differently by different engines with equal validity, and queries
    * without ORDER BY (reference q15 comments its out) have no defined
    * order at all. `TieOrder` is still a pass: same multiset of rows.
    */
  def diff(expected: Seq[String], actual0: Seq[String]): Verdict = {
    // A row whose every column is NULL renders as an empty line (C#
    // string.Join over nulls), indistinguishable in the golden file from
    // trailing padding — the tail parser drops blank lines, so the same
    // normalization applies to the actual side (goldens q17/q19: a
    // global aggregate whose input is empty at this scale).
    val actual = actual0.filterNot(_.isEmpty)
    if (expected.size != actual.size)
      return Mismatch(s"row count: expected ${expected.size}, " +
        s"got ${actual.size}\nexpected head: " +
        s"${expected.take(3).mkString(" | ")}\nactual head:   " +
        s"${actual.take(3).mkString(" | ")}")
    val inOrder = expected.zip(actual).forall { case (e, a) =>
      e == a || fuzzyLineEq(e, a) }
    if (inOrder) return ExactOrder
    // greedy bipartite on the multiset
    val used = new Array[Boolean](actual.size)
    val unmatched = expected.filter { e =>
      val hit = actual.indices.find(k => !used(k) &&
        (e == actual(k) || fuzzyLineEq(e, actual(k))))
      hit match {
        case Some(k) => used(k) = true; false
        case None => true
      }
    }
    if (unmatched.isEmpty) TieOrder
    else Mismatch(s"${unmatched.size} golden rows unmatched; first: " +
      s"${unmatched.head}\nfirst surplus actual: " +
      s"${actual.zipWithIndex.collectFirst { case (a, k) if !used(k) => a }
        .getOrElse("<none>")}")
  }

  // -------------------------------------------- qpmodel dialect quirks

  private val IntervalYm = """(?i)interval\s+'(\d+)'\s+(year|month)s?""".r
  private val DistinctAgg =
    """(?i)\b(count|sum|avg|min|max)\s*\(\s*distinct\s+""".r

  /** Rewrite a reference query into qpmodel's EXECUTION semantics, so the
    * reference's own goldens are reproducible byte-for-byte. The engine
    * itself keeps standard semantics (real calendar math, honored
    * DISTINCT, exact decimal literals — each oracle-tested against
    * DuckDB in the main corpus); these rewrites exist only in the
    * regress runner, because the goldens were produced by an engine
    * with three documented non-standard behaviors:
    *
    *  - interval 'N' month/year = 30N/365N DAYS
    *    (`Expr.cs:1261-1266`, the reference's own `// FIXME`): golden
    *    q04/q10/q15 date windows end at +90 days, not +3 calendar
    *    months.
    *  - DISTINCT inside an aggregate is parsed and silently DROPPED
    *    (no occurrence of `distinct` anywhere in `ExprFunc.cs`; the
    *    reference's tpcds runner excludes q6 with "distinct not
    *    supported, causing wrong result"): golden q16 supplier_cnt is
    *    the PLAIN count (4 partsupp rows/part), not the distinct
    *    supplier count DuckDB computes (1–2 at this scale).
    *  - fractional numeric literals are C# DOUBLES (`Expr.cs:1207`; the
    *    grammar has no decimal type), so `.06 - 0.01` is the binary
    *    0.049999…, which EXCLUDES l_discount = 0.07 rows from golden
    *    q06 — Spark's exact DECIMAL literals would include them.
    */
  private val BareDays = """([+-])\s*(\d+)\s+days?\b""".r
  private val AvgCall = """(?i)\bavg\s*\(\s*([\w.]+)\s*\)""".r

  /** [[qpmodelize]] plus avg() semantics keyed by column type — needed
    * only for the TPC-DS goldens, where decimal columns exist. qpmodel's
    * avg is `dynamic sum / long count` (ExprFunc.cs:624-644): over C#
    * decimal that division is EXACT to 28 digits, and over ints it
    * TRUNCATES (integer division). Spark's avg over decimal(p,s) yields
    * scale s+4 (6dp for sales columns) — enough to print within the
    * numeric-diff tolerance, but not enough when a query COMPARES
    * against the avg (goldens q1/q65 flip a boundary row on the 6dp
    * truncation), so decimal/unknown args are widened to
    * DECIMAL(38,20) first and int columns get the truncating form.
    */
  def qpmodelize(sql: String, intCols: Set[String],
                 doubleCols: Set[String]): String = {
    val avgFixed = AvgCall.replaceAllIn(qpmodelize(sql), m => {
      val arg = m.group(1)
      val base = arg.substring(arg.lastIndexOf('.') + 1).toLowerCase
      if (doubleCols.contains(base)) m.matched // double avg is already C#
      else if (intCols.contains(base)) s"(sum($arg) div count($arg))"
      else s"avg(CAST($arg AS DECIMAL(38,20)))"
    })
    avgFixed
  }

  /** The int / double column-name sets of a loaded DDL script, for
    * [[qpmodelize]]'s type-keyed avg rewrite.
    */
  def columnTypeSets(ddlFile: String): (Set[String], Set[String]) = {
    val schemas = parseDdl(Files.readString(Paths.get(ddlFile)))
    val fields = schemas.flatMap(_._2.fields)
    (fields.collect { case f if f.dataType == IntegerType ||
      f.dataType == LongType => f.name }.toSet,
      fields.collect { case f if f.dataType == DoubleType => f.name }.toSet)
  }

  def qpmodelize(sql: String): String = {
    val ym = IntervalYm.replaceAllIn(sql, m => {
      val n = m.group(1).toInt
      val days = if (m.group(2).equalsIgnoreCase("year")) n * 365 else n * 30
      s"interval '$days' day"
    })
    // TPC-DS templates' `date + 30 days` / `- 30 days` (SQLite-grammar
    // date_plus, SQLParser.cs:130) → standard interval arithmetic. Runs
    // after the year/month rewrite, whose output (`interval 'N' day`)
    // cannot re-match this pattern (the digits there are quoted).
    val days = BareDays.replaceAllIn(ym,
      m => s"${m.group(1)} interval '${m.group(2)}' day")
    val noDistinct = DistinctAgg.replaceAllIn(days, m => s"${m.group(1)}(")
    doubleQuotedIdents(doubleLiterals(noDistinct))
  }

  /** `"excess discount amount"` → backticked identifier: the reference's
    * SQLite grammar treats double quotes as identifier quoting; Spark
    * reserves them for strings unless ANSI double-quoted identifiers are
    * on — rewriting keeps the session conf untouched. Quote-aware
    * (double quotes inside single-quoted strings are content).
    */
  private def doubleQuotedIdents(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var inString = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inString) {
        out.append(c)
        if (c == '\'') inString = false
        i += 1
      } else if (c == '\'') {
        out.append(c); inString = true; i += 1
      } else if (c == '"') {
        val end = sql.indexOf('"', i + 1)
        if (end < 0) { out.append(c); i += 1 }
        else {
          out.append('`').append(sql.substring(i + 1, end)).append('`')
          i = end + 1
        }
      } else {
        out.append(c); i += 1
      }
    }
    out.result()
  }

  /** `12.34` → `CAST(12.34 AS DOUBLE)` outside string literals (qpmodel
    * fractional-literal semantics). Quote-aware single pass; skips
    * already-qualified tokens (preceded/followed by a word char or '.').
    */
  private def doubleLiterals(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var inQuote = false
    val Lit = """^(\d+\.\d+)""".r
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQuote) {
        out.append(c)
        if (c == '\'') inQuote = false
        i += 1
      } else if (c == '\'') {
        out.append(c); inQuote = true; i += 1
      } else if (c.isDigit &&
        (i == 0 || (!sql.charAt(i - 1).isLetterOrDigit &&
          sql.charAt(i - 1) != '_' && sql.charAt(i - 1) != '.'))) {
        Lit.findFirstIn(sql.substring(i)) match {
          case Some(lit)
            if i + lit.length >= sql.length ||
              (!sql.charAt(i + lit.length).isLetterOrDigit &&
                sql.charAt(i + lit.length) != '.') =>
            out.append(s"CAST($lit AS DOUBLE)")
            i += lit.length
          case _ =>
            out.append(c); i += 1
        }
      } else {
        out.append(c); i += 1
      }
    }
    out.result()
  }

  /** Read a reference query file. Comment stripping is left to
    * [[graft.SqlRunner.splitStatements]] (the sole consumer), whose scan
    * is quote-aware — a naive per-line `--` cut here would corrupt a
    * string literal containing a double dash.
    */
  def querySql(file: String): String =
    Files.readString(Paths.get(file)).trim.stripSuffix(";")
}
