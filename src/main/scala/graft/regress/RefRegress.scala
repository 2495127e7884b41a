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
    else if (lt.startsWith("decimal") || lt.startsWith("numeric") ||
      lt.startsWith("double") || lt.startsWith("float")) DoubleType
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
    case bd: java.math.BigDecimal => fmtDouble(bd.doubleValue())
    case bd: scala.math.BigDecimal => fmtDouble(bd.doubleValue)
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
  def qpmodelize(sql: String): String = {
    val ym = IntervalYm.replaceAllIn(sql, m => {
      val n = m.group(1).toInt
      val days = if (m.group(2).equalsIgnoreCase("year")) n * 365 else n * 30
      s"interval '$days' day"
    })
    val noDistinct = DistinctAgg.replaceAllIn(ym, m => s"${m.group(1)}(")
    doubleLiterals(noDistinct)
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

  /** Read a reference query file, stripped of `--` comments (qpmodel's
    * own reader does the same before parsing).
    */
  def querySql(file: String): String =
    Files.readString(Paths.get(file)).linesIterator
      .map(l => l.indexOf("--") match {
        case -1 => l
        case i => l.substring(0, i)
      })
      .mkString("\n").trim.stripSuffix(";")
}
