package graft.queries

import graft.QueryDef
import graft.QueryDef.{sameSql, sqlDef}

/** Scalar expression battery — SURVEY §2.7 function set (reference
  * `/root/reference/qpmodel/ExprFunc.cs` throughout). Each query projects
  * the expression results over a deterministic slice of a table; row
  * values are compared against DuckDB, so semantics (3VL, LIKE, CASE,
  * CAST, date arithmetic) must match standard SQL.
  *
  * Note: reference quirks (OR-null-as-false ExprFunc.cs:1148-1156,
  * substring end-arg ExprFunc.cs:226-236, 2-arg coalesce) are deliberately
  * NOT replicated — standard SQL is the declared contract (SURVEY §7.4).
  */
object ExprQueries {

  /** Arithmetic: + - * / % unary minus, double and integer paths. */
  val arith: QueryDef = sameSql("expr_arith",
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity * 2 + 1 AS q2,
      |  -l_quantity AS neg_q,
      |  l_extendedprice / (l_quantity + 1) AS unit,
      |  l_quantity % 7 AS mod7,
      |  l_linenumber * 10 - 3 AS ln10,
      |  (l_extendedprice - l_quantity) * l_discount AS mixed
      |FROM lineitem WHERE l_orderkey <= 60""".stripMargin)

  /** Comparison + boolean operators producing boolean columns. */
  val compareBool: QueryDef = sameSql("expr_compare_bool",
    """SELECT o_orderkey,
      |  o_totalprice > 200000 AS gt,
      |  o_totalprice <= 200000 AS le,
      |  o_orderstatus = 'F' AS eq,
      |  o_orderstatus <> 'F' AS ne,
      |  (o_totalprice > 200000 AND o_orderstatus = 'F') AS conj,
      |  (o_totalprice > 450000 OR o_orderpriority = '1-URGENT') AS disj,
      |  NOT (o_orderkey % 2 = 0) AS neg
      |FROM orders WHERE o_orderkey <= 200""".stripMargin)

  /** NULL tests + n-ary coalesce + NULLIF with 3VL comparison. */
  val nullTests: QueryDef = sameSql("expr_null",
    """SELECT event_id,
      |  NULLIF(event_type, 'view') AS nt,
      |  NULLIF(event_type, 'view') IS NULL AS is_n,
      |  NULLIF(event_type, 'view') IS NOT NULL AS is_nn,
      |  COALESCE(NULLIF(event_type, 'view'), 'fb', 'xx') AS co,
      |  (NULLIF(value, value) > 100) IS NULL AS cmp_null
      |FROM events WHERE event_id <= 100""".stripMargin)

  /** LIKE / NOT LIKE with % and _ wildcards. */
  val like: QueryDef = sameSql("expr_like",
    """SELECT p_partkey, p_type,
      |  p_type LIKE 'P%' AS is_promo,
      |  p_name LIKE '%a%' AS has_a,
      |  p_brand LIKE 'Brand#_' AS single_digit,
      |  p_type NOT LIKE '%AR%' AS no_ar
      |FROM part WHERE p_partkey <= 100""".stripMargin)

  /** IN-list incl. a non-constant member (reference InListExpr,
    * ExprSubquery.cs:302-355).
    */
  val inList: QueryDef = sameSql("expr_in_list",
    """SELECT o_orderkey, o_orderpriority
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o_orderkey IN (o_orderkey, 0)
      |  AND o_orderkey <= 500""".stripMargin)

  /** BETWEEN on numbers and dates (parser-expanded in reference,
    * SQLParser.cs:164-169).
    */
  val between: QueryDef = sameSql("expr_between",
    """SELECT l_orderkey, l_linenumber
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 12
      |  AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
      |  AND l_orderkey <= 2000""".stripMargin)

  /** CASE: simple form + searched form + missing ELSE → NULL. */
  val caseExpr: QueryDef = sameSql("expr_case",
    """SELECT o_orderkey,
      |  CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
      |       ELSE 'other' END AS st,
      |  CASE WHEN o_totalprice > 300000 THEN 'big'
      |       WHEN o_totalprice > 100000 THEN 'mid'
      |       ELSE 'small' END AS sz,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END AS urgent_or_null
      |FROM orders WHERE o_orderkey <= 300""".stripMargin)

  /** CAST matrix: string↔int, timestamp→date, int→double (the reference
    * implements only string→datetime + identity, ExprFunc.cs:1163-1184 —
    * full matrix is Spark-native). Avoids double→string / double→int whose
    * round-vs-truncate behavior differs across engines.
    */
  val cast: QueryDef = sqlDef("expr_cast",
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS STRING) AS key_str,
      |  CAST('42' AS INT) + o_orderkey AS int_from_str,
      |  CAST(o_orderdate AS DATE) AS d,
      |  CAST(o_orderkey AS DOUBLE) / 2 AS dbl
      |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  CAST('42' AS INT) + o_orderkey AS int_from_str,
      |  CAST(o_orderdate AS DATE) AS d,
      |  CAST(o_orderkey AS DOUBLE) / 2 AS dbl
      |FROM orders WHERE o_orderkey <= 100""".stripMargin)

  /** String functions: substring/upper/lower/length/concat/||/repeat/
    * trim/replace (reference ExprFunc.cs:226-280; standard substring
    * semantics, not the reference's end-position quirk).
    */
  val stringFuncs: QueryDef = sameSql("expr_string",
    """SELECT p_partkey,
      |  UPPER(p_name) AS up, LOWER(p_brand) AS lo,
      |  SUBSTRING(p_type, 1, 3) AS sub3,
      |  LENGTH(p_name) AS len,
      |  CONCAT(p_brand, '-', p_type) AS cc,
      |  p_brand || ':' || p_type AS cc2,
      |  REPEAT(SUBSTRING(p_brand, 1, 2), 3) AS rep,
      |  TRIM('  ' || p_brand || ' ') AS tr,
      |  REPLACE(p_type, 'A', '@') AS repl
      |FROM part WHERE p_partkey <= 100""".stripMargin)

  /** Math functions: abs/round/floor/ceil/sqrt/power/mod (reference
    * ExprFunc.cs:282-336). round() applied at 4 dp on 2-dp data is exact
    * on both engines (no half-way cases).
    */
  val mathFuncs: QueryDef = sameSql("expr_math",
    """SELECT l_orderkey, l_linenumber,
      |  ABS(l_quantity - 25) AS dist25,
      |  ROUND(l_extendedprice, 4) AS r4,
      |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
      |  CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
      |  SQRT(l_quantity) AS sq,
      |  CAST(ROUND(POWER(l_quantity, 2)) AS BIGINT) AS p2,
      |  MOD(l_linenumber, 3) AS m3
      |FROM lineitem WHERE l_orderkey <= 60""".stripMargin)

  /** Date/interval arithmetic: year/month/day extraction, interval
    * add/subtract, date_trunc (reference date functions ExprFunc.cs:360-386
    * + interval literals Expr.cs:1241-1275 — real calendar arithmetic here,
    * not the reference's 30/365-day approximation).
    */
  val dateFuncs: QueryDef = sameSql("expr_date",
    """SELECT o_orderkey,
      |  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS mo, DAY(o_orderdate) AS d,
      |  o_orderdate + INTERVAL '7' DAY AS plus7,
      |  o_orderdate - INTERVAL '1' MONTH AS minus1m,
      |  CAST(DATE_TRUNC('MONTH', o_orderdate) AS TIMESTAMP) AS mstart,
      |  EXTRACT(QUARTER FROM o_orderdate) AS q
      |FROM orders WHERE o_orderkey <= 200""".stripMargin)

  /** Deterministic hashing: md5 (engine-portable, unlike hash()). The
    * reference exposes `hash(x)` (ExprFunc.cs:388-401); md5 is the
    * cross-engine-verifiable analog.
    */
  val hashMd5: QueryDef = sameSql("expr_hash_md5",
    """SELECT DISTINCT l_returnflag AS f, MD5(l_returnflag) AS h
      |FROM lineitem""".stripMargin)

  /** Standard-SQL 3VL truth table — deliberately NOT the reference's
    * NULL-as-false OR (ExprFunc.cs:1148-1156); the declared contract is
    * standard SQL (SURVEY §7.4), which DuckDB verifies here.
    */
  val threeVL: QueryDef = sameSql("conformance_3vl",
    """SELECT
      |  (NULL AND FALSE) AS and_nf,
      |  (NULL AND TRUE) IS NULL AS and_nt_is_null,
      |  (NULL OR TRUE) AS or_nt,
      |  (NULL OR FALSE) IS NULL AS or_nf_is_null,
      |  (NOT NULL) IS NULL AS not_null_is_null""".stripMargin)

  /** Explicit NULLS LAST ordering made observable through LIMIT. */
  val sortNullsLast: QueryDef = sameSql("sort_nulls_last",
    """SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st
      |FROM orders
      |ORDER BY st NULLS LAST, o_orderkey
      |LIMIT 20""".stripMargin)

  /** Extended string battery: pad/split/array indexing (dialect: Spark
    * element_at vs DuckDB 1-based subscript; split is regex in Spark,
    * literal in string_split).
    */
  val stringFuncs2: QueryDef = sqlDef("expr_string2",
    """SELECT p_partkey,
      |  LPAD(p_brand, 12, '*') AS lp,
      |  RPAD(p_brand, 12, '-') AS rp,
      |  ELEMENT_AT(SPLIT(p_brand, '#'), 1) AS brand_word,
      |  ELEMENT_AT(SPLIT(p_brand, '#'), 2) AS brand_num,
      |  REVERSE(p_type) AS rev,
      |  INSTR(p_name, 'a') AS pos_a
      |FROM part WHERE p_partkey <= 100""".stripMargin,
    """SELECT p_partkey,
      |  LPAD(p_brand, 12, '*') AS lp,
      |  RPAD(p_brand, 12, '-') AS rp,
      |  string_split(p_brand, '#')[1] AS brand_word,
      |  string_split(p_brand, '#')[2] AS brand_num,
      |  REVERSE(p_type) AS rev,
      |  INSTR(p_name, 'a') AS pos_a
      |FROM part WHERE p_partkey <= 100""".stripMargin)

  /** Extended math battery: ln/exp/log10/sign/greatest/least. libm
    * results (ln/log10/exp) can drift by an ulp between JVM and C
    * libraries, and the gate hashes raw values — so transcendentals are
    * emitted as scale-6 fixed-point BIGINTs (drift 1e-15 only flips the
    * encoding within ~1e-9 of a half-way point); sign is cast to INT
    * (Spark returns DOUBLE, DuckDB the input type).
    */
  val mathFuncs2: QueryDef = sameSql("expr_math2",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ROUND(LN(l_extendedprice) * 1000000) AS BIGINT) AS lnp_e6,
      |  CAST(ROUND(LOG10(l_extendedprice) * 1000000) AS BIGINT) AS lg_e6,
      |  CAST(ROUND(EXP(l_discount) * 1000000) AS BIGINT) AS ex_e6,
      |  CAST(SIGN(l_quantity - 25) AS INT) AS sg,
      |  GREATEST(l_quantity, l_discount * 100, CAST(10.0 AS DOUBLE)) AS gr,
      |  LEAST(l_quantity, l_tax * 100) AS ls
      |FROM lineitem WHERE l_orderkey <= 60""".stripMargin)

  /** Second date battery: day arithmetic, month add, month boundaries
    * (dialect: Spark DATEDIFF(end, start) vs DuckDB date_diff('day', ...);
    * ADD_MONTHS vs + INTERVAL).
    */
  val dateFuncs2: QueryDef = sqlDef("expr_date2",
    """SELECT o_orderkey,
      |  DATEDIFF(DATE '2000-01-01', o_orderdate) AS days_to_y2k,
      |  CAST(ADD_MONTHS(o_orderdate, 3) AS TIMESTAMP) AS plus3m,
      |  CAST(LAST_DAY(o_orderdate) AS DATE) AS month_end
      |FROM orders WHERE o_orderkey <= 150""".stripMargin,
    """SELECT o_orderkey,
      |  date_diff('day', o_orderdate, DATE '2000-01-01') AS days_to_y2k,
      |  o_orderdate + INTERVAL '3' MONTH AS plus3m,
      |  CAST(last_day(o_orderdate) AS DATE) AS month_end
      |FROM orders WHERE o_orderkey <= 150""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    arith, compareBool, nullTests, like, inList, between, caseExpr, cast,
    stringFuncs, mathFuncs, dateFuncs, dateFuncs2, hashMd5, threeVL,
    sortNullsLast, stringFuncs2, mathFuncs2)
}
