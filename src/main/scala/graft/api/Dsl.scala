package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.catalog.Tables

/** DataFrame-style DSL façade with the reference's surface
  * (`/root/reference/qpmodel/stmt.cs:957-1049`: `SQLContext.Read`,
  * `DataSet.filter/join/select/show` over string expressions) — a thin
  * veneer over Spark's own DataFrame API, which is the real engine; the
  * strings go through Catalyst's expression parser so every optimization
  * (pushdown, pruning, join selection) applies unchanged.
  */
final class GraftContext(val spark: SparkSession, val dataDir: String) {

  /** `SQLContext.Read(t)` analog. */
  def read(table: String): DataSet = {
    Tables.registerAll(spark, dataDir)
    new DataSet(spark.table(table))
  }

  /** Scalar UDF registration (`ExternalFunctions.Register`,
    * `/root/reference/qpmodel/ExprFunc.cs:42-76`; README sqroot example).
    * Prefer native Catalyst expressions (graft.functions) where codegen
    * matters — UDFs are the compatibility path.
    */
  def register1[A, R](name: String, f: A => R)(
      implicit i: reflect.runtime.universe.TypeTag[A],
      o: reflect.runtime.universe.TypeTag[R]): Unit =
    spark.udf.register(name, f)

  def register2[A, B, R](name: String, f: (A, B) => R)(
      implicit a: reflect.runtime.universe.TypeTag[A],
      b: reflect.runtime.universe.TypeTag[B],
      o: reflect.runtime.universe.TypeTag[R]): Unit =
    spark.udf.register(name, f)

  /** Three-argument form — the reference registers scalar UDFs up to
    * arity 3 (`ExprFunc.cs:42-76` Register<T1,T2,T3,TResult>); this
    * closes that arity surface.
    */
  def register3[A, B, C, R](name: String, f: (A, B, C) => R)(
      implicit a: reflect.runtime.universe.TypeTag[A],
      b: reflect.runtime.universe.TypeTag[B],
      c: reflect.runtime.universe.TypeTag[C],
      o: reflect.runtime.universe.TypeTag[R]): Unit =
    spark.udf.register(name, f)

  def sql(text: String): DataFrame = {
    Tables.registerAll(spark, dataDir)
    spark.sql(text)
  }
}

object DataSet {
  /** Split a comma-separated expression list at TOP level only: commas
    * inside parentheses or SQL string literals belong to a function call
    * (`substr(c_name, 1, 2)`) or a literal (`'a,b'`), not the list — a
    * naive `split(",")` shatters them into bogus expressions. Each piece
    * still goes through Catalyst's expression parser, which rejects
    * anything malformed loudly.
    */
  private[api] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur += c
        // '' is an escaped quote inside a SQL string literal
        if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
          cur += '\''; i += 1
        } else if (c == '\'') inStr = false
      } else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }
}

/** `DataSet` analog: string-expression relational verbs. */
final class DataSet(val df: DataFrame) {
  def filter(cond: String): DataSet = new DataSet(df.filter(expr(cond)))
  def join(other: DataSet, cond: String): DataSet =
    new DataSet(df.join(other.df, expr(cond)))
  def join(other: DataSet, cond: String, joinType: String): DataSet =
    new DataSet(df.join(other.df, expr(cond), joinType))
  def select(cols: String*): DataSet = new DataSet(df.selectExpr(cols: _*))
  def groupBy(keys: String, aggs: String*): DataSet =
    new DataSet(df.groupBy(DataSet.splitTopLevel(keys).map(expr): _*)
      .agg(expr(aggs.head), aggs.tail.map(expr): _*))
  def orderBy(cols: String*): DataSet =
    // expr("c DESC") would parse DESC as a column alias, silently sorting
    // ascending — strip the direction suffix and apply it as a SortOrder
    new DataSet(df.orderBy(cols.map { c =>
      val t = c.trim
      val upper = t.toUpperCase
      if (upper.endsWith(" DESC")) expr(t.dropRight(5)).desc
      else if (upper.endsWith(" ASC")) expr(t.dropRight(4)).asc
      else expr(t)
    }: _*))
  def limit(n: Int): DataSet = new DataSet(df.limit(n))
  def show(): Unit = df.show()

  /** Reference `EXPLAIN [ANALYZE|FULL]` analog (`ExplainMode`,
    * `/root/reference/qpmodel/Plan.cs:125`, REPL surface
    * `Program.cs:180-351`): the plan text for a mode, returned rather
    * than printed so callers can inspect it. Modes are Catalyst's:
    * "simple" (physical), "extended" (all phases — the reference's
    * FULL), "cost" (logical with CBO statistics — the reference's
    * ANALYZE-style cost view), "codegen", "formatted".
    */
  def explain(mode: String = "formatted"): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))

  def toDF: DataFrame = df
}
