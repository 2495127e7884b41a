package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch SQL file runner (reference `RunSQLFromFile`,
  * `/root/reference/qpmodel/Program.cs:128-178`).
  */
class SqlRunnerSpec extends AnyFunSuite {
  import TestSpark._

  test("splitStatements: quoted semicolons, comments, blanks") {
    val split = SqlRunner.splitStatements(
      """-- leading comment
        |SELECT 'a;b' AS s;   -- trailing comment
        |
        |SELECT 1 AS x
        |-- embedded comment line
        |FROM nation;
        |;
        |""".stripMargin)
    assert(split.length == 2, split)
    assert(split.head == "SELECT 'a;b' AS s")
    assert(split(1).startsWith("SELECT 1 AS x") && split(1).endsWith("FROM nation"))
  }

  test("splitStatements: '--' inside a string literal is content, not a comment") {
    val split = SqlRunner.splitStatements(
      "SELECT 'a--b' AS s; SELECT 2 AS y -- real comment\n;")
    assert(split == Seq("SELECT 'a--b' AS s", "SELECT 2 AS y"), split)
  }

  test("splitStatements: backslash-escaped quote stays inside the literal") {
    // Spark's default literal syntax: 'don\'t; stop' is ONE string — the
    // escaped quote must not close it, or the ; inside would split.
    val split = SqlRunner.splitStatements(
      """SELECT 'don\'t; stop' AS s; SELECT 2 AS y;""")
    assert(split == Seq("""SELECT 'don\'t; stop' AS s""", "SELECT 2 AS y"),
      split)
  }

  test("runFile executes a TPC-H style batch; failures don't abort") {
    graft.catalog.Tables.registerAll(spark, sfDir)
    val sql =
      """-- q6-style scan+filter aggregate
        |SELECT CAST(SUM(l_extendedprice * l_discount) AS DECIMAL(38, 4)) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1994-01-01'
        |  AND l_shipdate < DATE '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24;
        |
        |-- join + group by
        |SELECT n_name, COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name;
        |
        |SELECT broken FROM no_such_table;
        |
        |SELECT 'a;b' AS quoted_semi;
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_batch", ".sql")
    java.nio.file.Files.write(f, sql.getBytes("UTF-8"))
    val results = SqlRunner.runFile(spark, f.toString)
    assert(results.length == 4)
    assert(results(0)._3.isRight && results(0)._3.toOption.get.collect().length == 1)
    assert(results(1)._3.isRight && results(1)._3.toOption.get.collect().nonEmpty)
    assert(results(2)._3.isLeft, "missing table must surface as an error")
    assert(results(3)._3.toOption.get.collect().head.getString(0) == "a;b")
    java.nio.file.Files.delete(f)
  }

  test("repl: multi-line statements execute on ';', errors continue, exit quits") {
    graft.catalog.Tables.registerAll(spark, sfDir)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val lines = Iterator(
      "SELECT COUNT(*) AS n",      // statement spans two lines
      "FROM nation;",
      "SELECT broken FROM no_such_table;",
      "SELECT 'a;b' AS s;",        // quoted semicolon survives
      "exit",
      "SELECT 1;")                 // never reached
    SqlRunner.repl(spark, lines, out += _)
    assert(out.length == 3, out)
    assert(out(0).contains("25"), out(0))          // 25 nations
    assert(out(1).contains("ERROR"), out(1))
    assert(out(2).contains("a;b"), out(2))
  }

  test("repl --analyze prints the executed profile with operator row counts") {
    graft.catalog.Tables.registerAll(spark, sfDir)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    SqlRunner.repl(spark,
      Iterator("SELECT n_regionkey, COUNT(*) AS c FROM nation GROUP BY n_regionkey;"),
      out += _, analyze = true)
    assert(out.length == 1)
    val body = out.head
    assert(body.contains("== executed profile =="), body)
    // The final aggregate actually emitted the 5 region groups.
    assert(body.linesIterator.exists(l =>
      l.trim.startsWith("HashAggregate") && l.endsWith("rows=5")), body)
  }

  test("completeStatements: unterminated input is remainder, not a statement") {
    val (done, rest) = SqlRunner.completeStatements(
      "SELECT 1; SELECT 'x;y' AS s; SELECT 2")
    assert(done == Seq("SELECT 1", "SELECT 'x;y' AS s"))
    assert(rest.trim == "SELECT 2")
  }

  test("property: incremental splitting agrees with whole-text splitting") {
    // For ANY input (quotes, comments, stray semicolons, newlines), the
    // REPL's incremental completeStatements must produce exactly the
    // statements batch splitStatements produces: done ++ split(remainder)
    // == split(text). Raw ScalaCheck generators, fixed seeds (the
    // scalatest bridge isn't in the offline cache).
    import org.scalacheck.{Gen, rng}
    val token = Gen.oneOf("SELECT", "1", "a", ";", "'", "--", "\n", " ",
      "x;y", "'q;q'", "-", "abc", "\\", "\\'", "'a\\';'")
    val text = Gen.listOf(token).map(_.mkString)
    val samples = (1 to 200).flatMap(i =>
      text.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
    samples.foreach { t =>
      val (done, rest) = SqlRunner.completeStatements(t)
      assert(done ++ SqlRunner.splitStatements(rest) ==
        SqlRunner.splitStatements(t),
        s"mismatch on input: ${t.replace("\n", "\\n")}")
    }
  }

  test("the corpus' SQL-text queries run as a batch file (CI smoke)") {
    // Every QueryDef whose build is pure SQL text over the catalog is
    // exactly what the runner exists for; feed a representative slice
    // (the TPC-H headliners) through a real file.
    graft.catalog.Tables.registerAll(spark, sfDir)
    val stmts = Seq("tpch_q1", "tpch_q3", "tpch_q6", "tpch_q18")
      .flatMap(n => Queries.byName(n).sqlText)
    assert(stmts.length == 4, "expected SQL text for the TPC-H headliners")
    val f = java.nio.file.Files.createTempFile("graft_tpch", ".sql")
    java.nio.file.Files.write(f, stmts.mkString(";\n").getBytes("UTF-8"))
    val results = SqlRunner.runFile(spark, f.toString)
    assert(results.forall(_._3.isRight),
      results.filter(_._3.isLeft).map(r => (r._1, r._3)).mkString("; "))
    assert(results.forall(_._3.toOption.get.collect().nonEmpty))
    java.nio.file.Files.delete(f)
  }
}
