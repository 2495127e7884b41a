package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CorrelationRepair

/** Property coverage for the r15 catalog-resolution parsing layer of
  * [[graft.plans.CorrelationRepair]] — the pieces that decide which
  * identifiers a rewrite may claim. The r14 review lesson (a silent
  * varint drop OUTSIDE the generator's original range) applies here
  * doubly: these scanners face arbitrary user SQL, so the generators
  * cover quoted literals containing keywords/parens/operators,
  * qualified references, function calls, and comma/JOIN FROM lists —
  * not just the shapes the corpus happens to use. (Raw ScalaCheck
  * generators with fixed seeds; the scalatest-scalacheck bridge isn't
  * in the offline dependency cache.)
  */
class CorrelationParseSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    TestSpark.samples(g, n)

  private val keyword = Set(
    "and", "or", "not", "where", "select", "from", "as", "case", "when",
    "then", "else", "end", "null", "between", "in", "like", "is",
    "distinct", "true", "false", "exists", "group", "by", "order",
    "having", "limit", "on", "join", "inner", "left", "right", "full",
    "outer", "cross", "union", "all", "except", "intersect", "asc",
    "desc", "interval", "date", "cast", "div")

  private val ident: Gen[String] = (for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('_'))))
  } yield (h :: t).mkString).retryUntil(s => !keyword(s.toLowerCase))

  /** literal body: anything but a quote — keywords, parens, operators */
  private val literalBody: Gen[String] = Gen.listOf(Gen.frequency(
    (4, Gen.alphaNumChar),
    (2, Gen.oneOf('(', ')', '=', ',', '.', ' ')))).map(_.mkString)
    .flatMap(b => Gen.oneOf(b, s"$b and or $b", s"($b"))

  /** One atom of a synthetic SQL fragment with its EXPECTED bare
    * tokens.
    */
  private val atom: Gen[(String, Seq[String])] = Gen.frequency(
    (4, ident.map(c => (c, Seq(c)))),                          // bare column
    (2, literalBody.map(b => (s"'$b'", Nil: Seq[String]))),    // literal
    (2, for { a <- ident; b <- ident }
      yield (s"$a.$b", Nil: Seq[String])),                     // qualified
    (2, for { f <- ident; a <- ident }
      yield (s"$f($a)", Seq(a))),                              // call(arg)
    (1, Gen.chooseNum(0, 99999)
      .map(n => (n.toString, Nil: Seq[String]))),              // number
    (1, Gen.oneOf("and", "or", "not", "case", "end")
      .map(k => (k, Nil: Seq[String]))))                       // keyword

  test("property: bareCols returns exactly the unqualified non-call " +
    "identifiers — literals, qualified refs, calls, numbers, keywords " +
    "contribute none") {
    val frag: Gen[(String, Seq[String])] = for {
      atoms <- Gen.nonEmptyListOf(atom)
      seps <- Gen.listOfN(atoms.size, Gen.oneOf(" = ", " + ", " <> ",
        " < ", " , ", " "))
    } yield (atoms.zip(seps).map { case ((t, _), s) => t + s }
        .mkString.trim,
      atoms.flatMap(_._2))
    samples(frag, 400).foreach { case (text, expected) =>
      assert(CorrelationRepair.bareCols(text) ==
        expected.map(_.toLowerCase), s"fragment: $text")
    }
  }

  test("property: scanState's paren depth ignores everything inside " +
    "string literals and every literal is self-contained") {
    val piece: Gen[(String, Int)] = Gen.frequency(
      (3, literalBody.map(b => (s"'$b'", 0))), // literal: depth delta 0
      (3, ident.map(c => (c + " ", 0))),
      (2, Gen.const(("(", 1))),
      (2, Gen.const((")", -1))))
    samples(Gen.listOf(piece), 400).foreach { pieces =>
      val text = pieces.map(_._1).mkString
      val expectedDepth = pieces.map(_._2).sum
      assert(CorrelationRepair.scanState(text, text.length) ==
        ((expectedDepth, false)), s"text: $text")
    }
  }

  test("property: fromCandidates finds every table of a FROM comma " +
    "list and every JOIN operand, with or without aliases") {
    val fromClause: Gen[(String, Set[String])] = for {
      n <- Gen.chooseNum(1, 4)
      tables <- Gen.listOfN(n, ident)
      aliases <- Gen.listOfN(n, Gen.option(ident))
      joined <- Gen.option(ident)
      tail <- Gen.oneOf("", " where x = 1", " where r = 'a, b'")
    } yield {
      val items = tables.zip(aliases).map {
        case (t, Some(a)) => s"$t $a"
        case (t, None) => t
      }.mkString(", ")
      val joinPart = joined.map(j => s" join $j on 1=1").getOrElse("")
      (s"select * from $items$joinPart$tail",
        (tables ++ joined.toSeq).toSet)
    }
    samples(fromClause, 400).foreach { case (sql, tables) =>
      val found = CorrelationRepair.StatementSchema
        .fromCandidates(sql).toSet
      assert(tables.subsetOf(found),
        s"missing ${tables -- found} from: $sql")
    }
  }
}
