package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ExtendedStats

/** Randomized semantics net for [[graft.plans.ContainmentJoinReorder]]:
  * the rule rewrites USER plans inside the optimizer, so beyond the
  * deterministic scenarios in [[ContainmentReorderSpec]] it gets a
  * generator-driven guarantee — over random connected inner-join
  * queries (random item multisets incl. self-joins, random equi-edge
  * spanning trees plus extra cycle edges, composite correlated-key
  * edges, random single-side filters) against ANALYZE'd catalog
  * tables, `off` and `apply` must return IDENTICAL aggregates. The
  * aggregates are chosen to be permutation-sensitive (COUNT(*) plus a
  * per-item-weighted payload SUM), so a dropped/duplicated conjunct, a
  * mis-redistributed key, a lost filter, or a self-join item mixup all
  * surface as a value difference.
  *
  * The corpus is seed-pinned (raw ScalaCheck generators, as in
  * [[GraphPropertySpec]]) and the suite asserts the rule actually
  * FIRED on some of it — a vacuously-green property proves nothing.
  */
class ContainmentReorderPropertySpec extends AnyFunSuite
    with BeforeAndAfterAll {

  private var spark: SparkSession = _

  // Four tables, sizes 3000/1000/300/80. k1 is a quasi-key; k2/k3 are
  // semi-keys with moduli >= size/5 so any generated edge keeps join
  // fanout small (worst hop ~5x). In every table, (k2, k3) are
  // CORRELATED (k3 derives from k2) with the column-group tuple-ndv
  // registered: per-key containment prices a composite (k2, k3) edge
  // from the ndv product while the registered group knows better — the
  // same misestimate family the deterministic spec pins, here to make
  // the DP disagree with CBO often enough that the property exercises
  // real rewrites.
  private val tables = Map(
    "crp_a" -> (3000, 2999, 601),
    "crp_b" -> (1000, 997, 211),
    "crp_c" -> (300, 293, 61),
    "crp_d" -> (80, 79, 17))

  override def beforeAll(): Unit = {
    spark = GraftSession.local(cores = 4)
    tables.foreach { case (t, (n, m1, m2)) =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(
        s"""CREATE TABLE $t USING parquet AS
           |SELECT id % $m1 AS k1, id % $m2 AS k2,
           |       (id % $m2) div 3 AS k3, id AS p
           |FROM range($n)""".stripMargin)
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      ExtendedStats.analyzeColumnGroup(spark, t, Seq("k2", "k3"))
    }
  }

  override def afterAll(): Unit =
    tables.keys.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private case class Item(table: String, alias: String)
  private case class Q(sql: String)

  private val colNames = Vector("k1", "k2", "k3")

  /** One random query: 3-5 items drawn with replacement, a spanning
    * tree of equi edges (each with at least one k1 side, bounding
    * fanout), 0-2 extra cycle edges, composite-(k2,k3) upgrades, and
    * per-item filters.
    */
  private val queryGen: Gen[Q] = for {
    n <- Gen.chooseNum(3, 5)
    names <- Gen.listOfN(n, Gen.oneOf(tables.keys.toSeq))
    items = names.zipWithIndex.map { case (t, i) => Item(t, s"r$i") }
    // spanning tree: item i (>0) connects to a previous item
    treeTo <- Gen.sequence[List[Int], Int](
      (1 until n).map(i => Gen.chooseNum(0, i - 1)))
    // tree edges mostly anchor on the quasi-key k1 (fanout ~1); a
    // minority are k2=k2 (fanout ~5, the correlated-composite site)
    treeCols <- Gen.listOfN(n - 1, Gen.frequency(
      (3, for {
        leftK1 <- Gen.prob(0.5)
        other <- Gen.oneOf(colNames)
      } yield if (leftK1) ("k1", other) else (other, "k1")),
      (1, Gen.const(("k2", "k2")))))
    composite <- Gen.listOfN(n - 1, Gen.prob(0.3))
    extraN <- Gen.chooseNum(0, 2)
    extra <- Gen.listOfN(extraN, for {
      i <- Gen.chooseNum(0, n - 1)
      j <- Gen.chooseNum(0, n - 1)
      ci <- Gen.oneOf(colNames)
      cj <- Gen.oneOf(colNames)
    } yield (i, j, ci, cj))
    filters <- Gen.sequence[List[Option[(Int, String, Int)]], Option[(Int, String, Int)]](
      items.indices.map { i =>
        for {
          on <- Gen.prob(0.4)
          c <- Gen.oneOf(colNames)
          v <- Gen.chooseNum(3, 40)
        } yield if (on) Some((i, c, v)) else None
      })
  } yield {
    val conjuncts = scala.collection.mutable.ArrayBuffer.empty[String]
    (1 until n).foreach { i =>
      val j = treeTo(i - 1)
      val (ci, cj) = treeCols(i - 1)
      conjuncts += s"r$i.$ci = r$j.$cj"
      // a composite correlated edge: add the second (k2,k3) conjunct
      if (composite(i - 1) && ci == "k2" && cj == "k2")
        conjuncts += s"r$i.k3 = r$j.k3"
    }
    extra.foreach { case (i, j, ci, cj) =>
      if (i != j) conjuncts += s"r$i.$ci = r$j.$cj"
    }
    filters.flatten.foreach { case (i, c, v) =>
      conjuncts += s"r$i.$c < $v"
    }
    val weighted = items.indices.map(i => s"${i + 1} * r$i.p").mkString(" + ")
    val from = items.map(it => s"${it.table} ${it.alias}").mkString(", ")
    Q(s"""SELECT COUNT(*) AS cnt, SUM($weighted) AS s
         |FROM $from
         |WHERE ${conjuncts.mkString(" AND ")}""".stripMargin)
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    TestSpark.samples(g, n)

  private def withMode[T](mode: String)(f: => T): T =
    GraftSession.withConf(spark, "spark.graft.containmentReorder", mode)(f)

  test("off and apply return identical aggregates over 30 random " +
    "connected join queries; the rule fires on a nonzero subset") {
    var fired = 0
    var nonEmpty = 0
    samples(queryGen, 30).zipWithIndex.foreach { case (q, i) =>
      val offPlan = withMode("off")(
        spark.sql(q.sql).queryExecution.optimizedPlan.canonicalized)
      val onPlan = withMode("apply")(
        spark.sql(q.sql).queryExecution.optimizedPlan.canonicalized)
      if (offPlan != onPlan) fired += 1
      val off = withMode("off")(spark.sql(q.sql).collect().toSeq)
      val on = withMode("apply")(spark.sql(q.sql).collect().toSeq)
      assert(off == on, s"sample $i diverged under reorder:\n${q.sql}\n" +
        s"off=$off on=$on")
      if (off.head.getLong(0) > 0L) nonEmpty += 1
    }
    info(s"reorder fired on $fired/30 samples; $nonEmpty/30 non-empty")
    // Seed-pinned corpus: these counts are deterministic. The property
    // must neither go vacuous (rule never fires -> rewrites untested)
    // nor degenerate (all-empty results compare equal trivially).
    assert(fired >= 1, "containment reorder fired on zero samples - " +
      "the corpus no longer exercises the rewrite path")
    assert(nonEmpty >= 10,
      s"only $nonEmpty/30 samples returned rows - corpus degenerated")
  }
}
