package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ExtendedStats

/** The r13 estimator statistics: string equal-depth histograms (the
  * LIKE-prefix range estimate) and exact single-column ndv. The CE
  * battery grades them end-to-end against the reference
  * (CeParitySpec); this spec pins the component contracts.
  */
class StringHistogramSpec extends AnyFunSuite {

  test("prefixSuccessor: increment, maximal tails, the surrogate gap, " +
    "unbounded") {
    assert(ExtendedStats.prefixSuccessor("MEDIUM").contains("MEDIUN"))
    assert(ExtendedStats.prefixSuccessor("ab").contains("ac"))
    // U+FFFF is not maximal in code-point (= UTF-8) order — its
    // successor is the first supplementary code point
    assert(ExtendedStats.prefixSuccessor("a" + Char.MaxValue)
      .contains("a" + new String(Character.toChars(0x10000))))
    // the true maximal scalar: drop it and bump the previous code point
    val max = new String(Character.toChars(0x10FFFF))
    assert(ExtendedStats.prefixSuccessor("a" + max).contains("b"))
    assert(ExtendedStats.prefixSuccessor(max * 3).isEmpty)
    // U+D7FF + 1 would be an unpaired surrogate, which Java's UTF-8
    // encoder turns into '?' (0x3F) — a "successor" BELOW the prefix.
    // The increment must skip the surrogate gap to U+E000.
    assert(ExtendedStats.prefixSuccessor("x\uD7FF").contains("x\uE000"))
  }

  test("prefixSuccessor property: every string extending a prefix falls " +
    "in [prefix, succ(prefix)) under UTF-8 byte order") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    // valid scalar code points only (no unpaired surrogates), biased
    // toward the hazardous boundaries: U+D7FF, U+E000, U+FFFF, U+10FFFF
    val scalar: Gen[Int] = Gen.frequency(
      6 -> Gen.chooseNum(0x20, 0xD7FF),
      2 -> Gen.chooseNum(0xE000, 0xFFFF),
      2 -> Gen.chooseNum(0x10000, 0x10FFFF),
      3 -> Gen.oneOf(0xD7FF, 0xE000, 0xFFFF, 0x10FFFF, 0x7F, 0x80, 0x7FF,
        0x800))
    val str: Gen[String] = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, scalar).map(cps =>
        cps.flatMap(Character.toChars(_).toSeq).mkString))
    val cases = (1 to 400).flatMap { i =>
      (for { p <- str; s <- str } yield (p, s))
        .apply(Gen.Parameters.default, Seed(i.toLong))
    }
    cases.foreach { case (p, s) =>
      ExtendedStats.prefixSuccessor(p) match {
        case Some(succ) =>
          assert(!utf8Lt(succ, p), s"succ below prefix: ${dump(p)}")
          assert(!utf8Lt(p + s, p), s"extension below prefix: ${dump(p)}")
          assert(utf8Lt(p + s, succ),
            s"extension not below successor: p=${dump(p)} s=${dump(s)} " +
              s"succ=${dump(succ)}")
        case None => // unbounded: p empty or every code point U+10FFFF
          assert(p.codePoints().toArray.forall(_ == 0x10FFFF), dump(p))
      }
    }
  }

  private def dump(s: String): String =
    s.codePoints().toArray.map(cp => f"U+$cp%04X").mkString("[", " ", "]")

  test("rangeSelectivity: exact on boundary-aligned ranges, clamped, " +
    "monotone under range widening") {
    val bs = IndexedSeq("a", "c", "e", "g", "i") // 4 equal-depth buckets
    def sel(lo: String, hi: Option[String]) =
      ExtendedStats.rangeSelectivity(bs, lo, hi)
    assert(sel("a", Some("e")) == 0.5) // first two of four buckets
    assert(sel("a", None) == 1.0)
    assert(sel("x", Some("z")) == 0.0) // fully above the recorded max
    assert(sel("A", Some("a")) == 0.0) // fully below the recorded min
    // widening the range can only grow the fraction, always within [0,1]
    val widenings = Seq(sel("c", Some("d")), sel("c", Some("e")),
      sel("c", Some("g")), sel("c", None))
    assert(widenings == widenings.sorted)
    assert(widenings.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("rangeSelectivity: long shared prefixes keep byte resolution " +
    "(the MEDIUM-vs-MEDIUM bucket case)") {
    // bounds share 10 bytes of prefix; a fixed 8-byte window would read
    // both as equal and fall back to half-credit
    val bs = IndexedSeq("SHAREDPRE-a", "SHAREDPRE-m", "SHAREDPRE-z")
    val left = ExtendedStats.rangeSelectivity(bs, "SHAREDPRE-a",
      Some("SHAREDPRE-g"))
    assert(left > 0.15 && left < 0.35, s"interpolation lost: $left")
  }

  test("analyzeStringHistogram + LIKE-prefix estimate track the true " +
    "count through the introspection estimator") {
    val spark = TestSpark.spark
    spark.sql("DROP TABLE IF EXISTS strhist_t")
    import spark.implicits._
    // 60% 'alpha-*', 30% 'beta-*', 10% 'gamma-*', plus NULLs the
    // estimate must not count
    val rows = (0 until 600).map(i => f"alpha-$i%04d") ++
      (0 until 300).map(i => f"beta-$i%04d") ++
      (0 until 100).map(i => f"gamma-$i%04d")
    (rows.map(Option(_)) ++ Seq.fill(100)(Option.empty[String]))
      .toDF("s").write.saveAsTable("strhist_t")
    try {
      spark.sql("ANALYZE TABLE strhist_t COMPUTE STATISTICS")
      val k = ExtendedStats.analyzeStringHistogram(spark, "strhist_t", "s")
      assert(k > 0)
      def estimate(): Double = {
        val df = spark.sql("SELECT * FROM strhist_t WHERE s LIKE 'beta-%'")
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val prof = graft.api.PlanIntrospection.estimateVsActual(df)
        val filter = prof.find(p => p.node.contains("Filter") &&
          p.estRows.isDefined).get
        assert(filter.estExact)
        filter.estRows.get.toDouble
      }
      // true count 300 of 1100 rows; bucket resolution bounds the error
      val est = estimate()
      assert(est > 240 && est < 360,
        s"LIKE-prefix estimate $est vs truth 300")
      // With per-column stats Spark's own base estimate prices the
      // inferred isnotnull(s) conjunct — the histogram scaling must not
      // count the null fraction AGAIN (the r13 review's double-count:
      // a systematic (1 - nullFrac)x under-estimate on nullable
      // columns). Same truth, same tolerance, nulls now priced once.
      spark.sql("ANALYZE TABLE strhist_t COMPUTE STATISTICS FOR ALL COLUMNS")
      val estWithColStats = estimate()
      assert(estWithColStats > 240 && estWithColStats < 360,
        s"null fraction double-counted: $estWithColStats vs truth 300")
    } finally spark.sql("DROP TABLE IF EXISTS strhist_t")
  }

  test("analyzeExactNdv registers exact counts next to ANALYZE's HLL") {
    val spark = TestSpark.spark
    spark.sql("DROP TABLE IF EXISTS ndv_t")
    import spark.implicits._
    (0 until 1000).map(i => (i % 199, i % 97)).toDF("a", "b")
      .write.saveAsTable("ndv_t")
    try {
      spark.sql("ANALYZE TABLE ndv_t COMPUTE STATISTICS FOR ALL COLUMNS")
      val ndvs = ExtendedStats.analyzeExactNdv(spark, "ndv_t", Seq("a", "b"))
      assert(ndvs == Map("a" -> 199L, "b" -> 97L))
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("ndv_t"))
      assert(ExtendedStats.exactNdvFromProperties(meta.properties, "a")
        .contains(199L))
      assert(ExtendedStats.exactNdvFromProperties(meta.properties, "b")
        .contains(97L))
      // r14: the exact counts must reach Spark's OWN planning — merged
      // into the catalog column stats next to ANALYZE's HLL sketch, so
      // the native estimator (not just the introspection surface)
      // prices from them.
      val colStats = meta.stats.get.colStats
      assert(colStats("a").distinctCount.contains(BigInt(199)),
        s"catalog ndv not exact: ${colStats("a").distinctCount}")
      assert(colStats("b").distinctCount.contains(BigInt(97)))
      // the rest of the ANALYZE stats survive the merge
      assert(colStats("a").min.isDefined && colStats("a").nullCount.isDefined)
      // a group-by estimate through Spark's own stats now reads exactly
      val grouped = spark.sql("SELECT a, count(*) AS c FROM ndv_t GROUP BY a")
      assert(grouped.queryExecution.optimizedPlan.stats.rowCount
        .contains(BigInt(199)))
    } finally spark.sql("DROP TABLE IF EXISTS ndv_t")
  }
}
