package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ExtendedStats

/** The r13 estimator statistics: string equal-depth histograms (the
  * LIKE-prefix range estimate) and exact single-column ndv. The CE
  * battery grades them end-to-end against the reference
  * (CeParitySpec); this spec pins the component contracts.
  */
class StringHistogramSpec extends AnyFunSuite {

  test("prefixSuccessor: increment, U+FFFF tails, unbounded") {
    assert(ExtendedStats.prefixSuccessor("MEDIUM").contains("MEDIUN"))
    assert(ExtendedStats.prefixSuccessor("ab").contains("ac"))
    // a trailing maximal char can't increment — drop it and bump the
    // previous one, exactly the lexicographic least-upper-bound rule
    assert(ExtendedStats.prefixSuccessor("a" + Char.MaxValue)
      .contains("b"))
    assert(ExtendedStats.prefixSuccessor(Char.MaxValue.toString).isEmpty)
  }

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
      val ndvs = ExtendedStats.analyzeExactNdv(spark, "ndv_t", Seq("a", "b"))
      assert(ndvs == Map("a" -> 199L, "b" -> 97L))
      val props = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("ndv_t"))
        .properties
      assert(ExtendedStats.exactNdvFromProperties(props, "a")
        .contains(199L))
      assert(ExtendedStats.exactNdvFromProperties(props, "b")
        .contains(97L))
    } finally spark.sql("DROP TABLE IF EXISTS ndv_t")
  }
}
