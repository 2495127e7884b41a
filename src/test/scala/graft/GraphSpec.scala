package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph, Temporal, TextAnalysis}

/** Semantics tests for the seventh coverage wave: graph analytics,
  * gap-fill resampling, blocked edit-distance dedup, vocab coverage.
  * Small hand-checkable inputs with known closed-form answers.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("a", "b")
  }

  test("triangleCount: K4 has exactly 4 triangles") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(Graph.triangleCount(k4).collect().head.getLong(0) == 4L)
  }

  test("triangleCount: a path has none; a pendant doesn't inflate") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graph.triangleCount(path).collect().head.getLong(0) == 0L)
    // one triangle + pendant edge off it
    val tri = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(Graph.triangleCount(tri).collect().head.getLong(0) == 1L)
  }

  test("triangleCount/coeff: planted-hub graph (one node on 1/3 of edges)") {
    // Hub 0 joined to every rim node 1..n plus the rim chain i-(i+1):
    // exactly n-1 triangles (0, i, i+1), hub degree n while every rim
    // degree <= 3 — the power-law worst case for wedge counting. The
    // degree orientation points every hub edge INTO the hub (it is the
    // max of the (deg, id) order), so the hub contributes NO out-
    // adjacency array and the wedge work stays rim-sized; a naive
    // sum-of-degree^2 scheme would pay n^2 on the hub.
    val n = 200L
    val hub = (1L to n).map(i => (0L, i))
    val rim = (1L until n).map(i => (i, i + 1))
    val g = edges((hub ++ rim): _*)
    assert(Graph.triangleCount(g).collect().head.getLong(0) == n - 1)
    val top = Graph.clusteringCoeffTopK(g, 1).collect().head
    // Hub sits in all n-1 triangles; coeff = 2(n-1)/(n(n-1)) = 2/n.
    assert(top.getAs[Long]("node") == 0L)
    assert(top.getAs[Long]("n_tri") == n - 1)
    assert(math.abs(top.getAs[Double]("coeff") - 2.0 / n) < 1e-12)
  }

  test("coOccurrenceEdges: pairs within group, a<b, deduped across groups") {
    val s = spark
    import s.implicits._
    val df = Seq((10L, 1L), (10L, 2L), (10L, 2L), // dup item in group
      (20L, 2L), (20L, 1L), // same pair again, other order
      (30L, 5L) // singleton group → no edges
    ).toDF("g", "item")
    val got = Graph.coOccurrenceEdges(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("degreeTopK: degree-desc then node-asc, limit respected") {
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    val got = Graph.degreeTopK(e, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 2L), (3L, 2L)))
  }

  test("perNodeTriangles and clusteringCoeffTopK: K4 + pendant") {
    // K4 on 1-4 (every node in 3 triangles) + pendant edge 4-5
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val tri = Graph.perNodeTriangles(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val cc = Graph.clusteringCoeffTopK(g, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // node 4 has deg 4 → coeff 3/6; nodes 1-3 deg 3 → coeff 1.0;
    // node 5 deg 1 is excluded. Order: n_tri desc, node asc.
    assert(cc.toSeq == Seq((1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0),
      (3L, 3L, 3L, 1.0), (4L, 3L, 4L, 0.5)))
  }

  test("resampleFfill: fills interior gaps, flags observed buckets") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      ("u1", ts("2024-01-01 00:10:00"), 1.0),
      ("u1", ts("2024-01-01 00:50:00"), 2.0), // same bucket → max = 2.0
      ("u1", ts("2024-01-01 03:30:00"), 7.0), // hours 1,2 are gaps
      ("u2", ts("2024-01-01 05:00:00"), 9.0) // single bucket, no grid
    ).toDF("k", "t", "v_in")
    val got = Temporal.resampleFfill(ev, "k", "t", "v_in", "hour")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(got == Set(
      ("u1", "2024-01-01 00:00:00.0", 2.0, true),
      ("u1", "2024-01-01 01:00:00.0", 2.0, false),
      ("u1", "2024-01-01 02:00:00.0", 2.0, false),
      ("u1", "2024-01-01 03:00:00.0", 7.0, true),
      ("u2", "2024-01-01 05:00:00.0", 9.0, true)))
  }

  test("blockedEditDistancePairs: close pair kept with exact distance, " +
    "far pair and cross-block pair dropped") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 2
    val df = Seq(
      (1L, base + "tail one"),
      (2L, base + "tail two"), // 3 edits from doc 1
      (3L, "completely different prefix but similar length here pad pad"),
      (4L, base + ("x" * 60)) // same block, length far outside tolerance
    ).toDF("doc_id", "text")
    val got = Dedup.blockedEditDistancePairs(df, prefixLen = 16,
        lenTol = 20, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3)))
  }

  test("vocabCoverage: counts occurrences covered by top-N vocab") {
    val s = spark
    import s.implicits._
    // corpus freq: aa=4, bb=3, cc=2 → top-2 vocab {aa, bb}
    val df = Seq(
      (1L, "s1", "aa aa bb cc"),
      (2L, "s1", "aa bb"),
      (3L, "s2", "aa bb cc")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.vocabCoverage(df, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("s1", 6L, 5L), ("s2", 3L, 2L)))
  }
}
