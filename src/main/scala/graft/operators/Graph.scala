package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics over co-occurrence graphs — the
  * SQL-on-Spark counterpart of the "items bought together" /
  * "documents sharing a shingle" graphs a data pipeline keeps running
  * into. Everything is plain DataFrame joins and aggregations (no
  * GraphX/RDDs), so Catalyst/AQE own the physical plan and the shapes
  * survive a 1000-executor cluster.
  */
object Graph {

  /** Undirected co-occurrence edge list: one (a < b) edge per pair of
    * distinct `item`s sharing a `group`. One shuffle on group to gather
    * co-members, one distinct on (a, b). Groups are order-sized (a
    * handful of items), so the within-group pair expansion is a small
    * constant factor, not a quadratic blow-up — the same bounded-group
    * reasoning as the LSH band buckets in [[Dedup]].
    */
  def coOccurrenceEdges(df: DataFrame, group: String, item: String): DataFrame =
    df.select(col(group).as("g"), col(item).as("a")).distinct()
      .join(df.select(col(group).as("g"), col(item).as("b")).distinct(), "g")
      .where(col("a") < col("b"))
      .select("a", "b").distinct()

  /** Exact triangle count by degree-ordered edge orientation — the
    * classic "compact-forward" scheme. Orienting every edge from the
    * endpoint that is smaller in the total order (degree, id) toward the
    * larger makes each node's out-degree O(sqrt(|E|)), so the wedge join
    * (the quadratic step) is sum-of-out-degree² — orders of magnitude
    * below the naive sum-of-degree² on skewed graphs, where one hub node
    * of degree d contributes d² wedges. Each triangle is counted exactly
    * once: its three nodes have a unique (degree, id) ordering u < v < w,
    * and only the wedge v←u→w with closing edge v→w fires.
    *
    * Plan shape: degrees = one groupBy over the (exploded) edge list;
    * the rank map is node-sized and broadcast into the two orientation
    * joins; wedges = self-join of the oriented edges on source; closing
    * check = one more equi-join on the wedge endpoints. No cartesians,
    * nothing driver-side; the only super-linear term is the wedge count,
    * which the orientation minimizes.
    *
    * Input must be an (a < b) deduplicated undirected edge list, e.g.
    * from [[coOccurrenceEdges]]. Returns a 1-row (triangles: long) frame.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Dense total order on (deg, node): node ids are unique, so the
    // rank is a strict total order and orientation is well-defined.
    val ord = deg.select(col("node"),
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("deg"), col("node"))).as("ord"))
    // Single-partition window is fine: ord is node-sized (not edge-
    // sized) and immediately broadcast; at true scale swap for
    // zipWithIndex-style ranking or just orient on (deg, node) pairs.
    val oriented = edges
      .join(broadcast(ord).withColumnRenamed("node", "a")
        .withColumnRenamed("ord", "ord_a"), "a")
      .join(broadcast(ord).withColumnRenamed("node", "b")
        .withColumnRenamed("ord", "ord_b"), "b")
      .select(
        when(col("ord_a") < col("ord_b"), col("a")).otherwise(col("b"))
          .as("u"),
        when(col("ord_a") < col("ord_b"), col("b")).otherwise(col("a"))
          .as("v"),
        when(col("ord_a") < col("ord_b"), col("ord_a"))
          .otherwise(col("ord_b")).as("ord_u"),
        when(col("ord_a") < col("ord_b"), col("ord_b"))
          .otherwise(col("ord_a")).as("ord_v"))
    val e1 = oriented.select(col("u"), col("v").as("v1"),
      col("ord_v").as("ord_v1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"),
      col("ord_v").as("ord_v2"))
    val wedges = e1.join(e2, "u").where(col("ord_v1") < col("ord_v2"))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    wedges.join(closing, Seq("v1", "v2"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** Top-k nodes by co-occurrence degree — the "hub report" audit that
    * accompanies any co-occurrence graph (hubs are where wedge counts,
    * LSH buckets, and join skew all concentrate). Deterministic total
    * order: (degree desc, node).
    */
  def degreeTopK(edges: DataFrame, k: Int): DataFrame =
    edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node"))
      .limit(k)
}
