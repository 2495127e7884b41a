package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Connected-components soak: times both CC algorithms at a given SF over
  * (a) the REAL MinHash pair graph (near-clique components — propagation's
  * home turf) and (b) a chain-heavy fixture (long paths — the shape star
  * contraction exists for: O(log n) rounds vs O(diameter)). Results are
  * recorded in BASELINE.md per round.
  *
  *   sbt "runMain graft.SoakCC /root/testdata/sf0.1"
  */
object SoakCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(sfDir))
    import spark.implicits._

    def time(label: String)(run: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[soak] $label%-28s min=${ts.min}%.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    // (a) Real LSH pair graph via the gate queries themselves.
    val prop = time("minhash prop")(
      Queries.byName("dedup_clusters").build(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    val star = time("minhash star")(
      Queries.byName("dedup_clusters_star").build(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // (b) Chain-heavy fixture: 100 disjoint 64-node paths (diameter 63).
    // Propagation needs ~63 label-hop rounds; star contraction ~O(log 64).
    val chains = spark.range(6400)
      .filter(col("id") % 64 =!= 63)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val chainProp = time("chain prop (6400 nodes)")(
      operators.Dedup.duplicateClusters(chains.toDF, maxIters = 70)
        .write.format("noop").mode("overwrite").save())
    val chainStar = time("chain star (6400 nodes)")(
      operators.Dedup.duplicateClustersStar(chains.toDF, maxIters = 12)
        .write.format("noop").mode("overwrite").save())
    // Both must reach the exact fixed point: 100 components of 64 docs.
    val gotProp = operators.Dedup.duplicateClusters(chains.toDF, maxIters = 70)
      .agg(count(lit(1)), sum("n_docs")).as[(Long, Long)].head()
    val gotStar = operators.Dedup.duplicateClustersStar(chains.toDF, maxIters = 12)
      .agg(count(lit(1)), sum("n_docs")).as[(Long, Long)].head()
    assert(gotProp == ((100L, 6400L)), s"prop fixed point wrong: $gotProp")
    assert(gotStar == ((100L, 6400L)), s"star fixed point wrong: $gotStar")
    println(f"[soak] summary sf=$sfDir minhash prop/star=$prop%.2f/$star%.2f s, " +
      f"chain prop/star=$chainProp%.2f/$chainStar%.2f s (star/prop ratio " +
      f"chain=${chainStar / chainProp}%.2f)")
    spark.stop()
  }
}
