package graft

import org.apache.spark.sql.functions.col

/** Scale soak for the semantic-dedup family with the cluster-count
  * throttle applied: `semanticDedup` / `incrementalSemanticDedup` at a
  * caller-chosen K. The pinned oracle queries run K=8 (so the DuckDB
  * replay stays tractable), but K=8 at 100× means ~60k-vector clusters
  * and a quadratic in-cluster term — the paper's posture is K ∝ corpus
  * (50k clusters for 5B embeddings), and THIS main measures exactly
  * that: usage `runMain graft.SemanticSoak <sfDir> <K>`.
  */
object SemanticSoak {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SemanticSoak <sfDir> <K>")
    val (dir, k) = (args(0), args(1).toInt)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(dir))
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.catalog.Tables.load(spark, dir, "embeddings")
    val n = emb.count()

    def timed(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val out = df
      out.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[semsoak] $name n=$n K=$k time=$sec%.2f")
    }

    timed("semantic_dedup") {
      operators.Similarity.semanticDedup(emb, numCentroids = k)
    }
    val pruned = operators.Similarity.semanticDedup(emb, numCentroids = k)
      .filter(!col("keep")).count()
    println(s"[semsoak] semantic_dedup pruned=$pruned")
    timed("semantic_incremental") {
      operators.Similarity.incrementalSemanticDedup(
        emb.filter("vec_id % 5 != 0"), emb.filter("vec_id % 5 = 0"),
        numCentroids = k)
    }
    spark.stop()
  }
}
