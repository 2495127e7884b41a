package graft
object TmpProfPlan {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, Some(dir))
    val names = Seq("ann_ivf_pq_residual", "ann_ivf_pq", "ann_ivf_kmeans",
      "dedup_clusters_star", "graph_triangles", "dedup_minhash",
      "dedup_semantic", "pipeline_passage_scrub", "text_lm_nll",
      "tpcds_q67_rollup_topk", "tpch_q1", "tpcds_q51_cume_compare")
    val byName = Queries.byName
    // warm JIT/codegen with one full bench-like pass
    names.foreach { n =>
      byName(n).build(spark, dir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { pass =>
      println(s"[profplan] === pass $pass ===")
      names.foreach { n =>
        val t0 = System.nanoTime()
        val df = byName(n).build(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis->physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[profplan] $n%-26s build=${(t1-t0)/1e9}%.3f plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f total=${(t3-t0)/1e9}%.3f")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
