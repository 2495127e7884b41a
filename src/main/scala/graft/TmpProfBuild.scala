package graft
import org.apache.spark.sql.functions._
import graft.functions.vec
import graft.catalog.Tables

object TmpProfBuild {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profbuild] $name%-30s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, Some(dir))
    val corpus = Tables.load(spark, dir, "embeddings")
    val queries = corpus.filter("vec_id < 10")
    operators.Similarity.ivfPqResidualTopK(corpus, queries, 3)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.catalog.clearCache()
    val (dim, numCentroids) = (64, 8)
    val ca = classOf[operators.Similarity.type].getDeclaredMethods.find(_.getName == "coarseAssign").get
    ca.setAccessible(true)
    def coarse(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      ca.invoke(operators.Similarity, a, b).asInstanceOf[org.apache.spark.sql.DataFrame]
    (1 to 2).foreach { pass =>
      println(s"[profbuild] === pass $pass ===")
      val qc = corpus.select(col("vec_id"), vec.quantize(col("embedding")).as("qe"))
      val seedArr = qc.filter(col("vec_id") < numCentroids)
        .select(col("vec_id").cast("int").as("cid"), col("qe").as("ce"))
        .agg(sort_array(collect_list(struct(col("cid"), col("ce")))).as("cents"))
      val asg1 = coarse(qc, seedArr)
      val sums = (1 to dim).map(d => sum(element_at(col("qe"), d)).as(s"s$d"))
      val centFlat = asg1.groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cid"), array((1 to dim).map(d =>
          floor(col(s"s$d") / col("n")).cast("double")): _*).as("ce"))
      val centArr = centFlat
        .agg(sort_array(collect_list(struct(col("cid"), col("ce")))).as("cents")).cache()
      val resid0 = coarse(qc, centArr)
        .join(broadcast(centFlat), "cid")
        .select(col("vec_id"), col("cid"),
          zip_with(col("qe"), col("ce"), (a, b) => a - b).as("qe"))
      val qe = resid0.queryExecution
      t("analyzed")(qe.analyzed)
      t("withCachedData")(qe.withCachedData)
      t("optimizedPlan")(qe.optimizedPlan)
      t("sparkPlan")(qe.sparkPlan)
      t("executedPlan")(qe.executedPlan)
      t("toRdd")(qe.toRdd)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
