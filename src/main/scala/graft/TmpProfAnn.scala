package graft
import org.apache.spark.sql.functions._
import graft.functions.vec
import graft.catalog.Tables

object TmpProfAnn {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profann] $name%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, Some(dir))
    val corpus = Tables.load(spark, dir, "embeddings")
    val queries = corpus.filter("vec_id < 10")
    println(s"[profann] corpus rows=${corpus.count()}")
    // warm up
    (1 to 2).foreach { _ =>
      noop(operators.Similarity.ivfPqResidualTopK(corpus, queries, 3))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    (1 to 3).foreach { pass =>
      println(s"[profann] === pass $pass ===")
      val qc = corpus.select(col("vec_id"), vec.quantize(col("embedding")).as("qe"))
      t("qc full scan (noop)")(noop(qc))
      val seedArr = qc.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("qe").as("ce"))
        .agg(sort_array(collect_list(struct(col("cid"), col("ce")))).as("cents"))
      t("seedArr (noop)")(noop(seedArr))
      // coarse assign pass alone
      val asg1 = t("coarseAssignBuild") {
        val m = classOf[operators.Similarity.type].getDeclaredMethods
          .find(_.getName == "coarseAssign").get
        m.setAccessible(true)
        m.invoke(operators.Similarity, qc, seedArr).asInstanceOf[org.apache.spark.sql.DataFrame]
      }
      t("coarseAssign pass (noop)")(noop(asg1))
      val dim = 64
      val sums = (1 to dim).map(d => sum(element_at(col("qe"), d)).as(s"s$d"))
      val centFlat = asg1.groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cid"), array((1 to dim).map(d =>
          floor(col(s"s$d") / col("n")).cast("double")): _*).as("ce"))
      t("centFlat (noop)")(noop(centFlat))
      t("full residual query")(noop(operators.Similarity.ivfPqResidualTopK(corpus, queries, 3)))
      t("full ivf_pq query")(noop(operators.Similarity.ivfPqTopK(corpus, queries, 3)))
      t("full ivf_kmeans query")(noop(operators.Similarity.ivfKmeansTopK(corpus, queries, 3)))
      t("full brute query")(noop(operators.Similarity.bruteForceTopK(corpus, queries, 5)))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
