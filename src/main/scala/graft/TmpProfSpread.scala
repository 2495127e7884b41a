package graft
import graft.catalog.Tables

object TmpProfSpread {
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, Some(dir))
    Tables.registerAll(spark, dir)
    val byName = Queries.byName
    def timeQ(label: String, sql: String): Unit = {
      noop(spark.sql(sql)) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(spark.sql(sql)); (System.nanoTime()-t0)/1e9 }
      println(f"[profspread] $label%-28s min=${ts.min}%.3f all=${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    val q1 = byName("tpch_q1").sqlText.get
    timeQ("tpch_q1 orig", q1)
    timeQ("tpch_q1 spread",
      q1.replace("FROM lineitem", "FROM (SELECT /*+ REPARTITION */ * FROM lineitem) lineitem"))
    val q67 = byName("tpcds_q67_rollup_topk").sqlText.get
    timeQ("q67 orig", q67)
    timeQ("q67 spread",
      q67.replace("FROM lineitem JOIN part", "FROM (SELECT /*+ REPARTITION */ * FROM lineitem) lineitem JOIN part"))
    val q47 = byName("tpcds_q47_lag_lead").sqlText.get
    timeQ("q47 orig", q47)
    timeQ("q47 spread",
      q47.replace("FROM lineitem JOIN part", "FROM (SELECT /*+ REPARTITION */ * FROM lineitem) lineitem JOIN part"))
    val q51 = byName("tpcds_q51_cume_compare").sqlText.get
    timeQ("q51 orig", q51)
    timeQ("q51 spread",
      q51.replace("FROM lineitem WHERE", "FROM (SELECT /*+ REPARTITION */ * FROM lineitem) lineitem WHERE"))
    spark.stop()
  }
}
