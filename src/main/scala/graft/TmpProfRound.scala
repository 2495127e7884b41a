package graft
import graft.catalog.Tables

object TmpProfRound {
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, Some(dir))
    Tables.registerAll(spark, dir)
    val byName = Queries.byName
    def swap(sql: String): String = {
      // ROUND((expr) * f) -> CASE-floor form, textual: rely on the qsum/dsum shape
      val re = "ROUND\\(".r
      // do a balanced-paren replace of ROUND(x) with half-away floor form
      var s = sql
      var out = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.startsWith("ROUND(", i)) {
          var d = 1; var j = i + 6
          while (d > 0) { if (s(j)=='(') d+=1 else if (s(j)==')') d-=1; j+=1 }
          val inner = s.substring(i+6, j-1)
          out.append(s"(CASE WHEN ($inner) >= 0 THEN FLOOR(($inner) + 0.5) ELSE CEIL(($inner) - 0.5) END)")
          i = j
        } else { out.append(s(i)); i += 1 }
      }
      out.toString
    }
    def timeQ(label: String, sql: String): Unit = {
      noop(spark.sql(sql))
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(spark.sql(sql)); (System.nanoTime()-t0)/1e9 }
      println(f"[profround] $label%-28s min=${ts.min}%.3f all=${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    for (n <- Seq("tpch_q1", "tpcds_q67_rollup_topk", "tpcds_q51_cume_compare", "tpch_q5")) {
      val q = byName(n).sqlText.get
      val q2 = swap(q)
      // result identity check
      val a = spark.sql(q).collect().map(_.toString).sorted
      val b = spark.sql(q2).collect().map(_.toString).sorted
      println(s"[profround] $n identical=${a.sameElements(b)} rows=${a.length}")
      timeQ(s"$n ROUND", q)
      timeQ(s"$n floorCase", q2)
    }
    spark.stop()
  }
}
