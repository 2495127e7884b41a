package graft
object TempTreeDebug {
  def main(args: Array[String]): Unit = {
    val spark = JobenchPlan.session()
    graft.catalog.Tpch1.register(spark)
    val (ic, dc) = graft.regress.RefRegress.columnTypeSets(graft.catalog.Tpch1.DdlFile)
    Seq("q03","q08","q09","q10","q11","q15","q18","q20","q21").foreach { name =>
      val sql = JobenchPlan.sqlFiles(Tpch1Plan.SqlDir).toMap.apply(name)
      val text = graft.regress.RefRegress.qpmodelize(sql, ic, dc)
      val qe = spark.sql(text).queryExecution
      val ours = JobenchPlan.canonical(qe.sparkPlan)
      val ref = JobenchPlan.referenceShape(Tpch1Plan.ExpectDir, name)
      println(s"[tree] $name OURS=$ours")
      println(s"[tree] $name REF =${ref.getOrElse("-")}")
    }
    spark.stop()
  }
}
