package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.01"
    Queries.all.filter(_.bench).foreach { d =>
      val df = d.build(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      def count(p: String) = p.r.findAllIn(plan).size
      println(s"AUDIT ${d.name}: scans=${count("FileScan")} exch=${count("Exchange hashpartitioning")} " +
        s"bcast=${count("BroadcastExchange")} smj=${count("SortMergeJoin")} shj=${count("ShuffledHashJoin")} " +
        s"bhj=${count("BroadcastHashJoin")} cart=${count("CartesianProduct")} bnlj=${count("BroadcastNestedLoop")} " +
        s"reuse=${count("ReusedExchange")} sort=${count("\\bSort\\b")}")
    }
    spark.stop()
  }
}
