package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock A/B of [[graft.plans.ContainmentJoinReorder]] at scale —
  * the measured half of the r14/r15 planner-steering story (the tpch1 /
  * JOBENCH audits prove the rule picks different TREES; this main
  * proves the trees it picks are CHEAPER to execute).
  *
  * Scenario (the ContainmentReorderSpec shape scaled past broadcast
  * range so join ORDER controls real shuffle volume): a fact table
  * whose composite key (k1, k2) is perfectly correlated — tuple-ndv
  * k1ndv×k2ndv with every fact pair present in the dim — joined to the
  * pair dim AND to a fanout-8 probe table on k3. Spark's min-per-key
  * containment estimate prices the pair join at |F|·|D|/max(ndv_k) =
  * (k2ndv×)|F| — three orders of magnitude over the truth |F| — so its
  * CBO defers the pair join behind the probe join and ships the
  * fanout-multiplied intermediate (8·|F| rows) into the pair
  * sort-merge join. Under the registered column-group ndv the
  * containment DP prices the pair join exactly (|F|) and puts it
  * first: the second join's input drops 8×. Both dims are sized past
  * `autoBroadcastJoinThreshold` AFTER column pruning, so the
  * intermediate genuinely shuffles — the same physics a 1000-executor
  * pair join lives with.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.ContainmentSoak [N] [passes]"
  * N = fact rows (default 10,000,000); timed passes alternate
  * off/apply (interleaved — the page-cache order-bias lesson) after one
  * untimed warm pass each; per-mode min + median printed, plus the
  * deepest-join leaf sets so the steering is visible in the artifact.
  */
object ContainmentSoak {

  private val ConfKey = "spark.graft.containmentReorder"

  private def withMode[T](spark: SparkSession, mode: String)(f: => T): T =
    GraftSession.withConf(spark, ConfKey, mode)(f)

  /** Leaf tables of the DEEPEST join in the optimized plan — which
    * pair the chosen order joins first.
    */
  private def firstJoin(spark: SparkSession, sql: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    spark.sql(sql).queryExecution.optimizedPlan.collect {
      case j: Join => j.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.catalogTable.isDefined =>
          r.catalogTable.get.identifier.table
      }
    }.lastOption.getOrElse(Nil).sorted
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    GraftSession.requireComplete(spark)
    val k1n = 4000L
    val k2n = 1000L
    val k3n = 200000L
    val fanout = 8L

    println(s"[cjsoak] building fact=$n dim=${k1n * k2n} " +
      s"t3=${k3n * fanout} (warehouse tables)")
    Seq("cjs_fact", "cjs_dim", "cjs_t3").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(
      s"""CREATE TABLE cjs_fact USING parquet AS
         |SELECT id % $k1n AS k1, (id div $k1n) % $k2n AS k2,
         |       id % $k3n AS k3, id AS payload
         |FROM range($n)""".stripMargin)
    spark.sql(
      s"""CREATE TABLE cjs_dim USING parquet AS
         |SELECT id % $k1n AS k1, id div $k1n AS k2, id AS dim_val
         |FROM range(${k1n * k2n})""".stripMargin)
    spark.sql(
      s"""CREATE TABLE cjs_t3 USING parquet AS
         |SELECT id % $k3n AS k3, id AS t3_val
         |FROM range(${k3n * fanout})""".stripMargin)
    Seq("cjs_fact", "cjs_dim", "cjs_t3").foreach(t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    graft.catalog.ExtendedStats.analyzeColumnGroup(
      spark, "cjs_fact", Seq("k1", "k2"))
    graft.catalog.ExtendedStats.analyzeColumnGroup(
      spark, "cjs_dim", Seq("k1", "k2"))

    val query =
      """SELECT sum(f.payload + d.dim_val + t.t3_val) AS s
        |FROM cjs_fact f
        |JOIN cjs_dim d ON f.k1 = d.k1 AND f.k2 = d.k2
        |JOIN cjs_t3 t ON f.k3 = t.k3""".stripMargin

    val offOrder = withMode(spark, "off")(firstJoin(spark, query))
    val onOrder = withMode(spark, "apply")(firstJoin(spark, query))
    println(s"[cjsoak] first join off=$offOrder apply=$onOrder")

    def time(mode: String): Double = withMode(spark, mode) {
      val t0 = System.nanoTime()
      spark.sql(query).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // untimed warm (scan cache, codegen) once per mode
    time("off"); time("apply")
    val results = scala.collection.mutable.Map(
      "off" -> Vector.empty[Double], "apply" -> Vector.empty[Double])
    (1 to passes).foreach { p =>
      Seq("off", "apply").foreach { m =>
        val t = time(m)
        results(m) :+= t
        println(f"[cjsoak] pass $p $m%-5s ${t}%.2f s")
      }
    }
    def stats(v: Vector[Double]): String = {
      val s = v.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      f"min ${s.head}%.2f s, median $med%.2f s"
    }
    println(s"[cjsoak] N=$n off:   ${stats(results("off"))}")
    println(s"[cjsoak] N=$n apply: ${stats(results("apply"))}")
    Seq("cjs_fact", "cjs_dim", "cjs_t3").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
