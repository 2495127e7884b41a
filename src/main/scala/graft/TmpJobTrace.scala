package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** TEMP profiling main (optimization r16, deleted after use): per-query
  * job counts and inter-job driver gaps — the VERDICT item-3/4 evidence.
  *   runMain graft.TmpJobTrace <dir> <query> [query...]
  */
object TmpJobTrace {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(dir))
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val d = Queries.byName(n)
      d.build(spark, dir).write.format("noop").mode("overwrite").save() // warm
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
      val l = new SparkListener {
        private val starts = scala.collection.mutable.Map[Int, Long]()
        override def onJobStart(j: SparkListenerJobStart): Unit =
          starts(j.jobId) = j.time
        override def onJobEnd(j: SparkListenerJobEnd): Unit =
          starts.remove(j.jobId).foreach(s => jobs.synchronized {
            jobs += ((j.jobId, s, j.time)) })
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      d.build(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      Thread.sleep(200)
      val sorted = jobs.sortBy(_._1)
      val busy = sorted.map(j => j._3 - j._2).sum / 1e3
      // gap = wall not covered by any job (sequential approximation)
      val covered = if (sorted.isEmpty) 0.0 else {
        var tot = 0L; var hi = 0L
        sorted.sortBy(_._2).foreach { case (_, s, e) =>
          val s2 = math.max(s, hi)
          if (e > s2) { tot += e - s2; hi = e } else hi = math.max(hi, e)
        }
        tot / 1e3
      }
      println(f"[jobtrace] $n%-24s wall=$wall%.3f jobs=${sorted.size}%3d " +
        f"job_covered=$covered%.3f driver_gap=${wall - covered}%.3f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
