package graft
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

object TmpProfJobs {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, Some(dir))
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTime = new AtomicLong // ms of task run time summed
    val jobGaps = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var lastJobEnd = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        if (lastJobEnd > 0) jobGaps.add(j.time - lastJobEnd)
        jobs.incrementAndGet()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = { lastJobEnd = j.time }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTime.addAndGet(t.taskInfo.duration)
      }
    })
    val names = Seq("ann_ivf_pq_residual", "ann_ivf_pq", "ann_ivf_kmeans",
      "dedup_clusters_star", "graph_triangles", "dedup_minhash",
      "dedup_semantic", "pipeline_passage_scrub", "tpch_q1",
      "tpcds_q67_rollup_topk")
    val byName = Queries.byName
    names.foreach { n => // warm
      byName(n).build(spark, dir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    println("[profjobs] name jobs stages tasks sumTaskSec wallSec gapSec")
    names.foreach { n =>
      System.gc()
      jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0)
      jobGaps.clear(); lastJobEnd = 0L
      val t0 = System.nanoTime()
      byName(n).build(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime()-t0)/1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      Thread.sleep(200) // let listener drain
      val gap = jobGaps.toArray.map(_.asInstanceOf[Long]).sum / 1e3
      println(f"[profjobs] $n%-26s ${jobs.get}%4d ${stages.get}%5d ${tasks.get}%6d ${taskTime.get/1e3}%8.2f $wall%7.2f $gap%7.2f")
    }
    spark.stop()
  }
}
