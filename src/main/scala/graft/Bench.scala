package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline (`bench=true`) queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the `noop` sink so the full plan
  * (scan → shuffle → agg → project) actually executes; `count()` would let
  * Spark answer from partial aggregation without materializing projected
  * columns. Failures are reported explicitly in an "errors" object rather
  * than being silently timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defs = Queries.all.filter(_.bench)
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val passes = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(record: Boolean): Unit = {
      defs.foreach { d =>
        val t0 = System.nanoTime()
        try {
          d.build(spark, sfDir).write.format("noop").mode("overwrite").save()
          if (record) {
            val t = (System.nanoTime() - t0) / 1e9
            times(d.name) = times.get(d.name).fold(t)(math.min(_, t))
            passes.getOrElseUpdate(d.name,
              scala.collection.mutable.ArrayBuffer[Double]()) += t
          }
        } catch {
          case e: Throwable =>
            if (record) {
              // Keep times/errors disjoint: an intermittent failure marks
              // the query errored rather than reporting the min of its
              // successful passes alongside an error for the same name.
              times.remove(d.name)
              errors(d.name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .take(200).replaceAll("[\"\\\\\n\r\t]", " ")
        }
        }
      }
      // Defensive: queries are expected to own their materializations
      // (the LSH helpers localCheckpoint instead of cache since r7), but
      // any future cache() slipping into a query would otherwise have
      // later passes served from the CacheManager's plan match,
      // flattering min-of-3 into a cache-read benchmark. Drop all cached
      // plans between passes so every pass pays full recompute.
      spark.catalog.clearCache()
    }
    // Warmup pass: JIT + whole-stage-codegen compilation + parquet footer
    // cache dominate a cold first query (~8s vs ~1s steady-state); the
    // engine's throughput is the warm number. Cold total is reported too.
    // Recorded time = min over 3 warm passes: single-shot times on a
    // shared machine carry multi-second GC/scheduler spikes (observed
    // 1.3s vs 10.5s for the same plan); the min is the reproducible
    // steady-state cost of the plan. all_passes carries every warm pass
    // time so a round-over-round delta is classifiable as noise vs
    // regression from the artifact alone (a plan regression shifts all
    // three passes; a scheduler spike inflates one).
    val c0 = System.nanoTime()
    once(record = false)
    val coldTotal = (System.nanoTime() - c0) / 1e9
    (1 to 3).foreach(_ => once(record = true))
    errors.keys.foreach { k => times.remove(k); passes.remove(k) }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ps = passes.map { case (k, vs) =>
      "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    val firstWarmTotal = passes.values.map(_.head).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"all_passes":$ps,"errors":$es,"cold_sec":${f"$coldTotal%.3f"},"first_warm_sec":${f"$firstWarmTotal%.3f"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
