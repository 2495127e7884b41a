package graft

/** Run named corpus queries once-warm against a data dir and print JSON
  * timings — the ad-hoc companion to [[Bench]] (which times the fixed
  * `bench=true` headliner set): scale soaks and plan probes want
  * arbitrary corpus queries on arbitrary dirs.
  *
  *   runMain graft.RunQuery <dir> <query> [query ...]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    // --conf k=v: session conf overrides for A/B probes (e.g.
    // spark.graft.graph.packedAdjacency=false), applied before planning.
    val (confArgs, positional) = args.partition(_.startsWith("--conf="))
    require(positional.length >= 2,
      "usage: RunQuery <dir> <query> [query ...] [--conf=k=v ...]")
    val dir = positional(0)
    val names = positional.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(dir))
    confArgs.map(_.stripPrefix("--conf=")).foreach { kv =>
      val parts = kv.split("=", 2)
      require(parts.length == 2 && parts(0).nonEmpty,
        s"malformed --conf=$kv (expected --conf=key=value)")
      spark.conf.set(parts(0), parts(1))
      println(s"[runquery] conf ${parts(0)}=${parts(1)}")
    }
    spark.sparkContext.setLogLevel("WARN")
    val times = names.map { n =>
      val d = Queries.byName.getOrElse(n,
        sys.error(s"unknown query $n"))
      d.build(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      d.build(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // streamed per query so a crash mid-soak keeps the partial results
      println(f"""[runquery] $n $sec%.3f""")
      n -> sec
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" +
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) }
      .mkString("{", ",", "}")
    println(s"""{"runquery":$qs,"dir":"$dir"}""")
    spark.stop()
  }
}
