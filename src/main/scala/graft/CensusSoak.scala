package graft

/** Full-scale equality check for the census family: the sampled
  * two-pass heavy hitter must return exactly the exact census's top-20
  * at every ScaleGen decade (the boilerplate planting guarantees every
  * top gram has 1-in-7 sample support at any replica count, so equality
  * is a construction fact here, not luck — a corpus without that
  * support would need a wider candidate pool, which is the documented
  * knob).
  *
  *   runMain graft.CensusSoak <sfDir>
  */
object CensusSoak {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CensusSoak <sfDir>")
    val dir = args(0)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(dir))
    spark.sparkContext.setLogLevel("WARN")
    val exact = Queries.byName("text_hot_ngrams").build(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sampled = Queries.byName("text_hot_ngrams_sampled").build(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(exact == sampled,
      s"CENSUS MISMATCH at $dir:\nexact=$exact\nsampled=$sampled")
    println(s"[censussoak] $dir top-${exact.size} identical " +
      s"(df range ${exact.last._2}..${exact.head._2})")
    spark.stop()
  }
}
