package graft

import org.apache.spark.sql.SparkSession

/** Profiling helper: run named queries repeatedly and print per-rep
  * times, to separate plan cost from machine noise. Not part of the
  * driver contract (Bench is); usage:
  *
  *   sbt "runMain graft.Prof <sfDir> <reps> <name> [name...]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.drop(2) match {
      case Array() => Queries.all.filter(_.bench).map(_.name).toArray
      case ns => ns
    }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(sfDir))
    val byName = Queries.all.map(d => d.name -> d).toMap
    names.foreach { n =>
      val d = byName(n)
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        d.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $n%-22s min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
