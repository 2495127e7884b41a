package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Optimization-round helper: write `.explain("formatted")` for each
  * bench query to one file per query, so plan claims in the round notes
  * are checkable against committed artifacts.
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [name...]"
  *
  * e.g. `runMain graft.PlanDump /root/testdata/sf0.1 plans/r15 before`
  * writes `plans/r15/<query>_before.txt` for every bench query. Names
  * restrict the set. The dump is the INITIAL plan (pre-AQE), same
  * determinism rationale as PlanGolden; sfDir matters because broadcast
  * decisions are size-based.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r15")
    val suffix = args.lift(2).getOrElse("before")
    val names = args.drop(3) match {
      case Array() => Queries.all.filter(_.bench).map(_.name)
      case ns => ns.toSeq
    }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, Some(sfDir))
    Files.createDirectories(Paths.get(outDir))
    val byName = Queries.byName
    names.foreach { n =>
      val df = byName(n).build(spark, sfDir)
      // Same string explain("formatted") prints, captured instead.
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        text.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
