package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's engine options (qpmodel `QueryOption`,
  * `/root/reference/qpmodel/Plan.cs:48-101`) — memo optimizer, property
  * enforcement, distributed exchanges — all of which map onto Catalyst
  * equivalents that we simply enable: CBO + join reorder (memo / join-order
  * solvers), AQE (runtime re-plan + skew handling), broadcast thresholds
  * (replicated distribution).
  *
  * Designed for cluster scale: nothing here is local-mode specific except
  * the default master. On a real cluster the same conf applies; shuffle
  * partition count is AQE-coalesced from 2× the default parallelism.
  */
object GraftSession {

  /** Apply graft engine configuration to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.sql.cbo.joinReorder.enabled", "true")
    .config("spark.sql.statistics.histogram.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** Local session for tests / entry. */
  def local(cores: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
