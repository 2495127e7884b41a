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
  * the default master. On a real cluster the same conf applies; AQE
  * coalesces the shuffle partition count down from the configured value.
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
    // Spark's default 10 MB, set explicitly as a documented choice: every
    // dimension the corpus broadcasts is well under it, and a LARGER
    // threshold only multiplies the blast radius of a CBO underestimate —
    // the r7 10x soak caught a 9-relation join statically broadcasting a
    // "small" intermediate that was really 1.3 GB (driver maxResultSize
    // abort). Estimates err; the threshold is the failure bound.
    .config("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    // events.parquet carries TIMESTAMP(NANOS); read as long, converted in
    // Tables.load (Spark has no native nanos timestamp).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
    // Streaming checkpoints for the bounded readStream verification path.
    .config("spark.sql.streaming.checkpointLocation",
      "/root/repo/target/checkpoints")

  /** Local session for tests / entry. Shuffle partitions default to the
    * core count: at the driver's scale factors extra partitions only add
    * scheduling overhead, and AQE coalesces anyway. At SOAK scale the
    * count must grow with the data — the r8 1000× soak OOM'd at 32
    * partitions (600M-row SMJ ⇒ ~19M rows in one in-memory sort) and ran
    * clean at 512 — so `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides it;
    * AQE coalesces the excess at small scale, which is why
    * over-provisioning the initial count is the right cluster default
    * (partition count is a function of input size, never a constant).
    */
  def local(cores: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString))
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
