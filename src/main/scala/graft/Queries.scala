package graft

import graft.queries._

/** The full verifiable query corpus — one QueryDef per implemented
  * operator from SURVEY.md §2 plus the LLM-data-pipeline operators.
  * SparkEntry / Verify / Bench all derive from this single list.
  */
object Queries {
  def all: Seq[QueryDef] =
    TpchQueries.defs ++
      Tpch2Queries.defs ++
      Tpch3Queries.defs ++
      TpcdsQueries.defs ++
      Tpcds2Queries.defs ++
      Tpcds3Queries.defs ++
      JobenchQueries.defs ++
      NistQueries.defs ++
      TemporalQueries.defs ++
      SubqueryBattery.defs ++
      RelationalQueries.defs ++
      JoinQueries.defs ++
      ExprQueries.defs ++
      WindowQueries.defs ++
      EventQueries.defs ++
      MapQueries.defs ++
      PipelineQueries.defs ++
      Pipeline2Queries.defs ++
      Pipeline3Queries.defs ++
      SourceSinkQueries.defs ++
      ExtraQueries.defs ++
      Extra2Queries.defs ++
      Extra3Queries.defs ++
      Extra4Queries.defs ++
      Extra5Queries.defs

  /** Runnable queries that by construction can have NO DuckDB oracle
    * (plan introspection rows describe engine-specific plan shape;
    * sketch estimates and merge-order-dependent summary counters are
    * engine-specific by definition). Kept out of [[all]] so the oracle
    * gate scores only oracle-paired queries; their semantics are
    * asserted by dedicated specs (PlanIntrospectionSpec, CensusSpec,
    * HeavyHitterSpec) instead.
    */
  def introspection: Seq[QueryDef] =
    Seq(SourceSinkQueries.sysPlanNodes, SourceSinkQueries.sysRuleTrace,
      SourceSinkQueries.sysPlanProperties,
      Pipeline3Queries.profileSketch, Pipeline3Queries.heavyHittersQ)

  lazy val byName: Map[String, QueryDef] =
    (all ++ introspection).map(d => d.name -> d).toMap

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in corpus")
}
