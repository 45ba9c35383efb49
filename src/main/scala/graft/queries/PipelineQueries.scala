package graft.queries

import graft.pipelines.{DimensionRefresh, Lending}

/** The reference's three ETL lifecycles as oracle-checked batch queries
  * (SURVEY.md §3): funding stats is registered separately as the flagship;
  * these cover the lending ingest and the two dimension refreshes.
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(
    QueryDef("lending_pipeline",
      (s, dir) => Lending.build(s, dir),
      Lending.oracleSql),
    QueryDef("dim_refresh_spot",
      (s, dir) => DimensionRefresh.buildSpot(s, dir),
      DimensionRefresh.spotOracleSql),
    QueryDef("dim_refresh_futures",
      (s, dir) => DimensionRefresh.buildFutures(s, dir),
      DimensionRefresh.futuresOracleSql)
  )
}
