package graft.queries

/** Assembles the full verified query surface from the per-area modules. */
object Registry {
  def all: Seq[Q] =
    Relational.all ++ Windows.all ++ Activity.all ++ TextOps.all ++
      SimOps.all ++ EngineQueries.all ++ PipelineQueries.all ++
      MiscQueries.all ++ EdgeQueries.all ++ MusicQueries.all ++
      IngestQueries.all ++ CorpusQueries.all ++ SketchQueries.all ++
      OlapQueries.all ++ AnalyticsQueries.all ++ MatchQueries.all ++
      GovernanceQueries.all

  lazy val byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}
