package graft.queries

/** Area stubs — filled in as their operators land (SURVEY.md §7.4). */
object GraphQueries { def defs: Seq[QueryDef] = GraphQueriesImpl.defs }
object VectorQueries { def defs: Seq[QueryDef] = VectorQueriesImpl.defs }
object PipelineQueries { def defs: Seq[QueryDef] = PipelineQueriesImpl.defs }
object AlgoQueries { def defs: Seq[QueryDef] = AlgoQueriesImpl.defs }
object CypherQueries { def defs: Seq[QueryDef] = CypherQueriesImpl.defs }
object MutationQueries { def defs: Seq[QueryDef] = MutationQueriesImpl.defs }
object SparqlQueries { def defs: Seq[QueryDef] = SparqlQueriesImpl.defs }
object LangQueries { def defs: Seq[QueryDef] = LangQueriesImpl.defs }
object StreamQueries { def defs: Seq[QueryDef] = StreamQueriesImpl.defs }
object ExtraQueries { def defs: Seq[QueryDef] = ExtraQueriesImpl.defs }
object Extra2Queries { def defs: Seq[QueryDef] = Extra2QueriesImpl.defs }
object Algo2Queries { def defs: Seq[QueryDef] = Algo2QueriesImpl.defs }
object WindowQueries { def defs: Seq[QueryDef] = WindowQueriesImpl.defs }
object TpchQueries { def defs: Seq[QueryDef] = TpchQueriesImpl.defs }
object AdminQueries { def defs: Seq[QueryDef] = AdminQueriesImpl.defs }
