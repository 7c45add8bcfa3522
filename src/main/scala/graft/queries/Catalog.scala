package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-coverage query: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (driver hash-compares values after sorting columns by
  * name): every query ends with a total ORDER BY over its output columns, and
  * the oracle SQL carries the same ORDER BY with `NULLS FIRST` to match
  * Spark's ascending-nulls-first default. Floating aggregates are rounded on
  * both sides so summation-order ulp noise cannot flip the hash.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
}

/** Registry assembled by SparkEntry; each area object contributes defs. */
object Catalog {
  def areas: Seq[Seq[QueryDef]] = Seq(
    Relational.defs,
    GraphQueries.defs,
    VectorQueries.defs,
    PipelineQueries.defs,
    AlgoQueries.defs,
    CypherQueries.defs,
    MutationQueries.defs,
    SparqlQueries.defs,
    LangQueries.defs,
    StreamQueries.defs,
    ExtraQueries.defs,
    Extra2Queries.defs,
    Algo2Queries.defs,
    WindowQueries.defs,
    TpchQueries.defs,
    AdminQueries.defs,
  )

  lazy val defs: Seq[QueryDef] = {
    val all = areas.flatten
    val dup = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    all
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  lazy val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
