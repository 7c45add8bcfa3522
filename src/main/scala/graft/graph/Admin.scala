package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Admin / introspection surface over a [[PropertyGraph]] — the Spark
  * re-expression of the reference's database admin API
  * (database.rs:1302 `info`, :1318 `detailed_stats`, :1365 `schema`,
  * :1432 `validate`; result shapes admin.rs:32-198).
  *
  * Everything here is a declarative DataFrame plan: counts are
  * distributed aggregations, dangling-reference checks are hash
  * anti-joins, and each entry point answers in ONE Spark job (metrics
  * that need both node- and edge-side scans are unioned into a single
  * action) — at 100 TB these are full-corpus reductions and the job
  * count, not the row count, is what the caller feels.
  */
object Admin {

  /** Column names that are graph structure, not user properties. */
  private val NodeMeta = Set("id", "labels")
  private val EdgeMeta = Set("src", "dst", "rel", "eid")

  private def propCols(df: DataFrame, meta: Set[String]): Seq[String] =
    df.schema.fields.collect {
      case f if !meta.contains(f.name) && !f.dataType.isInstanceOf[MapType] =>
        f.name
    }.toIndexedSeq

  private def hasDynProps(df: DataFrame): Boolean =
    df.schema.fields.exists(f =>
      f.name == "props" && f.dataType.isInstanceOf[MapType])

  /** `DatabaseStats` (admin.rs:51-68) as one row per metric:
    * `(metric: String, value: Long)` for node_count, edge_count,
    * label_count, edge_type_count, property_key_count.
    *
    * Typed property keys come from the schema (no job at all); dynamic
    * `props` map keys are counted distributively. The node aggregation,
    * edge aggregation, and (when present) dynamic-key counts all ride
    * one union → one action.
    */
  def stats(g: PropertyGraph): DataFrame = {
    val typedKeys: Set[String] =
      propCols(g.nodes, NodeMeta).toSet ++ propCols(g.edges, EdgeMeta).toSet

    // global aggregations (no grouping) so every metric yields exactly one
    // row even over an empty graph
    val metrics = Seq(
      g.nodes.agg(count(lit(1)).as("value"))
        .select(lit("node_count").as("metric"), col("value")),
      g.edges.agg(count(lit(1)).as("value"))
        .select(lit("edge_count").as("metric"), col("value")),
      g.nodes.select(explode(col("labels")).as("l"))
        .agg(count_distinct(col("l")).as("value"))
        .select(lit("label_count").as("metric"), col("value")),
      g.edges.agg(count_distinct(col("rel")).as("value"))
        .select(lit("edge_type_count").as("metric"), col("value")))

    // property_key_count = |typed schema keys ∪ dynamic `props` map keys|.
    // Typed keys come straight from the schema; dynamic keys (schemaless
    // fallback) need a distributed distinct over map_keys.
    def dynKeysOf(df: DataFrame): Option[DataFrame] =
      if (hasDynProps(df))
        Some(df.select(explode(map_keys(coalesce(col("props"), map()))).as("k")))
      else None
    val dynKeys = (dynKeysOf(g.nodes).toSeq ++ dynKeysOf(g.edges).toSeq)
      .reduceOption(_ unionByName _)
    val propKeyCount: DataFrame = dynKeys match {
      case Some(dyn) =>
        val typedRows = typedKeys.toSeq.sorted.map(k =>
          g.nodes.sparkSession.range(1).select(lit(k).as("k")))
        (dyn +: typedRows).reduce(_ unionByName _)
          .agg(count_distinct(col("k")).as("value"))
          .select(lit("property_key_count").as("metric"), col("value"))
      case None =>
        g.nodes.sparkSession.range(1).select(
          lit("property_key_count").as("metric"),
          lit(typedKeys.size.toLong).as("value"))
    }

    (metrics :+ propKeyCount).reduce(_ unionByName _).orderBy("metric")
  }

  /** `SchemaInfo::Lpg` (admin.rs:72-98) flattened to rows:
    * `(kind: label|edge_type, name, count)` — per-label node counts
    * (multi-label nodes count once per label, matching the reference's
    * per-label index sizes) and per-type edge counts, in one job.
    */
  def schemaInfo(g: PropertyGraph): DataFrame = {
    val labels = g.nodes.select(explode(col("labels")).as("name"))
      .select(lit("label").as("kind"), col("name"))
    val types = g.edges.select(lit("edge_type").as("kind"), col("rel").as("name"))
    labels.unionByName(types)
      .groupBy("kind", "name").agg(count(lit(1)).as("count"))
      .orderBy("kind", "name")
  }

  /** `RdfSchemaInfo` (database.rs:1400 `rdf_schema`; admin.rs:101-119)
    * flattened to rows `(kind, name, count)`: one `predicate` row per
    * distinct predicate with its triple count, plus `subject_count` /
    * `object_count` summary rows (distinct terms). When the store is a
    * [[QuadStore]], `named_graph` rows ride along (the reference stubs
    * those out — its RdfStore has no named graphs; ours do). One job.
    */
  def rdfSchemaInfo(triples: DataFrame): DataFrame = {
    val preds = triples.select(lit("predicate").as("kind"), col("p").as("name"))
      .groupBy("kind", "name").agg(count(lit(1)).as("count"))
    val subjects = triples
      .agg(count_distinct(col("s")).as("count"))
      .select(lit("summary").as("kind"), lit("subject_count").as("name"), col("count"))
    val objects = triples
      .agg(count_distinct(col("o")).as("count"))
      .select(lit("summary").as("kind"), lit("object_count").as("name"), col("count"))
    val graphs =
      if (triples.columns.contains("g"))
        triples.select(lit("named_graph").as("kind"), col("g").as("name"))
          .groupBy("kind", "name").agg(count(lit(1)).as("count"))
      else preds.limit(0)
    preds.unionByName(graphs).unionByName(subjects).unionByName(objects)
      .orderBy("kind", "name")
  }

  /** `validate()` (database.rs:1432): referential-integrity audit as
    * rows `(kind: error|warning, code, n)` — counts instead of the
    * reference's per-entity error list, because at 100 TB a dangling-edge
    * list can itself be corpus-sized; the count is the actionable signal
    * and the offending rows are one anti-join away.
    *
    * Codes: DANGLING_SRC / DANGLING_DST (edge endpoint not in nodes,
    * reference codes database.rs:1440,1449) and the NO_EDGES warning
    * (database.rs:1461). Two anti-joins + two counts, one action.
    */
  def validate(g: PropertyGraph): DataFrame = {
    val ids = g.nodes.select(col("id"))
    // BOTH endpoint checks in ONE pass: explode each edge to
    // (code, endpoint-id) and anti-join against the node ids once. The
    // former per-endpoint formulation scanned the edge table twice and
    // shuffled two separate anti-joins — same answer, double the exchange
    // volume and double the fixed job count (r16 q_db_validate ledger
    // item). Multiplicity is the point here: the reference counts dangling
    // EDGE INSTANCES (database.rs:1440,1449), so no dedup before the join.
    val endpoints = g.edges.select(explode(array(
        struct(lit("DANGLING_SRC").as("code"), col("src").as("id")),
        struct(lit("DANGLING_DST").as("code"), col("dst").as("id")))).as("x"))
      .select(col("x.code"), col("x.id"))
    val dangling = endpoints.join(ids, Seq("id"), "left_anti")
      .groupBy("code").agg(count(lit(1)).as("n"))
      .select(lit("error").as("kind"), col("code"), col("n"))
    // groupBy on a constant yields NO row when the side is empty — union
    // a zero row per code so the result always carries all codes.
    def zero(kind: String, code: String): DataFrame =
      g.nodes.sparkSession.range(1).select(
        lit(kind).as("kind"), lit(code).as("code"), lit(0L).as("n"))

    val noEdges = g.edges.agg(count(lit(1)).as("ec"))
      .crossJoin(g.nodes.agg(count(lit(1)).as("nc")))
      .select(lit("warning").as("kind"), lit("NO_EDGES").as("code"),
        when(col("nc") > 0 && col("ec") === 0, 1L).otherwise(0L).as("n"))

    dangling.unionByName(zero("error", "DANGLING_SRC"))
      .unionByName(zero("error", "DANGLING_DST"))
      .unionByName(noEdges)
      .groupBy("kind", "code").agg(max(col("n")).as("n"))
      .orderBy("kind", "code")
  }
}
