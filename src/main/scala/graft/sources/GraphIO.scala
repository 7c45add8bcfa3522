package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, QuadStore, TripleGraph}

/** Graph persistence and interchange (reference surface: database.rs:1674
  * `export_snapshot` / database.rs:1723 `import_snapshot`, plus the CLI's
  * data import/export commands in grafeo-cli/src/commands/data.rs).
  *
  * The reference serializes a binary snapshot of its in-memory store; the
  * Spark-native equivalent is a parquet DIRECTORY layout — schema-carrying,
  * splittable, predicate-pushdown-friendly, and readable by any engine:
  *
  *   <path>/nodes/    id, labels, <typed property columns>
  *   <path>/edges/    src, dst, rel, <typed property columns>
  *   <path>/triples/  s, p, o          (RDF snapshot)
  *   <path>/quads/    g, s, p, o       (named-graph snapshot)
  *
  * Scale notes: writes go through the normal committer (atomic rename), so a
  * snapshot of a 100 TB graph is just a distributed copy; `repartitionBy`
  * keys (labels/rel/p) cluster the files so a reload prunes by label or
  * predicate without reading the rest. CSV import mirrors the CLI's
  * import command for interchange with external tools.
  */
object GraphIO {

  // ---- property-graph snapshot ----

  def save(g: PropertyGraph, path: String): Unit = {
    g.nodes.write.mode(SaveMode.Overwrite).parquet(s"$path/nodes")
    g.edges.write.mode(SaveMode.Overwrite)
      // cluster by rel: expand(rel=…) reloads prune whole files
      .partitionBy("rel").parquet(s"$path/edges")
  }

  def load(spark: SparkSession, path: String): PropertyGraph =
    PropertyGraph(
      spark.read.parquet(s"$path/nodes"),
      spark.read.parquet(s"$path/edges"))

  // ---- RDF snapshot ----

  def saveTriples(g: TripleGraph, path: String): Unit =
    // vertical-partitioning by predicate: a BGP pattern with a bound
    // predicate reads only its own partition directories
    g.triples.write.mode(SaveMode.Overwrite).partitionBy("p")
      .parquet(s"$path/triples")

  def loadTriples(spark: SparkSession, path: String): TripleGraph = {
    val t = spark.read.parquet(s"$path/triples")
    // partitionBy moved `p` to the end; restore canonical (s, p, o) order
    TripleGraph(t.select("s", "p", "o"))
  }

  def saveQuads(q: QuadStore, path: String): Unit =
    q.quads.write.mode(SaveMode.Overwrite).partitionBy("g")
      .parquet(s"$path/quads")

  def loadQuads(spark: SparkSession, path: String): QuadStore =
    QuadStore(spark.read.parquet(s"$path/quads").select("g", "s", "p", "o"))

  // ---- CSV interchange (CLI import path, data.rs:51) ----

  /** Nodes CSV: header `id,labels,<props…>`; labels as `;`-separated tags.
    * Edges CSV: header `src,dst,rel,<props…>`.
    */
  def fromCsv(spark: SparkSession, nodesPath: String, edgesPath: String): PropertyGraph = {
    def read(p: String): DataFrame =
      spark.read.option("header", "true").option("inferSchema", "true").csv(p)
    val nodes = read(nodesPath)
      .withColumn("id", col("id").cast("long"))
      .withColumn("labels",
        when(col("labels").isNull, array().cast("array<string>"))
          .otherwise(split(col("labels"), ";")))
    val edges = read(edgesPath)
      .withColumn("src", col("src").cast("long"))
      .withColumn("dst", col("dst").cast("long"))
      .withColumn("rel", col("rel").cast("string"))
    PropertyGraph(nodes, edges)
  }

  /** Export to CSV (CLI export path, data.rs:17): arrays flattened to the
    * same `;`-separated encoding fromCsv parses.
    */
  def toCsv(g: PropertyGraph, nodesPath: String, edgesPath: String): Unit = {
    g.nodes
      .withColumn("labels", concat_ws(";", col("labels")))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(nodesPath)
    g.edges.write.mode(SaveMode.Overwrite).option("header", "true").csv(edgesPath)
  }
}
