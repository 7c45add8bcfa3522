package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named-graph management (reference plan.rs:666-734: ClearGraph/CreateGraph/
  * DropGraph/CopyGraph/MoveGraph/AddGraph) over a quads DataFrame
  * (g, s, p, o) — every operation is a partition-wise transformation on the
  * `g` column, which is exactly how it scales: with the quads table
  * partitioned by `g`, each op touches only the named partitions.
  */
final case class QuadStore(quads: DataFrame) {

  def graphNames: DataFrame = quads.select(col("g")).distinct()

  def graph(name: String): TripleGraph =
    TripleGraph(quads.filter(col("g") === name).select("s", "p", "o"))

  /** CLEAR GRAPH g (plan.rs:666-675): drop its triples, keep others. */
  def clear(name: String): QuadStore =
    QuadStore(quads.filter(col("g") =!= name))

  /** DROP GRAPH = clear (graph existence is extensional here). */
  def drop(name: String): QuadStore = clear(name)

  /** ADD src TO dst (plan.rs:723-734): union src's triples into dst (set
    * semantics).
    */
  def add(src: String, dst: String): QuadStore = {
    val moved = quads.filter(col("g") === src)
      .select(lit(dst).as("g"), col("s"), col("p"), col("o"))
    QuadStore(quads.unionByName(moved).distinct())
  }

  /** COPY src TO dst (plan.rs:700-711): dst becomes an exact copy of src. */
  def copy(src: String, dst: String): QuadStore = {
    val copied = quads.filter(col("g") === src)
      .select(lit(dst).as("g"), col("s"), col("p"), col("o"))
    QuadStore(quads.filter(col("g") =!= dst).unionByName(copied))
  }

  /** MOVE src TO dst (plan.rs:712-722): copy then drop src. */
  def move(src: String, dst: String): QuadStore = copy(src, dst).drop(src)

  /** INSERT DATA into a named graph. */
  def insert(name: String, triples: DataFrame): QuadStore =
    QuadStore(quads.unionByName(
      triples.select(lit(name).as("g"), col("s"), col("p"), col("o"))).distinct())

  /** LOAD <uri> [INTO GRAPH g] (LoadGraphOp, plan.rs:694-701): read triples
    * from a local N-Triples (.nt) or parquet (s, p, o) file into the named
    * graph (SPARQL 1.1 Update §3.1.1; omitted graph = "default"). N-Triples
    * parsing is a distributed line-wise regexp extraction — no driver-side
    * file reads, so a 100 TB dump loads exactly like any other text source.
    * Literal objects unescape `\"` and `\\` (the two escapes
    * GraphIO.exportNTriples emits — export → LOAD round-trips
    * term-exact); other sequences keep their lexical form (matching the
    * store's plain-string term encoding).
    */
  def load(spark: SparkSession, uri: String, into: Option[String]): QuadStore = {
    val path = uri.stripPrefix("file://").stripPrefix("file:")
    val name = into.getOrElse("default")
    val triples =
      if (path.endsWith(".parquet"))
        spark.read.parquet(path).select("s", "p", "o")
      else {
        val line = trim(col("value"))
        val re = "^(<[^>]*>|_:\\S+)\\s+(<[^>]*>)\\s+(.+?)\\s*\\.$"
        def deIri(c: org.apache.spark.sql.Column) =
          regexp_replace(c, "^<|>$", "")
        spark.read.text(path)
          .select(
            regexp_extract(line, re, 1).as("s0"),
            regexp_extract(line, re, 2).as("p0"),
            regexp_extract(line, re, 3).as("o0"))
          .filter(col("s0") =!= "") // blank/comment lines extract to ""
          .select(
            deIri(col("s0")).as("s"),
            deIri(col("p0")).as("p"),
            when(col("o0").startsWith("\""),
                // unescape \" and \\ — the two escapes exportNTriples
                // emits; other sequences keep their lexical form
                regexp_replace(
                  regexp_extract(col("o0"), "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1),
                  "\\\\([\"\\\\])", "$1"))
              .otherwise(deIri(col("o0"))).as("o"))
      }
    insert(name, triples)
  }

  /** BGP across the named graphs with the graph name bound as `gVar` —
    * `GRAPH ?g { … }` (SPARQL 1.1 §13.3). Mirrors TripleGraph.bgp, with
    * every leg carrying the g column so the natural join on `gVar` enforces
    * that all triples of the block match inside the SAME graph.
    */
  def bgp(gVar: String, patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    def leg(pat: TriplePattern): DataFrame = {
      val bound = Seq("s" -> pat.s, "p" -> pat.p, "o" -> pat.o)
      val filtered = bound.foldLeft(quads) {
        case (df, (c, L(v))) => df.filter(col(c) === v)
        case (df, _)         => df
      }
      val varCols = ("g", gVar) +: bound.collect { case (c, V(n)) => (c, n) }
      val dup = varCols.groupBy(_._2).filter(_._2.size > 1)
      val eq = dup.values.flatMap(g2 => g2.tail.map(t => col(g2.head._1) === col(t._1)))
      val f2 = eq.foldLeft(filtered)(_ filter _)
      f2.select(varCols.map(_._2).distinct.map(n =>
        col(varCols.find(_._2 == n).get._1).as(n)): _*)
    }
    patterns.map(leg).reduceLeft { (acc, next) =>
      acc.join(next, acc.columns.intersect(next.columns).toSeq) // gVar always shared
    }
  }
}

object QuadStore {
  /** A store with no quads — the LOAD/import starting point. */
  def empty(spark: SparkSession): QuadStore = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    QuadStore(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("g", "s", "p", "o").map(StructField(_, StringType)))))
  }

  /** Deterministic quads view: documents keyed by their source as the named
    * graph — (g=source, s=doc:id, p, o).
    */
  def fromDocuments(spark: SparkSession, dir: String): QuadStore = {
    val d = graft.core.Tables.documents(spark, dir)
    def q(p: String, o: org.apache.spark.sql.Column): DataFrame =
      d.select(col("source").as("g"),
        concat(lit("doc:"), col("doc_id")).as("s"), lit(p).as("p"),
        o.cast("string").as("o"))
    QuadStore(q("lang", col("lang")).unionByName(q("nchars", col("n_chars"))))
  }
}
