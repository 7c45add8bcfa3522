package graft.frontends.gql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.frontends.cypher.{Ast, CypherFrontend}
import graft.ir.Op
import graft.vector.{Hnsw, Ivf, Knn}

/** ISO-GQL front-end (SURVEY §2.8; reference
  * crates/grafeo-adapters/src/query/gql_translator.rs + gql/ast.rs). The
  * core pattern surface (MATCH/WHERE/RETURN/ORDER BY/…) coincides with the
  * openCypher grammar and shares its parser and IR; this module adds the
  * GQL-specific statements the reference keeps in its own translator:
  *
  *   - INSERT (pattern)[, (pattern)…]     (gql ast.rs insert statements;
  *     node/edge-pattern semantics of Cypher CREATE, run through the same
  *     functional Mutations executor)
  *   - CREATE VECTOR INDEX name ON Label(prop) USING LSH|IVF|HNSW
  *     [OPTIONS(k v, …)]                  (gql/ast.rs:386
  *     CreateVectorIndexStatement, lowered onto the LSH-bucket / IVF /
  *     partitioned-HNSW build paths of graft.vector)
  *   - CREATE GRAPH name [LIKE other]     (gql/ast.rs catalog statements;
  *     registers a schema-copy in the session graph catalog)
  */
sealed trait GqlStatement
final case class GqlQuery(op: Op.T) extends GqlStatement
final case class GqlMutation(query: Ast.Query) extends GqlStatement
final case class GqlCreateVectorIndex(name: String, label: String,
    prop: String, method: String, options: Map[String, Int],
    metric: Option[String] = None) extends GqlStatement
/** GQL catalog statement (gql/ast.rs:7-540 schema/catalog statements):
  * CREATE GRAPH name — optionally LIKE another graph (same typed schema).
  */
final case class GqlCreateGraph(name: String, like: Option[String]) extends GqlStatement
/** Typed-schema property definition (gql/ast.rs:404 PropertyDefinition;
  * `unique` per reference catalog/mod.rs:210-223 add_unique_constraint).
  */
final case class GqlPropertyDef(name: String, dataType: String,
    nullable: Boolean, unique: Boolean = false)
/** CREATE NODE TYPE / CREATE EDGE TYPE (gql/ast.rs:346/357): registers the
  * type in the session schema catalog; INSERTs of a typed label validate
  * their NOT NULL properties against it.
  */
final case class GqlCreateType(kind: String, name: String,
    props: Seq[GqlPropertyDef]) extends GqlStatement

object GqlFrontend {

  private val VectorIndexRe =
    """(?is)\s*CREATE\s+VECTOR\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*\(\s*(\w+)\s*\)(?:\s+USING\s+(\w+))?(?:\s+OPTIONS\s*\(([^)]*)\))?\s*""".r
  private val CreateGraphRe =
    """(?is)\s*CREATE\s+GRAPH\s+(\w+)(?:\s+LIKE\s+(\w+))?\s*""".r
  private val CreateTypeRe =
    """(?is)\s*CREATE\s+(NODE|EDGE)\s+TYPE\s+(\w+)\s*\(([^)]*)\)\s*""".r

  private def parsePropDefs(body: String): Seq[GqlPropertyDef] =
    body.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { d =>
      val toks = d.split("\\s+").toSeq
      require(toks.length >= 2,
        s"property definitions are `name TYPE [NOT NULL] [UNIQUE]`, got '$d'")
      val (name, tpe) = (toks(0), toks(1).toUpperCase)
      var (nullable, unique) = (true, false)
      var rest = toks.drop(2).map(_.toUpperCase)
      while (rest.nonEmpty) rest match {
        case Seq("NOT", "NULL", tail @ _*) => nullable = false; rest = tail
        case Seq("UNIQUE", tail @ _*)      => unique = true; rest = tail
        case other => throw new IllegalArgumentException(
          s"property definitions are `name TYPE [NOT NULL] [UNIQUE]`, got '$d'" +
            s" (unrecognized: ${other.mkString(" ")})")
      }
      GqlPropertyDef(name, tpe, nullable, unique)
    }

  def parseStatement(q: String): GqlStatement = q match {
    case CreateTypeRe(kind, name, body) =>
      GqlCreateType(kind.toLowerCase, name, parsePropDefs(body))
    case VectorIndexRe(name, label, prop, method, opts) =>
      val m = Option(method).map(_.toLowerCase).getOrElse("lsh")
      require(m == "lsh" || m == "ivf" || m == "hnsw",
        s"unknown vector index method $m")
      // `metric` takes a string value (reference
      // CreateVectorIndexStatement.metric, gql/ast.rs:395); every other
      // option is an integer parameter
      val kvs = Option(opts).map(_.trim).filter(_.nonEmpty)
        .map(_.split(",").map { kv =>
          val parts = kv.trim.split("\\s+")
          require(parts.length == 2, s"OPTIONS entries are `key value`, got '$kv'")
          parts(0).toLowerCase -> parts(1)
        }.toSeq)
        .getOrElse(Seq.empty)
      val metric = kvs.collectFirst { case ("metric", v) => v.toLowerCase }
      val options = kvs.filterNot(_._1 == "metric")
        .map { case (k, v) => k -> v.toInt }.toMap
      require(metric.forall(mt => m == "hnsw" || mt == "cosine"),
        s"method $m supports only the cosine metric")
      GqlCreateVectorIndex(name, label, prop, m, options, metric)
    case CreateGraphRe(name, like) => GqlCreateGraph(name, Option(like))
    case _ =>
      // parseAll so query-level UNION works through the shared grammar the
      // same as cypher(); mutations stay single-statement
      val parts = CypherFrontend.parseAll(q)
      val isMutation = parts.head._1.clauses.exists {
        case _: Ast.CreateClause | _: Ast.SetClause | _: Ast.DeleteClause |
            _: Ast.MergeClause | _: Ast.RemoveClause |
            _: Ast.RemovePropClause => true
        case _ => false
      }
      if (isMutation) {
        require(parts.size == 1, "UNION is not valid in a mutation statement")
        GqlMutation(parts.head._1)
      } else GqlQuery(CypherFrontend.translateText(q))
  }
}

/** Vector-index build paths behind `CREATE VECTOR INDEX` — the Spark-scale
  * stand-ins for the reference's HNSW index build (vector/index.rs): LSH
  * hyperplane bucketing or an IVF codebook + cell assignment. The built
  * artifact is a bucketed DataFrame (and codebook for IVF) that the
  * Knn/Ivf query paths consume.
  */
object VectorIndexes {

  final case class VectorIndex(name: String, method: String, label: String,
      prop: String, buckets: DataFrame, model: Option[Ivf.Model],
      hnsw: Option[org.apache.spark.rdd.RDD[Hnsw.Index]] = None,
      vectors: DataFrame = null, idCol: String = "id",
      options: Map[String, Int] = Map.empty, dim: Int = 0,
      metric: String = "cosine") {
    /** One-row DDL result (name, method, entries) — what `gql()` returns. */
    def summary: DataFrame = {
      val spark = buckets.sparkSession
      import spark.implicits._
      Seq((name, method, buckets.count())).toDF("index_name", "method", "entries")
    }

    /** Sampled recall@`k` of this index against exact brute force: the
      * build-time self-check the reference documents as ef-tuning guidance
      * (performance.md:124-131). `nQueries` indexed vectors query their own
      * corpus; the overlap of the index's top-k with the exact top-k is the
      * estimate. Distributed (one broadcast-sample scan of the corpus per
      * side) and bounded: only the ≤ nQueries·k (qid, nid) pairs collect.
      */
    def estimateRecall(nQueries: Int = 100, k: Int = 10): Double = {
      val qs = vectors.select(col(idCol).as("rqid"), col(prop).as("rqvec"))
        .limit(nQueries)
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val m = metric match {
        case "l2" | "euclidean" => Knn.Euclidean
        case "dot" | "ip"       => Knn.Dot
        case _                  => Knn.Cosine
      }
      val truth = pairs(Knn.bruteForceTopK(qs, "rqid", "rqvec",
        vectors, idCol, prop, k, m))
      if (truth.isEmpty) 1.0
      else (truth & pairs(search(qs, "rqid", "rqvec", k))).size.toDouble / truth.size
    }

    /** Tuning advice when a measured recall is below `floor` — the
      * CLI prints this at `index create` so a user who picked LSH defaults
      * on isotropic embeddings (measured recall@10 as low as 0.07,
      * scale/RECALL.txt) learns it at BUILD time, not in production.
      */
    def recallAdvice(recall: Double, floor: Double = 0.9): Option[String] =
      if (recall >= floor) None
      else Some(f"estimated recall@10 = $recall%.2f is below $floor%.2f. " + (method match {
        case "lsh" =>
          val t = options.getOrElse("tables", 3)
          s"LSH on isotropic embeddings needs more tables/probes (try " +
            s"tables ${t * 4}, probes 1) or fewer bits; for high recall " +
            "use --method=hnsw (measured recall@10 = 1.0 at efsearch 64)"
        case "ivf" =>
          val np = options.getOrElse("nprobe", 3)
          s"increase nprobe (try ${math.max(np * 2, 8)}) or lower nlist; " +
            "for high recall use --method=hnsw"
        case _ =>
          val ef = options.getOrElse("efsearch", 64)
          s"increase efsearch (try ${ef * 2}) or m/efconstruction"
      }))

    /** db.vector_search over this registered index (reference
      * database.rs:1128; batch form database.rs:1220 — a multi-row `queries`
      * frame IS the batch). Output contract matches [[Knn.bruteForceTopK]]:
      * (qid, nid, score, rank). LSH/IVF score only candidates colliding
      * with the STORED corpus assignment (the point of registering), HNSW
      * searches the stored graphs.
      */
    def search(queries: DataFrame, qIdCol: String, qVecCol: String,
        k: Int, minScore: Option[Double] = None,
        maxDist: Option[Double] = None): DataFrame = {
      def merge(cands: DataFrame): DataFrame = Knn.rankTopK(cands
        .filter(col("__qid") =!= col("__nid"))
        .select(col("__qid"), col("__nid"),
          round(graft.functions.VectorFunctions.cosineSimilarity(
            col("__qvec"), col("__nvec")), 6).as("__score"))
        .distinct(), k)
      val raw = method match {
        case "hnsw" =>
          Hnsw.searchIndex(hnsw.get, queries, qIdCol, qVecCol, k)
        case "lsh" =>
          val bits = options.getOrElse("bits", 12)
          val tables = options.getOrElse("tables", 3)
          val probes = options.getOrElse("probes", 0)
          val qb = Knn.lshBuckets(
              queries.select(col(qIdCol).as("__qid"), col(qVecCol).as("__qvec")),
              "__qvec", dim, bits, tables, probes = probes)
            .select(col("__qid"), col("__qvec"), explode(col("__buckets")).as("bucket"))
          val cands = buckets.withColumnRenamed(idCol, "__nid")
            .join(broadcast(qb), Seq("bucket"))
            .join(vectors.select(col(idCol).as("__nid"), col(prop).as("__nvec")), "__nid")
          merge(cands)
        case "ivf" =>
          val nprobe = options.getOrElse("nprobe", 3)
          val q = queries.select(col(qIdCol).as("__qid"), col(qVecCol).as("__qvec"),
            explode(model.get.probeCells(col(qVecCol), nprobe)).as("bucket"))
          val cands = buckets.withColumnRenamed(idCol, "__nid")
            .join(broadcast(q), Seq("bucket"))
            .join(vectors.select(col(idCol).as("__nid"), col(prop).as("__nvec")), "__nid")
          merge(cands)
      }
      // VectorScan thresholds (reference scan_vector.rs:61-63
      // min_similarity / max_distance): scores follow the higher-is-closer
      // convention, so min_similarity is always score >= v; max_distance
      // depends on the metric's score convention — cosine scores are
      // SIMILARITIES (distance = 1 − similarity, so the filter is
      // score >= 1 − v), l1/l2 scores are negated distances (score >= −v),
      // and dot has no distance interpretation at all (rejected).
      val bySim = minScore.map(v => raw.filter(col("score") >= v)).getOrElse(raw)
      maxDist.map { v =>
        metric match {
          case "cosine" => bySim.filter(col("score") >= 1 - v)
          case "dot" | "ip" => throw new IllegalArgumentException(
            "max_distance is not defined for the dot-product metric (scores are unbounded similarities)")
          case _ => bySim.filter(col("score") >= -v)
        }
      }.getOrElse(bySim)
    }
  }

  /** Build the index over `vectors` (idCol + the statement's prop column).
    * LSH options: bits (default 12), tables (3); IVF options: nlist (16),
    * iters (3).
    */
  def create(stmt: GqlCreateVectorIndex, vectors: DataFrame,
      idCol: String): VectorIndex = {
    val dim = vectors.select(size(col(stmt.prop))).first().getInt(0)
    stmt.method match {
      case "lsh" =>
        val bits = stmt.options.getOrElse("bits", 12)
        val tables = stmt.options.getOrElse("tables", 3)
        val b = Knn.lshBuckets(vectors.select(col(idCol), col(stmt.prop)),
            stmt.prop, dim, bits, tables)
          .select(col(idCol), explode(col("__buckets")).as("bucket"))
          .persist()
        VectorIndex(stmt.name, "lsh", stmt.label, stmt.prop, b, None, None,
          vectors, idCol, stmt.options, dim)
      case "ivf" =>
        val nlist = stmt.options.getOrElse("nlist", 16)
        val iters = stmt.options.getOrElse("iters", 3)
        val model = Ivf.fit(vectors, idCol, stmt.prop, nlist, iters)
        val b = vectors
          .select(col(idCol), model.cellOf(col(stmt.prop)).as("bucket"))
          .persist()
        VectorIndex(stmt.name, "ivf", stmt.label, stmt.prop, b, Some(model),
          None, vectors, idCol, stmt.options, dim)
      case "hnsw" =>
        // the reference's own index structure (hnsw.rs), one graph per
        // corpus partition persisted in executor storage (graft.vector.Hnsw)
        val m = stmt.options.getOrElse("m", 16)
        val efc = stmt.options.getOrElse("efconstruction", 100)
        val metric = stmt.metric.getOrElse("cosine") match {
          case "cosine" => Knn.Cosine
          case "l2" | "euclidean" => Knn.Euclidean
          case "dot" | "ip" => Knn.Dot
          case "l1" | "manhattan" => Knn.Manhattan
          case other => throw new IllegalArgumentException(
            s"unknown metric '$other' (cosine|l2|dot|l1)")
        }
        val idxRdd = Hnsw.build(vectors.select(col(idCol), col(stmt.prop)),
          idCol, stmt.prop, m, efc, metric)
        val b = vectors.select(col(idCol), lit(0).as("bucket")).persist()
        VectorIndex(stmt.name, "hnsw", stmt.label, stmt.prop, b, None,
          Some(idxRdd), vectors, idCol, stmt.options, dim,
          metric = stmt.metric.getOrElse("cosine"))
    }
  }

  /** Auto-tune an LSH build from its own measured recall curve (reference
    * documents the manual version of this loop as ef-tuning guidance,
    * performance.md:124-131; r16 added the measurement + advice — this is
    * the advice APPLIED). Each step re-builds with recall-raising moves in
    * the directions the curve responds to — halve the hyperplane bits
    * (wider buckets → more true neighbors collide) and double the table
    * count (more independent chances to collide) — measures, and stops at
    * the first configuration clearing `floor`, returning the best seen
    * otherwise. Bounded: ≤ maxSteps+1 builds, each recall estimate samples
    * nQueries vectors (never the corpus). Behind the CLI's `--auto-tune`
    * flag — an explicit opt-in, because each step re-bucketing a 100 TB
    * corpus is a real cost the user must choose.
    */
  def autoTuneLsh(stmt: GqlCreateVectorIndex, vectors: DataFrame,
      idCol: String, floor: Double = 0.9, maxSteps: Int = 3)
      : (VectorIndex, Double, Seq[(Int, Int, Double)]) = {
    require(stmt.method == "lsh", s"autoTuneLsh got method '${stmt.method}'")
    var bits = stmt.options.getOrElse("bits", 12)
    var tables = stmt.options.getOrElse("tables", 3)
    val history = Vector.newBuilder[(Int, Int, Double)]
    var best: (VectorIndex, Double) = null
    var step = 0
    var done = false
    while (!done) {
      val idx = create(stmt.copy(options =
        stmt.options + ("bits" -> bits) + ("tables" -> tables)), vectors, idCol)
      val r = idx.estimateRecall()
      history += ((bits, tables, r))
      if (best == null || r > best._2) {
        if (best != null) best._1.buckets.unpersist()
        best = (idx, r)
      } else idx.buckets.unpersist()
      done = r >= floor || step >= maxSteps ||
        (bits == 2 && tables >= 32) // the curve has nowhere left to move
      bits = math.max(bits / 2, 2)
      tables = math.min(tables * 2, 32)
      step += 1
    }
    (best._1, best._2, history.result())
  }

  /** Persist a registered index — the durable half of the
    * `CREATE VECTOR INDEX` lifecycle across PROCESSES (the reference
    * serializes its indexes with the database, vector/index.rs; the
    * in-session registry here dies with the JVM). Everything the
    * deterministic search path needs round-trips: the stored corpus
    * assignment (`buckets/`), the IVF codebook (`centroids/`), the HNSW
    * graphs (`hnsw/`, [[Hnsw.save]]), and a one-row `meta/` record. The
    * LSH hyperplanes are seed-derived ([[Knn.lshBuckets]] seed=42), so
    * the stored options alone reconstruct the query-side bucketing.
    */
  def save(idx: VectorIndex, path: String): Unit = {
    val spark = idx.buckets.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    idx.method match {
      case "hnsw" => Hnsw.save(idx.hnsw.get, s"$path/hnsw")
      case _ => idx.buckets.write.mode(SaveMode.Overwrite)
        .parquet(s"$path/buckets")
    }
    idx.model.foreach { m =>
      m.centroids.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("cell", "centroid").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    }
    Seq((idx.name, idx.method, idx.label, idx.prop, idx.idCol, idx.dim,
        idx.metric, idx.options))
      .toDF("name", "method", "label", "prop", "id_col", "dim", "metric",
        "options")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** Load a [[save]]d index as a re-registerable [[VectorIndex]].
    * `vectors` must be the corpus frame the index was built over (LSH/IVF
    * score candidates against it; HNSW carries its own copies) — callers
    * read it back from the store the index lives beside. Search results
    * are identical to the pre-save index: LSH/IVF serve candidates from
    * the STORED assignment, HNSW from the round-tripped graphs.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      vectors: DataFrame): VectorIndex = {
    val m = spark.read.parquet(s"$path/meta").first()
    val (name, method) = (m.getAs[String]("name"), m.getAs[String]("method"))
    val (label, prop) = (m.getAs[String]("label"), m.getAs[String]("prop"))
    val idCol = m.getAs[String]("id_col")
    val dim = m.getAs[Int]("dim")
    val metric = m.getAs[String]("metric")
    val options = m.getAs[Map[String, Int]]("options")
    method match {
      case "hnsw" =>
        val h = Hnsw.load(spark, s"$path/hnsw")
        VectorIndex(name, method, label, prop,
          vectors.select(col(idCol), lit(0).as("bucket")), None, Some(h),
          vectors, idCol, options, dim, metric)
      case "ivf" =>
        val cents = spark.read.parquet(s"$path/centroids").collect()
          .sortBy(_.getAs[Int]("cell"))
          .map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq).toSeq
        VectorIndex(name, method, label, prop,
          spark.read.parquet(s"$path/buckets"), Some(Ivf.Model(cents)), None,
          vectors, idCol, options, dim, metric)
      case _ =>
        VectorIndex(name, method, label, prop,
          spark.read.parquet(s"$path/buckets"), None, None,
          vectors, idCol, options, dim, metric)
    }
  }
}
