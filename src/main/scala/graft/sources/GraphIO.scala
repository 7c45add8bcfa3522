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

  /** Write-side partition shrink for small frames. A snapshot or delta of
    * a small (sub)graph otherwise inherits the session's shuffle/scan
    * partitioning and writes ~32 near-empty parquet files per dir — each
    * paying a writer init + footer on write and a footer read on every
    * reload. Collapse to ONE file only when the optimizer's size estimate
    * says the whole frame fits comfortably inside a quarter of one scan
    * split (maxPartitionBytes): an overestimate merely keeps extra files,
    * and frames that might be large are left untouched, so a corpus-scale
    * epoch write keeps its full parallelism (coalesce would also serialize
    * the upstream compute of a narrow chain — acceptable only when the
    * frame is provably tiny).
    */
  private[graft] def shrinkForWrite(df: DataFrame): DataFrame = {
    // analyzed (not optimized) stats: every Dataset is analyzed at
    // construction, so this estimate is free — asking for optimizedPlan
    // here would run the whole optimizer a second time per write (the
    // write plans its own copy), which measurably costs more than the
    // shrink saves on diff-shaped feed frames. Analyzed estimates skip
    // column pruning, so they only ever read LARGER → fewer shrinks, never
    // a wrong one.
    // Two plan shapes are known to UNDER-estimate (the "only ever larger"
    // premise above holds for pruning, not for these): Generate (explode)
    // keeps the child's size while multiplying rows — never shrink those —
    // and width-based non-leaf estimates price Array/Map columns at
    // defaultSize, undercounting wide embedding frames by orders of
    // magnitude. An unshrunk small frame costs a few extra footers; a
    // shrunk large frame serializes the whole upstream chain onto one
    // task, so frames carrying array/map columns must clear a 4×-tighter
    // budget (tiny epoch snapshots with a `labels` array still clear it;
    // a corpus-scale embedding frame does not).
    val analyzed = df.queryExecution.analyzed
    val hasGenerate = analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Generate => true
      case _ => false
    }
    if (hasGenerate) return df
    val hasWideCol = df.schema.exists(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => true
      case _: org.apache.spark.sql.types.MapType   => true
      case _ => false
    })
    val est = analyzed.stats.sizeInBytes
    val split = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    // "Provably tiny" means TINY: width-ratio analyzed estimates run well
    // under actual row width (measured 3.4 MB est for the full sf0.1 node
    // set — ~190k rows that serialize to far more), so a split-relative
    // budget alone let whole sf0.1 graph saves collapse to one task (the
    // r15 q_graph_snapshot +0.3 s regression). Cap the budget at 1 MiB
    // (256 KiB for array/map schemas, whose defaultSize pricing
    // undercounts hardest): epoch deltas and claim sidecars — KB-scale
    // frames, the writes this shrink exists for — still clear it; any
    // corpus-shaped frame keeps full write parallelism.
    val cap = if (hasWideCol) 256L * 1024 else 1024L * 1024
    val budget = math.min(split / 4, cap)
    if (est > 0 && est < budget) df.coalesce(1) else df
  }

  // ---- property-graph snapshot ----

  /** Schema manifests ride along with the data: an EMPTY dataset writes no
    * parquet files (only _SUCCESS), so reload would have nothing to infer
    * from — the manifest makes empty nodes/edges round-trip, and fixes the
    * reloaded column order (partitionBy would otherwise move `rel` last).
    */
  private def writeSchema(spark: SparkSession, file: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(schema.json.getBytes("UTF-8"))
    out.close()
  }

  private def readSchema(spark: SparkSession,
      file: String): Option[org.apache.spark.sql.types.StructType] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(new String(bytes, "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** A frame the ANALYZER can prove empty (e.g. `limit(0)`, an empty
    * local relation): its write needs no Spark job at all — the schema
    * manifest carries the schema and a data dir with no part files reads
    * back as empty under an explicit schema. Committing a nodes-only
    * graph (or an empty delta side) otherwise pays a full write job per
    * empty side per commit — pure fixed overhead on the tx/epoch paths.
    */
  private def provablyEmpty(df: DataFrame): Boolean =
    df.queryExecution.analyzed.maxRows.contains(0L)

  private def writeEmptyDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true) // Overwrite semantics, like the write it replaces
    f.mkdirs(p)
    f.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
  }

  def save(g: PropertyGraph, path: String): Unit = {
    val spark = g.nodes.sparkSession
    // independent writes to distinct dirs — overlap them (same pattern as
    // the delta commits; serial execution just stacks fixed job latencies)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(
        if (provablyEmpty(g.nodes)) writeEmptyDir(spark, s"$path/nodes")
        else shrinkForWrite(g.nodes).write.mode(SaveMode.Overwrite)
          .parquet(s"$path/nodes")),
      Future(
        if (provablyEmpty(g.edges)) writeEmptyDir(spark, s"$path/edges")
        else shrinkForWrite(g.edges).write.mode(SaveMode.Overwrite)
          // cluster by rel: expand(rel=…) reloads prune whole files
          .partitionBy("rel").parquet(s"$path/edges")))),
      scala.concurrent.duration.Duration.Inf)
    writeSchema(spark, s"$path/_schema_nodes.json", g.nodes.schema)
    writeSchema(spark, s"$path/_schema_edges.json", g.edges.schema)
  }

  def load(spark: SparkSession, path: String): PropertyGraph = {
    def read(dir: String, schemaFile: String) =
      readSchema(spark, schemaFile) match {
        case Some(s) => spark.read.schema(s).parquet(dir)
        case None    => spark.read.parquet(dir) // pre-manifest snapshots
      }
    PropertyGraph(
      read(s"$path/nodes", s"$path/_schema_nodes.json"),
      read(s"$path/edges", s"$path/_schema_edges.json"))
  }

  // ---- bucketed store (co-located expand joins) ----

  /** Save the graph BUCKETED on its join keys — nodes by `id`, edges by
    * `src`, the same bucket count, both sorted within buckets — into the
    * session catalog at `location`. Bucketing is the Spark-native answer to
    * the reference's adjacency clustering (graph/lpg/store.rs keeps
    * per-node out-adjacency): a reloaded graph satisfies expand joins
    * (`edges.src = nodes.id`) and out-out edge chains with NO exchange on
    * either side — the per-query shuffle of the whole store that dominates
    * traversal cost at 100 TB is paid ONCE at write time. One clustering
    * cannot co-locate both endpoints (the classic graph-partitioning
    * tradeoff), so like the reference's optional BACKWARD adjacency
    * (graph/lpg/store.rs:241-246) a mirrored `edges_by_dst` copy — same
    * rows, bucketed+sorted by `dst` — makes in-direction expands
    * exchange-free too, at 2× edge storage (the same price the reference
    * pays for its backward index). Catalog metadata lives in the session's
    * in-memory catalog here; a deployment keeps the identical layout in a
    * metastore or a table format with clustering metadata.
    */
  def saveBucketed(g: PropertyGraph, db: String, location: String,
      buckets: Int = 32): Unit = {
    val spark = g.nodes.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")
    // three independent tables — overlap the writes (same pattern as
    // GraphIO.save: serial execution just stacks fixed job+commit
    // latencies, and at scale the next write's tasks back-fill executors
    // freed by the previous write's tail)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(g.nodes.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "id").sortBy("id").saveAsTable(s"$db.nodes")),
      Future(g.edges.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "src").sortBy("src").saveAsTable(s"$db.edges")),
      Future(g.edges.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "dst").sortBy("dst").saveAsTable(s"$db.edges_by_dst")))),
      scala.concurrent.duration.Duration.Inf)
  }

  /** Reload; the returned graph carries the dst-clustered mirror (when the
    * store has one — pre-r11 stores don't) so in-direction expands are also
    * exchange-free. Any mutation drops the mirror (see
    * [[PropertyGraph.edgesByDst]]).
    */
  def loadBucketed(spark: SparkSession, db: String): PropertyGraph = {
    val g = PropertyGraph(spark.table(s"$db.nodes"), spark.table(s"$db.edges"))
    if (spark.catalog.tableExists(s"$db.edges_by_dst"))
      g.withDstMirror(spark.table(s"$db.edges_by_dst"))
    else g
  }

  // ---- RDF snapshot ----

  // RDF terms are stored in lexical string form (typed literals keep their
  // ^^datatype suffix), so the reload schemas are FIXED — which also makes
  // an EMPTY store round-trip (a partitioned empty write leaves only
  // _SUCCESS, nothing to infer a schema from).
  private def stringSchema(cols: String*): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))

  def saveTriples(g: TripleGraph, path: String): Unit =
    // vertical-partitioning by predicate: a BGP pattern with a bound
    // predicate reads only its own partition directories
    shrinkForWrite(g.triples).write.mode(SaveMode.Overwrite).partitionBy("p")
      .parquet(s"$path/triples")

  def loadTriples(spark: SparkSession, path: String): TripleGraph = {
    val t = spark.read.schema(stringSchema("s", "p", "o")).parquet(s"$path/triples")
    // partitionBy moved `p` to the end; restore canonical (s, p, o) order
    TripleGraph(t.select("s", "p", "o"))
  }

  /** Serialize a triple store as N-Triples text — the reference's
    * Turtle-family dump (admin.rs DumpFormat, grafeo-cli backup/data
    * commands). A distributed text write, one line per triple:
    * subject/predicate as IRIs, object as a quoted literal with `\` and
    * `"` backslash-escaped (QuadStore.load reverses exactly these two,
    * so export → LOAD round-trips term-exact at any scale).
    */
  def exportNTriples(g: TripleGraph, path: String): Unit =
    g.triples.select(concat(
        lit("<"), col("s"), lit("> <"), col("p"), lit("> \""),
        regexp_replace(col("o"), "([\"\\\\])", "\\\\$1"),
        lit("\" .")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** JSON-Lines dump (reference DumpFormat::Json): one `{s, p, o}`
    * object per line — schema-stable, so [[importJsonl]] reads it back
    * with an explicit schema (no inference pass over the corpus).
    */
  def exportJsonl(g: TripleGraph, path: String): Unit =
    g.triples.select("s", "p", "o").write.mode(SaveMode.Overwrite).json(path)

  def importJsonl(spark: SparkSession, path: String): TripleGraph =
    TripleGraph(spark.read.schema(stringSchema("s", "p", "o")).json(path)
      .select("s", "p", "o"))

  // ---- NetworkX-style interchange (reference `as_networkx` adapter,
  // docs/algorithms/link-prediction.md:14, examples/networkx_integration.py;
  // the algorithms the reference runs through that adapter are native here —
  // algos/LinkPrediction, Algos.globalClustering — these exports exist for
  // the remaining "hand the graph to an external library" escape hatch) ----

  /** Distributed edge-list export readable by `networkx.read_edgelist`
    * (one `src<TAB>dst<TAB>rel<TAB>weight` line per edge). Unbounded: the
    * write is a plain distributed text write; collapsing the result into a
    * single-process library is the consumer's decision, not this export's.
    */
  def exportEdgeList(g: PropertyGraph, path: String): Unit =
    g.edges.select(concat_ws("\t",
        col("src"), col("dst"),
        coalesce(col("rel"), lit("")),
        coalesce(col("weight").cast("string"), lit("1.0"))).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Node-link JSON (the `networkx.node_link_graph` / d3 interchange
    * format) for a BOUNDED graph. NetworkX is single-process, so this
    * export is gated like BoundedAlgos: it refuses beyond `maxNodes`
    * nodes or 4× that many edges instead of silently collecting a
    * corpus-scale graph onto the driver.
    */
  def toNodeLinkJson(g: PropertyGraph, maxNodes: Int = 100000): String = {
    import graft.graph.LocalGraph
    require(LocalGraph.atMost(g.nodes, maxNodes),
      s"node-link export bounded to $maxNodes nodes — run the algorithms natively instead")
    require(LocalGraph.atMost(g.edges, 4L * maxNodes),
      s"node-link export bounded to ${4L * maxNodes} edges — run the algorithms natively instead")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val nodes = g.nodes.select(col("id"), col("labels")).collect().map { r =>
      val labels = Option(r.getSeq[String](1)).getOrElse(Seq.empty)
      s"""{"id":${r.getLong(0)},"labels":[${labels.map(l => "\"" + esc(l) + "\"").mkString(",")}]}"""
    }
    val links = g.edges
      .select(col("src"), col("dst"), col("rel"),
        coalesce(col("weight"), lit(1.0)).as("weight"))
      .collect().map { r =>
        val rel = Option(r.getString(2)).map(v => "\"" + esc(v) + "\"").getOrElse("null")
        s"""{"source":${r.getLong(0)},"target":${r.getLong(1)},"rel":$rel,"weight":${r.getDouble(3)}}"""
      }
    s"""{"directed":true,"multigraph":true,"nodes":[${nodes.mkString(",")}],"links":[${links.mkString(",")}]}"""
  }

  def saveQuads(q: QuadStore, path: String): Unit =
    shrinkForWrite(q.quads).write.mode(SaveMode.Overwrite).partitionBy("g")
      .parquet(s"$path/quads")

  def loadQuads(spark: SparkSession, path: String): QuadStore =
    QuadStore(spark.read.schema(stringSchema("g", "s", "p", "o"))
      .parquet(s"$path/quads").select("g", "s", "p", "o"))

  // ---- epoch-versioned snapshots: MVCC as-of reads ----

  /** Epoch-versioned snapshot store (reference mvcc.rs:16-75 version chains
    * + transaction/manager.rs commit sequencing, recast Spark-native): each
    * commit writes a self-contained immutable epoch directory
    *
    *   <path>/e<N>/{nodes,edges}/   (the [[save]] layout)
    *   <path>/_epochs/<N>           (zero-byte commit marker)
    *
    * and `asOf(epoch)` reads exactly that epoch — snapshot-isolation reads
    * with no locks, the table-format pattern (Delta/Iceberg) SURVEY §7.2
    * maps MVCC to. Two-phase optimistic commit, exactly the reference's
    * commit-time conflict shape: (1) CLAIM the epoch number with an atomic
    * create-exclusive marker — losers bump the number and retry, so no two
    * writers ever touch the same data directory; (2) write the data;
    * (3) PUBLISH with a second marker. Readers list only published
    * markers, so a crashed writer leaves an unpublished claim that no
    * read path touches (a skipped number, never a torn snapshot).
    */
  object Epochs {
    private def fs(spark: SparkSession, path: String) =
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def marks(spark: SparkSession, path: String, sub: String): Seq[Long] = {
      val dir = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val f = fs(spark, path)
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq
        .map(_.getPath.getName).flatMap(n => scala.util.Try(n.toLong).toOption)
        .sorted
    }

    /** Committed (published) epoch numbers, ascending (empty if none). */
    def list(spark: SparkSession, path: String): Seq[Long] =
      marks(spark, path, "_epochs")

    /** Commit `g` as the next epoch; returns the epoch number. */
    def commit(g: PropertyGraph, path: String): Long =
      claimAndPublish(g.nodes.sparkSession, path)(dir => save(g, dir))

    /** [[commit]] + the write-set sidecar in ONE claim window: the sidecar
      * parquet is independent data under the same `e<N>/`, so it rides the
      * concurrent write wave with the nodes/edges dirs — a tracked commit
      * pays no extra wall for its sidecar. Writing it BEFORE publish also
      * tightens semantics vs the post-publish best-effort record: a failed
      * sidecar write fails the whole commit while the epoch is still
      * unpublished (a skipped claim number, safe to retry), never a
      * published epoch whose sidecar silently vanished.
      *
      * `flat` is the [[flatKeys]]-layout key frame. It is written AS GIVEN:
      * no dedup, no extra shuffle — duplicates are harmless to every
      * consumer (validation/merge are semi/anti joins, which ignore key
      * multiplicity), and keeping the plan shuffle-free is what holds a
      * tracked commit's sidecar to ONE job under AQE (the r16 `.distinct()`
      * pair here cost two shuffle-stage jobs per commit — the measured
      * q_tx_conflict regression).
      */
    def commitWithWriteSet(g: PropertyGraph, path: String,
        flat: DataFrame): Long =
      claimAndPublish(g.nodes.sparkSession, path) { dir =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val ws = Future(flat.coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/writeset"))
        save(g, dir) // overlaps its own nodes/edges writes
        Await.result(ws, scala.concurrent.duration.Duration.Inf)
      }

    /** Node ids + edge keys as ONE flat kind-tagged frame (the writeset
      * sidecar layout; key columns never collide across kinds). Shared by
      * the sidecar writer and the OCC validator's single-pass overlap
      * check.
      */
    def flatKeys(nodeKeys: DataFrame, edgeKeys: DataFrame): DataFrame =
      nodeKeys.select(lit("n").as("kind"), col("id").cast("long").as("id"),
          lit(null).cast("long").as("src"), lit(null).cast("long").as("dst"),
          lit(null).cast("string").as("rel"))
        .unionByName(edgeKeys.select(lit("e").as("kind"),
          lit(null).cast("long").as("id"), col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("rel").cast("string").as("rel")))

    /** The changed-entity keys of one committed epoch, when recoverable
      * WITHOUT diffing snapshots: the [[commitWithWriteSet]] sidecar, or a
      * delta epoch's own change rows (the delta IS the write set). None
      * for plain full commits — the validator falls back to the snapshot
      * diff for intervals containing one. Returns (node ids as `id`,
      * edge keys as `src, dst, rel`).
      */
    /** [[epochWriteSet]] in the flat [[flatKeys]] layout — the validator's
      * working shape (one overlap join over all kinds). Skips the
      * per-kind split/re-union round trip, and skips dedup entirely: every
      * consumer is a semi/anti join, for which key multiplicity is
      * irrelevant, and a dedup would cost a shuffle per validated epoch.
      */
    def epochFlatWriteSet(spark: SparkSession, path: String,
        epoch: Long): Option[DataFrame] = {
      val dir = s"$path/e$epoch"
      val f = fs(spark, path)
      def ex(p: String) = f.exists(new org.apache.hadoop.fs.Path(p))
      import org.apache.spark.sql.types._
      if (ex(s"$dir/writeset/_SUCCESS")) {
        val schema = StructType(Seq(
          StructField("kind", StringType), StructField("id", LongType),
          StructField("src", LongType), StructField("dst", LongType),
          StructField("rel", StringType)))
        Some(spark.read.schema(schema).parquet(s"$dir/writeset"))
      } else if (ex(s"$dir/_delta")) {
        def side(name: String) = {
          val schema = readSchema(spark, s"$dir/_schema_$name.json").getOrElse(
            throw new IllegalStateException(s"missing $name schema manifest at $dir"))
          spark.read.schema(schema).parquet(s"$dir/$name")
        }
        Some(flatKeys(side("nodes_delta").select("id"),
          side("edges_delta").select("src", "dst", "rel")))
      } else None
    }

    def epochWriteSet(spark: SparkSession, path: String,
        epoch: Long): Option[(DataFrame, DataFrame)] = {
      val dir = s"$path/e$epoch"
      val f = fs(spark, path)
      def ex(p: String) = f.exists(new org.apache.hadoop.fs.Path(p))
      import org.apache.spark.sql.types._
      // the sidecar counts only when its write COMMITTED (_SUCCESS): a
      // commit crashing mid-sidecar-write can leave the bare dir, and
      // (were the epoch later re-claimed and published) reading that
      // back as an EMPTY write set would let a genuinely conflicting
      // transaction pass validation — a lost update. Absent/partial
      // sidecar → None → the validator falls back to the snapshot diff.
      if (ex(s"$dir/writeset/_SUCCESS")) {
        val schema = StructType(Seq(
          StructField("kind", StringType), StructField("id", LongType),
          StructField("src", LongType), StructField("dst", LongType),
          StructField("rel", StringType)))
        val ws = spark.read.schema(schema).parquet(s"$dir/writeset")
        Some((ws.filter(col("kind") === "n").select("id"),
          ws.filter(col("kind") === "e").select("src", "dst", "rel")))
      } else if (ex(s"$dir/_delta")) {
        def side(name: String) = {
          val schema = readSchema(spark, s"$dir/_schema_$name.json").getOrElse(
            throw new IllegalStateException(s"missing $name schema manifest at $dir"))
          spark.read.schema(schema).parquet(s"$dir/$name")
        }
        Some((side("nodes_delta").select("id").distinct(),
          side("edges_delta").select("src", "dst", "rel").distinct()))
      } else None
    }

    /** Delta epoch for a PROPERTY GRAPH — the same O(changed rows) log
      * model as [[commitTriplesDelta]], on the LPG side. Layout:
      * `e<N>/{nodes_delta,edges_delta}` parquet, each with a leading
      * `chg` add|remove column (single write pass per side) plus schema
      * manifests and the `_delta` marker. Change identity is the WHOLE
      * row — a property update is remove(old row) + add(new row) —
      * schema-agnostic, exactly how the triple side treats (s, p, o).
      * Single-writer contract as [[commitTriplesDelta]].
      */
    def commitGraphDelta(spark: SparkSession, path: String,
        nodeAdds: DataFrame, nodeRemoves: DataFrame,
        edgeAdds: DataFrame, edgeRemoves: DataFrame): Long = {
      def tag(add: DataFrame, remove: DataFrame): DataFrame =
        add.select(lit("add").as("chg") +: add.columns.map(col): _*)
          .unionByName(remove.select(
            lit("remove").as("chg") +: remove.columns.map(col): _*))
      commitGraphDeltaTagged(spark, path,
        tag(nodeAdds, nodeRemoves), tag(edgeAdds, edgeRemoves))
    }

    /** [[commitGraphDelta]] taking each side already in the stored tagged
      * layout (`chg` first column) — the [[commitIncremental]] path hands
      * over [[graft.core.RowDiff.diffTagged]] output directly, so each
      * side's diff is ONE grouped pass instead of two anti-joins.
      */
    def commitGraphDeltaTagged(spark: SparkSession, path: String,
        nodeDelta: DataFrame, edgeDelta: DataFrame): Long = {
      require(list(spark, path).nonEmpty,
        s"delta epoch needs a base epoch at $path")
      claimAndPublish(spark, path) { dir =>
        val nd = nodeDelta
        val ed = edgeDelta
        // node and edge delta writes are independent jobs — run them
        // concurrently (the diffs are each a pair of anti-joins; serial
        // execution just stacks their fixed job latencies)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.sequence(Seq(
          Future(shrinkForWrite(nd).write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/nodes_delta")),
          Future(shrinkForWrite(ed).write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/edges_delta")))),
          scala.concurrent.duration.Duration.Inf)
        writeSchema(spark, s"$dir/_schema_nodes_delta.json", nd.schema)
        writeSchema(spark, s"$dir/_schema_edges_delta.json", ed.schema)
        val f = fs(spark, path)
        f.create(new org.apache.hadoop.fs.Path(s"$dir/_delta"), true).close()
      }
    }

    /** Commit `g` as the next LPG epoch, writing a delta against the
      * current latest (whole-row anti-join diffs on both sides) and a
      * bounding full snapshot on the first commit or every `fullEvery`-th
      * epoch number — mirrors [[commitTriplesIncremental]].
      *
      * `prevGraph`: the caller's in-memory copy of the CURRENT epoch head
      * (i.e. exactly what the latest committed epoch reads back as). When
      * supplied, the delta diffs run against it directly instead of
      * re-reading the head from parquet — the steady-state CDC producer
      * always has it (it just committed it), and skipping the read-back
      * removes a fixed replay cost per commit. Same single-writer contract
      * as the delta itself; a stale prevGraph produces a wrong delta.
      */
    def commitIncremental(g: PropertyGraph, path: String,
        fullEvery: Int = 10,
        prevGraph: Option[PropertyGraph] = None): Long = {
      val spark = g.nodes.sparkSession
      val es = list(spark, path)
      if (es.isEmpty || (es.last + 1) % fullEvery == 0) commit(g, path)
      else {
        val prev = prevGraph.getOrElse(asOf(spark, path, es.last))
        // RowDiff: null-safe whole-row diffs that tolerate map-typed props
        // columns and schema evolution between epochs (both sides are
        // aligned to the union of columns, so the delta parquet carries
        // the evolved schema and replay stays consistent). diffTagged
        // computes BOTH directions of each side in one grouped pass —
        // half the exchanges of the former per-direction anti-join pairs.
        commitGraphDeltaTagged(spark, path,
          nodeDelta = graft.core.RowDiff.diffTagged(prev.nodes, g.nodes),
          edgeDelta = graft.core.RowDiff.diffTagged(prev.edges, g.edges))
      }
    }

    /** Change data feed between two committed LPG epochs: one row per
      * changed node (`diffNodes`) / edge (`diffEdges`), tagged add |
      * remove going `from` → `to` — downstream consumers read the delta,
      * not the corpus (mirrors [[diffTriples]]).
      */
    def diffNodes(spark: SparkSession, path: String,
        from: Long, to: Long): DataFrame =
      deltaFeed(spark, path, from, to, "nodes_delta").getOrElse(
        cdf(asOf(spark, path, from).nodes, asOf(spark, path, to).nodes))

    def diffEdges(spark: SparkSession, path: String,
        from: Long, to: Long): DataFrame =
      deltaFeed(spark, path, from, to, "edges_delta").getOrElse(
        cdf(asOf(spark, path, from).edges, asOf(spark, path, to).edges))

    /** Change-feed fast path: when `to` is a DELTA epoch and `from` is the
      * epoch immediately before it, the stored delta IS the feed (it was
      * computed as exactly these add/remove rows at commit time) — read it
      * back instead of replaying both snapshots and re-diffing the corpus.
      * O(changed rows) vs O(store); at 100 TB the difference between a
      * delta-dir read and two full scans per feed poll.
      */
    /** `to` is a DELTA epoch whose immediate predecessor in the commit log
      * is `from` — the condition under which the delta rows stored at
      * commit time ARE the from→to change feed. Shared by the LPG and
      * triple feeds so the adjacency rule can only ever change in one
      * place.
      */
    private def adjacentDelta(spark: SparkSession, path: String,
        es: Seq[Long], from: Long, to: Long): Boolean =
      es.contains(from) && es.contains(to) && from < to &&
        isDelta(spark, path, to) && es.filter(_ < to).lastOption.contains(from)

    private def deltaFeed(spark: SparkSession, path: String, from: Long,
        to: Long, side: String): Option[DataFrame] = {
      val es = list(spark, path)
      if (!adjacentDelta(spark, path, es, from, to))
        None
      else {
        val dir = s"$path/e$to"
        readSchema(spark, s"$dir/_schema_$side.json").map { schema =>
          val d = spark.read.schema(schema).parquet(s"$dir/$side")
          val k = d.columns.filterNot(_ == "chg").toSeq
          d.select(col("chg").as("change") +: k.map(col): _*)
        }
      }
    }

    /** add|remove-tagged change rows a → b via [[graft.core.RowDiff]]
      * (map-props-safe, schema-evolution-safe, null-safe) */
    private def cdf(a: DataFrame, b: DataFrame): DataFrame =
      graft.core.RowDiff.diffTagged(a, b, chgCol = "change")

    /** Epoch-commit an RDF triple store — Delta-style time travel for the
      * SPARQL side: each LOAD/Modify result lands as an immutable epoch,
      * [[asOfTriples]] reads any committed one.
      */
    def commitTriples(g: TripleGraph, path: String): Long =
      claimAndPublish(g.triples.sparkSession, path)(dir => saveTriples(g, dir))

    /** Write a DELTA epoch: only `adds` and `removes` relative to the
      * previous epoch are persisted (layout `e<N>/delta` with a `chg`
      * add|remove column plus an `_delta` marker, written in ONE pass),
      * so commit I/O is O(changed rows), not O(corpus) —
      * the table-format economics at 100 TB, where a full snapshot per
      * commit is the difference between seconds and hours. [[asOfTriples]]
      * replays deltas forward from the nearest full snapshot; bound the
      * chain with [[commitTriplesIncremental]]'s periodic full snapshots.
      *
      * Contract: `adds` must be disjoint from the current state and
      * `removes` a subset of it (INSERT/DELETE semantics upstream already
      * guarantee both) — the replay does not re-distinct the corpus.
      * Delta commits assume a SINGLE writer per store: a delta is
      * meaningful only against the epoch it was computed from, which
      * concurrent claimers could displace. Full [[commitTriples]] commits
      * remain safe under concurrency.
      */
    def commitTriplesDelta(spark: SparkSession, path: String,
        adds: DataFrame, removes: DataFrame): Long = {
      require(list(spark, path).nonEmpty,
        s"delta epoch needs a base epoch at $path")
      // single write action: both change sets land in one pass over the
      // store (two separate writes would evaluate the diff twice). ONE
      // distinct over the tagged union — a duplicated add row would
      // double-apply on replay, and deduping here (chg in the key, so
      // sides can't collapse into each other) costs one exchange instead
      // of one per side, letting producers hand over bag-semantics
      // deltas (e.g. TripleGraph.modifyWithDelta) without their own
      // distinct.
      commitTriplesDeltaTagged(spark, path,
        adds.select(lit("add").as("chg"), col("s"), col("p"), col("o"))
          .unionByName(removes.select(
            lit("remove").as("chg"), col("s"), col("p"), col("o")))
          .distinct())
    }

    /** [[commitTriplesDelta]] taking the delta already tagged AND already
      * distinct per (chg, s, p, o) — [[commitTriplesIncremental]]'s grouped
      * diff is distinct by construction, so routing it here skips the
      * tagged union's distinct exchange.
      */
    private def commitTriplesDeltaTagged(spark: SparkSession, path: String,
        delta: DataFrame): Long = {
      require(list(spark, path).nonEmpty,
        s"delta epoch needs a base epoch at $path")
      claimAndPublish(spark, path) { dir =>
        shrinkForWrite(delta)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/delta")
        val f = fs(spark, path)
        f.create(new org.apache.hadoop.fs.Path(s"$dir/_delta"), true).close()
      }
    }

    /** Commit `g` as the next epoch, writing a DELTA against the current
      * latest (diff = two hash anti-joins) and a full snapshot on the
      * first commit or every `fullEvery`-th epoch number — bounding every
      * as-of replay to < `fullEvery` delta applications.
      */
    def commitTriplesIncremental(g: TripleGraph, path: String,
        fullEvery: Int = 10,
        prevTriples: Option[TripleGraph] = None): Long = {
      val spark = g.triples.sparkSession
      val es = list(spark, path)
      if (es.isEmpty || (es.last + 1) % fullEvery == 0) commitTriples(g, path)
      else {
        // prevTriples: the caller's in-memory copy of the current epoch
        // head — skips the parquet read-back + delta replay before the
        // diff, exactly like [[commitIncremental]]'s prevGraph (same
        // single-writer contract; a stale prev produces a wrong delta)
        val prev = prevTriples.map(_.triples)
          .getOrElse(asOfTriples(spark, path, es.last).triples)
        // one grouped pass for both directions, distinct by construction
        // (set emission) — was two (s,p,o) anti-joins plus the tagged
        // union's distinct: three exchanges of the corpus down to one
        commitTriplesDeltaTagged(spark, path,
          graft.core.RowDiff.diffTagged(prev.select("s", "p", "o"),
            g.triples.select("s", "p", "o"), bagExact = false))
      }
    }

    private def isDelta(spark: SparkSession, path: String, epoch: Long): Boolean =
      fs(spark, path).exists(
        new org.apache.hadoop.fs.Path(s"$path/e$epoch/_delta"))

    /** Snapshot-isolation read of one committed triple epoch. A delta
      * epoch reconstructs by replaying `acc − removes ∪ adds` forward
      * from the nearest full snapshot — a fold of hash anti-joins whose
      * depth [[commitTriplesIncremental]] bounds.
      */
    def asOfTriples(spark: SparkSession, path: String, epoch: Long): TripleGraph = {
      val es = list(spark, path)
      require(es.contains(epoch), s"epoch $epoch is not committed at $path")
      val upTo = es.filter(_ <= epoch)
      val base = upTo.reverse.find(e => !isDelta(spark, path, e)).getOrElse(
        throw new IllegalStateException(
          s"no full snapshot at or before epoch $epoch at $path"))
      var acc = loadTriples(spark, s"$path/e$base").triples
      val key = Seq("s", "p", "o")
      upTo.filter(_ > base).foreach { e =>
        val delta = spark.read.schema(stringSchema("chg", "s", "p", "o"))
          .parquet(s"$path/e$e/delta")
        val adds = delta.filter(col("chg") === "add").select("s", "p", "o")
        val removes = delta.filter(col("chg") === "remove").select("s", "p", "o")
        acc = acc.join(removes, key, "left_anti").unionByName(adds)
      }
      TripleGraph(acc)
    }

    /** The triple store at the newest committed epoch. */
    def latestTriples(spark: SparkSession, path: String): TripleGraph = {
      val es = list(spark, path)
      require(es.nonEmpty, s"no committed epochs at $path")
      asOfTriples(spark, path, es.last)
    }

    /** Epoch-commit a named-graph quad store (same contract as
      * [[commitTriples]], with the `g` column riding along).
      */
    def commitQuads(q: QuadStore, path: String): Long =
      claimAndPublish(q.quads.sparkSession, path)(dir => saveQuads(q, dir))

    def asOfQuads(spark: SparkSession, path: String, epoch: Long): QuadStore = {
      require(list(spark, path).contains(epoch),
        s"epoch $epoch is not committed at $path")
      loadQuads(spark, s"$path/e$epoch")
    }

    /** Change data feed between two committed triple epochs: one row per
      * triple added or removed going `from` → `to` (`change` ∈ add |
      * remove) — the incremental-processing primitive: downstream jobs
      * consume what changed since their last epoch instead of rescanning
      * the corpus. Two hash anti-joins on the full (s, p, o) key.
      */
    def diffTriples(spark: SparkSession, path: String,
        from: Long, to: Long): DataFrame = {
      // same adjacent-delta fast path as [[diffNodes]]: the stored delta
      // rows are the feed, no snapshot replay or corpus anti-joins
      val es = list(spark, path)
      if (adjacentDelta(spark, path, es, from, to))
        spark.read.schema(stringSchema("chg", "s", "p", "o"))
          .parquet(s"$path/e$to/delta")
          .select(col("chg").as("change"), col("s"), col("p"), col("o"))
      else {
        val a = asOfTriples(spark, path, from).triples
        val b = asOfTriples(spark, path, to).triples
        val key = Seq("s", "p", "o")
        b.join(a, key, "left_anti").withColumn("change", lit("add"))
          .unionByName(a.join(b, key, "left_anti").withColumn("change", lit("remove")))
          .select("change", "s", "p", "o")
      }
    }

    /** The shared claim→write→publish core: `write` persists the payload
      * into the claimed epoch directory, whatever the payload's shape.
      *
      * In-JVM writers serialize the WHOLE sequence: Hadoop's
      * FileOutputCommitter task-attempt bookkeeping is not safe for
      * concurrent same-JVM jobs on some filesystems, and the local
      * ChecksumFileSystem's `create(path, overwrite=false)` is a
      * non-atomic exists-check-then-create — two threads can both "win"
      * the same claim and then collide on the publish marker. CROSS-
      * process writers need no lock on HDFS/object stores whose
      * create-exclusive IS atomic: the claim marker guarantees one writer
      * per epoch directory, and a loser bumps the number and retries.
      */
    private def claimAndPublish(spark: SparkSession, path: String)(
        write: String => Unit): Long = {
      val f = fs(spark, path)
      writeLock.synchronized {
        var epoch = marks(spark, path, "_claims").lastOption.map(_ + 1).getOrElse(0L)
        var claimed = false
        while (!claimed) {
          // atomic create-exclusive claim: owns the number AND its data dir
          try {
            f.create(new org.apache.hadoop.fs.Path(s"$path/_claims/$epoch"), false).close()
            claimed = true
          } catch {
            case _: java.io.IOException =>
              epoch = math.max(epoch + 1,
                marks(spark, path, "_claims").lastOption.map(_ + 1).getOrElse(epoch + 1))
          }
        }
        write(s"$path/e$epoch")
        // publish: the commit point readers observe
        f.create(new org.apache.hadoop.fs.Path(s"$path/_epochs/$epoch"), false).close()
        epoch
      }
    }

    private val writeLock = new Object

    /** Snapshot-isolation read of one committed LPG epoch. A delta epoch
      * replays `acc − removes ∪ adds` per side forward from the nearest
      * full snapshot (mirrors [[asOfTriples]]).
      */
    def asOf(spark: SparkSession, path: String, epoch: Long): PropertyGraph = {
      val es = list(spark, path)
      require(es.contains(epoch), s"epoch $epoch is not committed at $path")
      val upTo = es.filter(_ <= epoch)
      val base = upTo.reverse.find(e => !isDelta(spark, path, e)).getOrElse(
        throw new IllegalStateException(
          s"no full snapshot at or before epoch $epoch at $path"))
      var acc = load(spark, s"$path/e$base")
      upTo.filter(_ > base).foreach { e =>
        val dir = s"$path/e$e"
        def side(name: String, cur: DataFrame): DataFrame = {
          val schema = readSchema(spark, s"$dir/_schema_$name.json").getOrElse(
            throw new IllegalStateException(s"missing $name schema manifest at $dir"))
          val d = spark.read.schema(schema).parquet(s"$dir/$name")
          val adds = d.filter(col("chg") === "add").drop("chg")
          val removes = d.filter(col("chg") === "remove").drop("chg")
          // RowDiff.antiRows (not a name-list join): props map columns and
          // columns introduced by later epochs must not break replay
          graft.core.RowDiff.antiRows(cur, removes)
            .unionByName(adds, allowMissingColumns = true)
        }
        acc = PropertyGraph(
          side("nodes_delta", acc.nodes),
          side("edges_delta", acc.edges))
      }
      acc
    }

    /** The newest committed epoch (delta replay included). */
    def latest(spark: SparkSession, path: String): PropertyGraph = {
      val es = list(spark, path)
      require(es.nonEmpty, s"no committed epochs at $path")
      asOf(spark, path, es.last)
    }
  }

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
