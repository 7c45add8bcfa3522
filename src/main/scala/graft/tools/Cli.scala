package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.sources.GraphIO

/** Command-line surface over an epoch store — the Spark-native analog of
  * the reference's `grafeo` CLI (crates/grafeo-cli/src/main.rs:47-180:
  * info / stats / schema / validate / backup create|restore / data
  * dump|load / wal status|checkpoint / compact), plus a one-shot `query`
  * command in place of the reference's served REPL.
  *
  * A "store" is either an epoch store (`_epochs/` present — commands act
  * on the newest committed epoch) or a plain [[GraphIO.save]] snapshot.
  * WAL analogies are exact in function, not mechanism: the epoch log IS
  * the recovery log, so `wal status` lists epochs/claims and
  * `wal checkpoint` commits a fresh full snapshot at head (bounding
  * delta-replay chains exactly as a WAL checkpoint bounds redo).
  *
  * Usage:
  *   graft.tools.Cli info <store>
  *   graft.tools.Cli stats <store>
  *   graft.tools.Cli schema <store>
  *   graft.tools.Cli validate <store>
  *   graft.tools.Cli query <store> <query> [--lang=cypher|gql|gremlin|graphql] [--json] [--limit=N]
  *   graft.tools.Cli backup create <store> <outDir>
  *   graft.tools.Cli backup restore <backupDir> <store> [--force]
  *   graft.tools.Cli data dump <store> <outDir> [--format=parquet|csv|jsonl]
  *   graft.tools.Cli data load <inputDir> <store> [--format=parquet|csv]
  *   graft.tools.Cli wal status <store>
  *   graft.tools.Cli wal checkpoint <store>
  *   graft.tools.Cli compact <store> [--dry-run] [--force]
  *   graft.tools.Cli index create <store> <name> <label> <prop> [--method=hnsw|lsh|ivf] [--options=k=v,…] [--no-recall-check] [--auto-tune]
  *   graft.tools.Cli index list <store>
  *   graft.tools.Cli index stats <store>
  *
  * `compact` assumes EXCLUSIVE access to the store (the reference's
  * compact is likewise offline, compact.rs): pre-fold epochs become
  * unreadable, so a concurrent reader's `asOf()` or an in-flight OCC
  * commit validating against a pruned base fails loudly mid-flight (no
  * corruption — the store is valid at every step). When unpublished
  * claims newer than the head suggest a live writer, compact refuses
  * unless `--force` acknowledges the exclusivity contract.
  */
/** Bad command-line input — caught by [[Cli.main]] and rendered as a
  * one-line usage message (exit 1). A dedicated type so that
  * IllegalArgumentExceptions thrown by deep library/Spark code propagate
  * with their stack trace instead of masquerading as usage errors.
  */
final class UsageError(msg: String) extends RuntimeException(msg)

object Cli {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def isEpochStore(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_epochs")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The graph a store path denotes: newest epoch of an epoch store, or a
    * plain snapshot directory.
    */
  def openStore(spark: SparkSession, path: String): PropertyGraph =
    if (isEpochStore(spark, path)) GraphIO.Epochs.latest(spark, path)
    else GraphIO.load(spark, path)

  private def render(df: DataFrame, json: Boolean, limit: Int): Unit =
    if (json) df.limit(limit).toJSON.collect().foreach(println)
    else df.show(limit, truncate = false)

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    def flag(name: String): Boolean = flags.contains(s"--$name")
    def flagVal(name: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$name=") =>
        f.stripPrefix(s"--$name=") }
    val json = flag("json")
    val limit = flagVal("limit").map(_.toInt).getOrElse(20)
    val spark = session()
    // run() RETURNS the exit status rather than calling sys.exit itself:
    // System.exit does not unwind the stack, so an exit inside the try
    // would skip the finally and leave Spark's teardown to its shutdown
    // hook
    val code =
      try run(spark, pos.toSeq, json, limit, flag, flagVal)
      catch {
        // bad arguments are a usage error, not a crash: message + exit 1.
        // ONLY the dedicated UsageError is caught — an
        // IllegalArgumentException surfacing from deep library/Spark code
        // is a genuine bug whose stack trace must not be swallowed, so it
        // propagates and crashes loudly like any other exception.
        case e: UsageError =>
          System.err.println(s"[cli] error: ${e.getMessage}"); 1
      }
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Executes one command; returns the process exit status (0 = ok). */
  private[graft] def run(spark: SparkSession, pos: Seq[String], json: Boolean,
      limit: Int, flag: String => Boolean,
      flagVal: String => Option[String]): Int = pos match {

    case Seq("info", store) =>
      val g = openStore(spark, store)
      val epochs = if (isEpochStore(spark, store))
        GraphIO.Epochs.list(spark, store) else Seq.empty
      import spark.implicits._
      render(Seq(
        ("path", store),
        ("mode", if (epochs.nonEmpty) "epoch-store" else "snapshot"),
        ("epochs", epochs.size.toString),
        ("head_epoch", epochs.lastOption.map(_.toString).getOrElse("-")),
        ("nodes", g.nodes.count().toString),
        ("edges", g.edges.count().toString)
      ).toDF("key", "value"), json, limit)
      0

    case Seq("stats", store) =>
      render(graft.graph.Admin.stats(openStore(spark, store)), json, limit)
      0

    case Seq("schema", store) =>
      render(graft.graph.Admin.schemaInfo(openStore(spark, store)), json, limit)
      0

    case Seq("validate", store) =>
      val v = graft.graph.Admin.validate(openStore(spark, store))
      render(v, json, limit)
      // exit code reflects ERRORS only — warning-kind rows (e.g. a
      // legitimate node-only store's NO_EDGES notice) must not make
      // scripts treat a healthy store as corrupt
      val issues = v.filter(col("kind") === "error" && col("n") > 0).count()
      if (issues > 0) {
        System.err.println(s"[cli] validate: $issues error kind(s) found")
        1
      } else 0

    case Seq("query", store, q) =>
      val sess = new graft.GraftSession(spark, openStore(spark, store))
      val df = flagVal("lang").getOrElse("cypher") match {
        case "cypher"  => sess.cypher(q)
        case "gql"     => sess.gql(q)
        case "gremlin" => sess.gremlin(q)
        case "graphql" => sess.graphql(q)
        case other => throw new UsageError(s"unknown lang '$other'")
      }
      render(df, json, limit)
      0

    // backup = a self-contained portable snapshot of the head epoch
    // (reference backup.rs creates a native snapshot file; the Spark-native
    // portable form is the documented save() parquet layout)
    case Seq("backup", "create", store, out) =>
      GraphIO.save(openStore(spark, store), out)
      println(s"[cli] backup written to $out")
      0

    case Seq("backup", "restore", backup, store) =>
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(store)) &&
          fs.listStatus(new org.apache.hadoop.fs.Path(store)).nonEmpty &&
          !flag("force"))
        throw new IllegalStateException(
          s"$store exists and is non-empty; pass --force to overwrite")
      if (flag("force"))
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
      val epoch = GraphIO.Epochs.commit(GraphIO.load(spark, backup), store)
      println(s"[cli] restored backup as epoch $epoch of $store")
      0

    case Seq("data", "dump", store, out) =>
      val g = openStore(spark, store)
      flagVal("format").getOrElse("parquet") match {
        case "parquet" => GraphIO.save(g, out)
        case "csv"     => GraphIO.toCsv(g, s"$out/nodes", s"$out/edges")
        case "jsonl" =>
          g.nodes.write.mode(SaveMode.Overwrite).json(s"$out/nodes")
          g.edges.write.mode(SaveMode.Overwrite).json(s"$out/edges")
        case other => throw new UsageError(s"unknown format '$other'")
      }
      println(s"[cli] dumped to $out")
      0

    case Seq("data", "load", input, store) =>
      val g = flagVal("format").getOrElse("parquet") match {
        case "parquet" => GraphIO.load(spark, input)
        case "csv"     => GraphIO.fromCsv(spark, s"$input/nodes", s"$input/edges")
        case other => throw new UsageError(s"unknown format '$other'")
      }
      val epoch = GraphIO.Epochs.commit(g, store)
      println(s"[cli] loaded $input as epoch $epoch of $store")
      0

    case Seq("wal", "status", store) =>
      import spark.implicits._
      val committed = GraphIO.Epochs.list(spark, store)
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def names(sub: String): Seq[Long] = {
        val d = new org.apache.hadoop.fs.Path(s"$store/$sub")
        if (!fs.exists(d)) Seq.empty
        else fs.listStatus(d).toSeq.map(_.getPath.getName)
          .flatMap(n => scala.util.Try(n.toLong).toOption).sorted
      }
      val claims = names("_claims")
      val rows = claims.map { e =>
        val kind =
          if (!committed.contains(e))
            // Label on EVIDENCE, not position: a leftover e<N> dir with no
            // publish marker is a crashed mid-write commit wherever it
            // sits (investigate it), while a dir-less claim below the
            // oldest readable epoch is benign — either compact pruned the
            // epoch (old stores kept claims) or the commit crashed before
            // writing anything. Dir-less claims at/above the head stay
            // 'claimed-unpublished': a live writer may be about to write.
            if (committed.nonEmpty && e < committed.head &&
                !fs.exists(new org.apache.hadoop.fs.Path(s"$store/e$e")))
              "pruned"
            else "claimed-unpublished"
          else if (fs.exists(new org.apache.hadoop.fs.Path(s"$store/e$e/_delta")))
            "delta"
          else "full"
        (e, kind)
      }
      render(rows.toDF("epoch", "kind"), json, limit)
      0

    case Seq("wal", "checkpoint", store) =>
      // bound the delta-replay chain: commit the head as a fresh FULL
      // snapshot (the epoch log's analog of a WAL checkpoint)
      val epoch = GraphIO.Epochs.commit(
        GraphIO.Epochs.latest(spark, store), store)
      println(s"[cli] checkpoint: full snapshot committed as epoch $epoch")
      0

    case Seq("compact", store) =>
      // reclaim old versions (reference compact.rs): first COMMIT the
      // folded head as a fresh full snapshot — the store is valid at
      // every step, so a crash mid-compact can never destroy it — then
      // prune every older epoch dir, its publish marker, AND its claim
      // marker (a surviving claim with no epoch dir would read as
      // 'claimed-unpublished' in `wal status`, indistinguishable from a
      // crashed commit; numbering stays monotonic via the kept epoch's
      // own claim). Epoch numbering is preserved (pruned epochs are
      // simply no longer readable); the _cdc outbox and any consumer
      // checkpoints are untouched. Compact requires EXCLUSIVE access
      // (see the usage scaladoc): an unpublished claim NEWER than the
      // head is the signature of an in-flight writer, so refuse unless
      // --force acknowledges it.
      val epochs = GraphIO.Epochs.list(spark, store)
      require(epochs.nonEmpty, s"no committed epochs at $store")
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val claimsDir = new org.apache.hadoop.fs.Path(s"$store/_claims")
      val inFlight =
        if (!fs.exists(claimsDir)) Seq.empty[Long]
        else fs.listStatus(claimsDir).toSeq.map(_.getPath.getName)
          .flatMap(n => scala.util.Try(n.toLong).toOption)
          .filter(_ > epochs.last)
      if (inFlight.nonEmpty && !flag("force")) {
        System.err.println(
          s"[cli] compact: unpublished claim(s) ${inFlight.mkString(",")} are " +
            "newer than the head — a writer may be mid-commit. compact " +
            "requires exclusive access; pass --force to proceed anyway")
        1
      } else if (flag("dry-run")) {
        println(s"[cli] compact would fold ${epochs.size} epochs of $store " +
          s"into one full snapshot and prune the ${epochs.size} older dirs")
        0
      } else {
        val kept = GraphIO.Epochs.commit(GraphIO.Epochs.latest(spark, store), store)
        epochs.foreach { e =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$store/e$e"), true)
          fs.delete(new org.apache.hadoop.fs.Path(s"$store/_epochs/$e"), false)
          fs.delete(new org.apache.hadoop.fs.Path(s"$store/_claims/$e"), false)
        }
        println(s"[cli] compacted ${epochs.size} epochs into epoch $kept")
        0
      }

    // index group (reference grafeo-cli IndexCommands, commands/index.rs):
    // `list`/`stats` are read-only views over the persisted `_indexes/`
    // registry; `create` routes through the session's CREATE VECTOR INDEX
    // surface and persists the result so a later process can serve it
    // (VectorIndexes.save/load).
    case Seq("index", "create", store, name, label, prop) =>
      val g = openStore(spark, store)
      val method = flagVal("method").getOrElse("hnsw").toLowerCase
      val opts = flagVal("options").map(_.split(",").toSeq.map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => s"$k $v"
          case _ => throw new UsageError(
            s"--options entry '$kv' is not key=value")
        }
      }.mkString(", ")).map(o => s" OPTIONS($o)").getOrElse("")
      val ddl = s"CREATE VECTOR INDEX $name ON $label($prop) " +
        s"USING ${method.toUpperCase}$opts"
      val vectors = g.nodesWithLabel(label)
        .filter(col(prop).isNotNull).select(col("id"), col(prop))
      if (vectors.isEmpty)
        throw new UsageError(
          s"no $label nodes with a non-null $prop to index")
      val sess = new graft.GraftSession(spark, g)
      // --auto-tune (LSH only): apply the recall advice instead of just
      // printing it — re-build along the measured curve (fewer bits, more
      // tables) until the sampled recall clears 0.9 or the step budget
      // runs out. Explicit opt-in: each step re-buckets the corpus.
      // Rejecting --auto-tune for other methods keeps the recall self-check
      // gate below honest: the skip only fires when the tuner actually ran.
      if (flag("auto-tune") && method != "lsh")
        throw new UsageError(
          s"--auto-tune only supports --method=lsh (got --method=$method)")
      val summary = if (flag("auto-tune") && method == "lsh") {
        val stmt = graft.frontends.gql.GqlFrontend.parseStatement(ddl)
          .asInstanceOf[graft.frontends.gql.GqlCreateVectorIndex]
        val (idx, recall, hist) = graft.frontends.gql.VectorIndexes
          .autoTuneLsh(stmt, vectors, "id")
        sess.registerVectorIndex(idx)
        hist.foreach { case (b, t, r) =>
          println(f"[cli] index $name: auto-tune bits=$b tables=$t -> recall@10 $r%.2f")
        }
        println(f"[cli] index $name: tuned to bits=${idx.options("bits")} " +
          f"tables=${idx.options("tables")} (recall@10 $recall%.2f)")
        idx.summary
      } else sess.createVectorIndex(ddl, vectors, "id")
      val idx = sess.vectorIndex(name).get
      graft.frontends.gql.VectorIndexes.save(idx, s"$store/_indexes/$name")
      // build-time recall self-check (reference performance.md:124-131
      // documents ef-tuning for exactly this): a sampled estimate against
      // brute force, with tuning advice when the configuration measures
      // low — skippable for huge corpora via --no-recall-check
      if (!flag("no-recall-check") && !flag("auto-tune")) {
        val recall = idx.estimateRecall()
        idx.recallAdvice(recall) match {
          case Some(advice) => System.err.println(s"[cli] index $name: WARNING - $advice")
          case None => println(f"[cli] index $name: estimated recall@10 = $recall%.2f")
        }
      }
      render(summary, json, limit)
      0

    case Seq("index", "list", store) =>
      import spark.implicits._
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dir = new org.apache.hadoop.fs.Path(s"$store/_indexes")
      val rows =
        if (!fs.exists(dir)) Seq.empty
        else fs.listStatus(dir).toSeq.filter(_.isDirectory).map { st =>
          val p = st.getPath.toString
          val m = spark.read.parquet(s"$p/meta").first()
          val entries = m.getAs[String]("method") match {
            case "hnsw" => spark.read.parquet(s"$p/hnsw/nodes").count()
            case _ => spark.read.parquet(s"$p/buckets")
              .select(m.getAs[String]("id_col")).distinct().count()
          }
          (m.getAs[String]("name"), m.getAs[String]("method"),
            m.getAs[String]("label"), m.getAs[String]("prop"), entries)
        }
      render(rows.toDF("name", "type", "target", "property", "entries"),
        json, limit)
      0

    case Seq("index", "stats", store) =>
      // reference index.rs:60-73 reports (index count, labels indexed,
      // edge types indexed) from detailed_stats — label/type scans ARE
      // the reference's structural indexes; graft's analog is the
      // label/rel-bucketed store, so the same counts apply
      import spark.implicits._
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dir = new org.apache.hadoop.fs.Path(s"$store/_indexes")
      val nIdx =
        if (!fs.exists(dir)) 0L
        else fs.listStatus(dir).count(_.isDirectory).toLong
      val s = graft.graph.Admin.stats(openStore(spark, store))
        .filter(col("metric").isin("label_count", "edge_type_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      render(Seq(
        ("total_indexes", nIdx),
        ("labels_indexed", s.getOrElse("label_count", 0L)),
        ("edge_types_indexed", s.getOrElse("edge_type_count", 0L))
      ).toDF("metric", "value"), json, limit)
      0

    case other =>
      System.err.println(
        s"""[cli] unknown command: ${other.mkString(" ")}
           |commands: info | stats | schema | validate | query |
           |          backup create|restore | data dump|load |
           |          wal status|checkpoint | compact |
           |          index create|list|stats""".stripMargin)
      2
  }
}
