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
  *   graft.tools.Cli compact <store> [--dry-run]
  */
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
    try run(spark, pos.toSeq, json, limit, flag, flagVal)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, pos: Seq[String], json: Boolean,
      limit: Int, flag: String => Boolean,
      flagVal: String => Option[String]): Unit = pos match {

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

    case Seq("stats", store) =>
      render(graft.graph.Admin.stats(openStore(spark, store)), json, limit)

    case Seq("schema", store) =>
      render(graft.graph.Admin.schemaInfo(openStore(spark, store)), json, limit)

    case Seq("validate", store) =>
      val v = graft.graph.Admin.validate(openStore(spark, store))
      render(v, json, limit)
      // exit code reflects ERRORS only — warning-kind rows (e.g. a
      // legitimate node-only store's NO_EDGES notice) must not make
      // scripts treat a healthy store as corrupt
      val issues = v.filter(col("kind") === "error" && col("n") > 0).count()
      if (issues > 0) {
        System.err.println(s"[cli] validate: $issues error kind(s) found")
        sys.exit(1)
      }

    case Seq("query", store, q) =>
      val sess = new graft.GraftSession(spark, openStore(spark, store))
      val df = flagVal("lang").getOrElse("cypher") match {
        case "cypher"  => sess.cypher(q)
        case "gql"     => sess.gql(q)
        case "gremlin" => sess.gremlin(q)
        case "graphql" => sess.graphql(q)
        case other => throw new IllegalArgumentException(s"unknown lang '$other'")
      }
      render(df, json, limit)

    // backup = a self-contained portable snapshot of the head epoch
    // (reference backup.rs creates a native snapshot file; the Spark-native
    // portable form is the documented save() parquet layout)
    case Seq("backup", "create", store, out) =>
      GraphIO.save(openStore(spark, store), out)
      println(s"[cli] backup written to $out")

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

    case Seq("data", "dump", store, out) =>
      val g = openStore(spark, store)
      flagVal("format").getOrElse("parquet") match {
        case "parquet" => GraphIO.save(g, out)
        case "csv"     => GraphIO.toCsv(g, s"$out/nodes", s"$out/edges")
        case "jsonl" =>
          g.nodes.write.mode(SaveMode.Overwrite).json(s"$out/nodes")
          g.edges.write.mode(SaveMode.Overwrite).json(s"$out/edges")
        case other => throw new IllegalArgumentException(s"unknown format '$other'")
      }
      println(s"[cli] dumped to $out")

    case Seq("data", "load", input, store) =>
      val g = flagVal("format").getOrElse("parquet") match {
        case "parquet" => GraphIO.load(spark, input)
        case "csv"     => GraphIO.fromCsv(spark, s"$input/nodes", s"$input/edges")
        case other => throw new IllegalArgumentException(s"unknown format '$other'")
      }
      val epoch = GraphIO.Epochs.commit(g, store)
      println(s"[cli] loaded $input as epoch $epoch of $store")

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
          if (!committed.contains(e)) "claimed-unpublished"
          else if (fs.exists(new org.apache.hadoop.fs.Path(s"$store/e$e/_delta")))
            "delta"
          else "full"
        (e, kind)
      }
      render(rows.toDF("epoch", "kind"), json, limit)

    case Seq("wal", "checkpoint", store) =>
      // bound the delta-replay chain: commit the head as a fresh FULL
      // snapshot (the epoch log's analog of a WAL checkpoint)
      val epoch = GraphIO.Epochs.commit(
        GraphIO.Epochs.latest(spark, store), store)
      println(s"[cli] checkpoint: full snapshot committed as epoch $epoch")

    case Seq("compact", store) =>
      // reclaim old versions (reference compact.rs): first COMMIT the
      // folded head as a fresh full snapshot — the store is valid at
      // every step, so a crash mid-compact can never destroy it — then
      // prune every older epoch dir and marker. Epoch numbering is
      // preserved (pruned epochs are simply no longer readable); the
      // _cdc outbox and any consumer checkpoints are untouched.
      val epochs = GraphIO.Epochs.list(spark, store)
      require(epochs.nonEmpty, s"no committed epochs at $store")
      if (flag("dry-run"))
        println(s"[cli] compact would fold ${epochs.size} epochs of $store " +
          s"into one full snapshot and prune the ${epochs.size} older dirs")
      else {
        val kept = GraphIO.Epochs.commit(GraphIO.Epochs.latest(spark, store), store)
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        epochs.foreach { e =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$store/e$e"), true)
          fs.delete(new org.apache.hadoop.fs.Path(s"$store/_epochs/$e"), false)
        }
        println(s"[cli] compacted ${epochs.size} epochs into epoch $kept")
      }

    case other =>
      System.err.println(
        s"""[cli] unknown command: ${other.mkString(" ")}
           |commands: info | stats | schema | validate | query |
           |          backup create|restore | data dump|load |
           |          wal status|checkpoint | compact""".stripMargin)
      sys.exit(2)
  }
}
