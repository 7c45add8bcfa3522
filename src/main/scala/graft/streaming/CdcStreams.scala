package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.graph.PropertyGraph
import graft.pipeline.Dedup
import graft.sources.GraphIO.Epochs

/** Epochs CDC → Structured Streaming: the bridge between the MVCC epoch
  * store ([[graft.sources.GraphIO.Epochs]], reference mvcc.rs /
  * transaction/manager.rs) and incremental pipelines.
  *
  * Every [[commitWithFeed]] appends the commit's change rows (`change` ∈
  * add | remove, whole-row identity like the epoch deltas) as NEW immutable
  * parquet files under `<path>/_cdc/{nodes,edges}` — an append-only outbox
  * that `spark.readStream` consumes as a genuine FileStreamSource: each
  * commit's files form the next micro-batch, the stream checkpoint records
  * which commits a consumer has processed, and `Trigger.AvailableNow`
  * turns "process everything committed since my last run" into one
  * self-terminating streaming query. Downstream jobs therefore read the
  * DELTA, never the corpus — the table-format change-data-feed economics
  * at 100 TB.
  *
  * [[incrementalNearDupRun]] drives the existing MinHash-LSH near-dup
  * pipeline ([[graft.pipeline.Dedup.minHashNearDuplicates]]) off that feed
  * incrementally: per micro-batch it signs ONLY the changed documents,
  * band-joins the new signatures against the persisted signature store
  * (candidates = pairs with ≥1 changed member — old×old pairs were
  * emitted by earlier batches), verifies with exact Jaccard, and appends.
  * All state is append-only parquet versioned by the EPOCH each row came
  * from (`sigs/`, `pairs/`, `tombstones/`; the epoch is recovered from the
  * outbox file names, so state stays correct even when Trigger.AvailableNow
  * drains several commits into one micro-batch); liveness at read time is
  * "no tombstone for the id from a STRICTLY later epoch", so document
  * updates (remove + add of the same id in one epoch) retire the stale
  * signature and stale pairs and re-pair the new text in the same pass,
  * and only each id's FINAL text in the drained window ever signs or
  * pairs. (State dirs written by the pre-r16 batch-id-versioned format
  * must be rebuilt — mixed version units would misorder tombstones — and
  * that is ENFORCED: a `_format` version marker is written on first use
  * and a state dir lacking it, or carrying an older version, is refused
  * with an IllegalStateException rather than silently mixed.)
  * [[nearDupPairs]] of the consumed feed ≡ the batch recompute on the
  * epoch head — asserted in CdcStreamsSpec and oracle-checked by
  * q_cdc_neardup.
  */
object CdcStreams {

  private def hfs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean =
    hfs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    if (exists(spark, dir)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Commit `g` as the next epoch (delta when possible, like
    * [[Epochs.commitIncremental]]) AND publish the commit's change rows to
    * the `_cdc` outbox. A delta commit's feed rows are read back from the
    * just-written delta parquet (O(changed rows)); a full-snapshot commit
    * falls back to the epoch diff (first commit: everything is an add).
    */
  def commitWithFeed(g: PropertyGraph, path: String, fullEvery: Int = 10,
      prevGraph: Option[PropertyGraph] = None): Long = {
    val spark = g.nodes.sparkSession
    // finish any promote a previous commit crashed in the middle of: the
    // outbox must never stay PERMANENTLY partial (see [[recoverOutbox]])
    recoverOutbox(spark, path)
    val before = Epochs.list(spark, path)
    // whether the commit will be a delta is a pure function of the epoch
    // numbering (commitIncremental's own gate) — knowing it BEFORE the
    // commit lets the non-delta path overlap the snapshot write with the
    // feed writes below (they touch distinct dirs and the feed diffs only
    // read the PREVIOUS epoch / the caller's frames, never the new one)
    val willDelta = before.nonEmpty && (before.last + 1) % fullEvery != 0

    def allAdd(df: DataFrame): DataFrame =
      df.select(lit("add").as("chg") +: df.columns.map(col): _*)
    // r11 renamed the outbox column change→chg (= the delta schema, so
    // delta publishes are file copies). A pre-r11 outbox would produce a
    // MIXED-schema dir whose reader silently nulls one side's rows —
    // refuse loudly instead; the outbox is derivable state (re-bootstrap
    // a fresh dir and re-run the consumer from a fresh checkpoint).
    def checkFormat(dir: String): Unit = {
      val fs = hfs(spark, dir)
      val out = new org.apache.hadoop.fs.Path(dir)
      if (fs.exists(out) && fs.listStatus(out).exists(_.getPath.getName.startsWith("part-")) &&
          spark.read.parquet(dir).columns.contains("change"))
        throw new IllegalStateException(s"$dir was written by a pre-chg-format " +
          "version; start a new outbox dir (and consumer checkpoint)")
    }
    def writeFeed(full: DataFrame, prevOf: PropertyGraph => DataFrame,
        dir: String, mode: SaveMode): Unit = {
      val feed = before.lastOption match {
        case Some(prev) =>
          val p = prevGraph.getOrElse(Epochs.asOf(spark, path, prev))
          val cur = prevOf(PropertyGraph(g.nodes, g.edges))
          val old = prevOf(p)
          // one grouped pass for both directions (RowDiff.diffTagged) —
          // was a pair of whole-row anti-joins per feed side
          graft.core.RowDiff.diffTagged(old, cur)
            .select(col("chg") +: cur.columns.map(col): _*)
        case None => allAdd(full)
      }
      // feeds are per-epoch diffs — usually tiny; collapse provably-small
      // ones to one file so every downstream feed reader (batch + stream)
      // lists and opens one footer, not one per shuffle partition
      graft.sources.GraphIO.shrinkForWrite(feed).write.mode(mode).parquet(dir)
    }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    // per-attempt staging dir: a fresh name per commit, so two concurrent
    // non-delta commits to one store can no longer collide on a shared
    // stage path (they still violate the single-writer FEED contract, but
    // they corrupt nothing)
    def freshStage() = s"$path/_cdc_stage/${java.util.UUID.randomUUID()}"
    // stage the feed diffs, then (after `epoch` has published) promote —
    // the shared slow path for non-delta commits and for a mispredicted
    // delta commit
    def stageFeedsAndPromote(epoch: => Long, concurrent: Boolean): Long = {
      checkFormat(s"$path/_cdc/nodes")
      checkFormat(s"$path/_cdc/edges")
      val stage = freshStage()
      val e: Long = if (concurrent) {
        // the snapshot write and the two feed writes are three independent
        // job sets — run them concurrently instead of stacking their fixed
        // job latencies (the feed diffs only read the PREVIOUS epoch / the
        // caller's frames, never the new one)
        val fEpoch = Future(epoch)
        val fFeeds = Seq(
          Future(writeFeed(g.nodes, _.nodes, s"$stage/nodes", SaveMode.Overwrite)),
          Future(writeFeed(g.edges, _.edges, s"$stage/edges", SaveMode.Overwrite)))
        Await.result(Future.sequence(fFeeds),
          scala.concurrent.duration.Duration.Inf)
        Await.result(fEpoch, scala.concurrent.duration.Duration.Inf)
      } else {
        val committed = epoch
        writeFeed(g.nodes, _.nodes, s"$stage/nodes", SaveMode.Overwrite)
        writeFeed(g.edges, _.edges, s"$stage/edges", SaveMode.Overwrite)
        committed
      }
      // commit point passed — mark the stage complete (one atomic create
      // recording the epoch), then promote. A crash anywhere after the
      // marker is RECOVERABLE: the next commitWithFeed (or an explicit
      // recoverOutbox) finishes the promote, so the outbox is never left
      // permanently partial. A crash in the narrow window between the
      // epoch publish and the marker loses this feed attempt whole —
      // losing-whole was r13's deliberate choice over double-publishing,
      // and it is detectable (a published epoch with neither f<N>_ outbox
      // files nor a marked stage).
      markStaged(spark, stage, e)
      promoteStage(spark, path, stage, e)
      e
    }
    if (willDelta) {
      // outbox schema IS the delta schema (`chg` add|remove + row columns,
      // the epoch is encoded in the copied file names): a delta commit
      // publishes by COPYING its immutable delta part-files into the
      // outbox — a driver-side filesystem op, zero Spark jobs, zero
      // re-encode.
      val epoch = Epochs.commitIncremental(g, path, fullEvery, prevGraph)
      def copyDelta(deltaDir: String, dir: String): Unit = {
        checkFormat(dir)
        val fs = hfs(spark, dir)
        fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
        val src = new org.apache.hadoop.fs.Path(deltaDir)
        if (fs.exists(src)) fs.listStatus(src).foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith("part-") && st.getLen > 0)
            org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
              new org.apache.hadoop.fs.Path(dir, s"e${epoch}_$name"),
              false, spark.sparkContext.hadoopConfiguration)
        }
      }
      if (exists(spark, s"$path/e$epoch/_delta")) {
        copyDelta(s"$path/e$epoch/nodes_delta", s"$path/_cdc/nodes")
        copyDelta(s"$path/e$epoch/edges_delta", s"$path/_cdc/edges")
      } else
        // willDelta mirrors commitIncremental's full/delta gate; if they
        // ever diverge (gate change, or a second writer outside the
        // single-writer contract shifting the epoch numbering) the commit
        // landed as a FULL snapshot and there are no delta files to copy —
        // fall back to the staged feed-diff path instead of silently
        // publishing NOTHING for this epoch
        stageFeedsAndPromote(epoch, concurrent = false)
      epoch
    } else {
      // non-delta (first or periodic full) commit: feeds stage
      // concurrently with the snapshot write and promote only after the
      // epoch has published — appending to the outbox concurrently would
      // leave consumer-visible rows behind a failed commit, and the
      // caller's retry would publish every change twice.
      stageFeedsAndPromote(
        Epochs.commitIncremental(g, path, fullEvery, prevGraph),
        concurrent = true)
    }
  }

  /** Write the stage-complete marker: one atomic create whose content is
    * the published epoch number — the commit record [[recoverOutbox]]
    * replays.
    */
  private def markStaged(spark: SparkSession, stage: String, epoch: Long): Unit = {
    val fs = hfs(spark, stage)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$stage/_staged"), true)
    out.write(epoch.toString.getBytes("UTF-8"))
    out.close()
  }

  /** Move every staged part-file into the outbox. Idempotent (recovery
    * re-runs it): an already-promoted file — destination exists, source
    * consumed by an earlier attempt — is skipped; a rename that REPORTS
    * failure (HDFS-style FileSystems return false rather than throw)
    * raises loudly instead of silently dropping a feed file after the
    * epoch has already committed. On filesystems without atomic rename
    * (object stores) a single epoch's feed may become visible across two
    * consumer micro-batches mid-crash, but never stays partial: the next
    * [[commitWithFeed]] completes it.
    */
  private def promoteStage(spark: SparkSession, path: String, stage: String,
      epoch: Long): Unit = {
    def promote(srcDir: String, dstDir: String): Unit = {
      val fs = hfs(spark, dstDir)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dstDir))
      val src = new org.apache.hadoop.fs.Path(srcDir)
      if (fs.exists(src)) fs.listStatus(src).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("part-") && st.getLen > 0) {
          val dst = new org.apache.hadoop.fs.Path(dstDir, s"f${epoch}_$name")
          // re-check after a failed rename: recovery can race the
          // original committer's own promote of the same stage — losing
          // the race to an EQUIVALENT rename is success, only a rename
          // that failed with no one having produced the target is an
          // error worth surfacing (silently dropping a feed file after
          // the epoch committed is the bug this check exists for)
          if (!fs.exists(dst) && !fs.rename(st.getPath, dst) && !fs.exists(dst))
            throw new IllegalStateException(
              s"CDC outbox promote failed: rename ${st.getPath} -> $dst returned false")
        }
      }
    }
    promote(s"$stage/nodes", s"$path/_cdc/nodes")
    promote(s"$stage/edges", s"$path/_cdc/edges")
    hfs(spark, stage).delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** Complete any outbox promote a previous [[commitWithFeed]] crashed in
    * the middle of: every stage dir carrying a `_staged` marker belongs to
    * an epoch that HAS published (the marker is created only after the
    * epoch commit returns), so its remaining files are renamed into the
    * outbox and the stage removed. Stage dirs WITHOUT a marker are either
    * a live concurrent commit or an abandoned pre-publish attempt — both
    * are left alone (the former cleans itself up; the latter is inert
    * garbage, never consumer-visible). Runs automatically at the start of
    * every commit; callable directly for repair.
    */
  def recoverOutbox(spark: SparkSession, path: String): Unit = {
    val root = s"$path/_cdc_stage"
    if (!exists(spark, root)) return
    val fs = hfs(spark, root)
    // unmarked stages older than this are abandoned pre-publish attempts
    // (their writer is gone; a live commit's stage is seconds old) — age
    // them out so a flaky producer cannot leak one feed-sized dir per
    // failed attempt forever
    val abandonAfterMs = sys.props.get("graft.cdc.stageAbandonMs")
      .map(_.toLong).getOrElse(60L * 60 * 1000)
    val now = System.currentTimeMillis()
    // age by the newest FILE under the stage, not the directory's own
    // mtime: object stores (S3A) report 0 or creation-time for directory
    // mtimes, so a dir-mtime age would let a manual recoverOutbox race a
    // live long commit and delete its still-being-written stage. Files
    // are the writer-activity signal on every store; the dir mtime is
    // consulted only for a stage with NO files yet (just-created — real
    // mtime on rename-capable stores, and on object stores an empty
    // "dir" is only a marker object, inert either way).
    def newestMtime(st: org.apache.hadoop.fs.FileStatus): Long = {
      def walk(s: org.apache.hadoop.fs.FileStatus): Long =
        if (!s.isDirectory) s.getModificationTime
        else (try fs.listStatus(s.getPath).toSeq
              catch { case _: java.io.FileNotFoundException => Seq.empty })
          .map(walk).foldLeft(0L)(math.max)
      val files = walk(st)
      if (files > 0L) files else st.getModificationTime
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).foreach { st =>
      if (st.isDirectory) {
        val stage = st.getPath.toString
        val marker = new org.apache.hadoop.fs.Path(s"$stage/_staged")
        // a concurrent commit may be promoting (and deleting) this very
        // stage — losing that race is not a recovery failure
        try {
          if (fs.exists(marker)) {
            val in = fs.open(marker)
            val bytes = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
            in.readFully(bytes)
            in.close()
            // an unparsable marker (0-byte: crash between create and
            // write) must NOT wedge every future commit with a parse
            // error — that feed attempt is lost-whole (the documented
            // crash-window outcome); age the dir out like an unmarked one
            scala.util.Try(new String(bytes, "UTF-8").trim.toLong).toOption match {
              case Some(epoch) => promoteStage(spark, path, stage, epoch)
              case None if now - newestMtime(st) > abandonAfterMs =>
                fs.delete(st.getPath, true)
              case None => ()
            }
          } else if (now - newestMtime(st) > abandonAfterMs)
            fs.delete(st.getPath, true)
        } catch {
          case _: java.io.FileNotFoundException => () // promoted under us
        }
      }
    }
  }

  /** Streaming view of the node change feed — a plain FileStreamSource
    * over the append-only outbox (new commits arrive as new files); the
    * stored `chg` column surfaces as `change` for consumers.
    */
  def nodeFeed(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(s"$path/_cdc/nodes").schema
    spark.readStream.schema(schema).parquet(s"$path/_cdc/nodes")
      .withColumnRenamed("chg", "change")
  }

  def edgeFeed(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(s"$path/_cdc/edges").schema
    spark.readStream.schema(schema).parquet(s"$path/_cdc/edges")
      .withColumnRenamed("chg", "change")
  }

  /** Near-dup state format version. "2" = rows versioned by EPOCH in `__b`
    * (r16+). The pre-r16 format versioned by micro-batch id — numerically
    * indistinguishable from epochs row-by-row, so mixing the two units in
    * one state dir silently misorders the strictly-later tombstone prune.
    * A `_format` marker makes the version explicit; state dirs carrying
    * rows but no marker (or an older version) are refused loudly, mirroring
    * the IllegalStateException for unrecognized outbox file names.
    */
  private val NearDupStateFormat = "2"

  private def checkNearDupStateFormat(spark: SparkSession, workDir: String,
      create: Boolean): Unit = {
    val fs = hfs(spark, workDir)
    val marker = new org.apache.hadoop.fs.Path(s"$workDir/_format")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val bytes = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
      in.readFully(bytes); in.close()
      val v = new String(bytes, "UTF-8").trim
      if (v != NearDupStateFormat)
        throw new IllegalStateException(
          s"$workDir near-dup state is format '$v' (expected '$NearDupStateFormat'): " +
            "versioning units changed (batch-id -> epoch); rebuild the state dir " +
            "(delete it and re-run the consumer from a fresh checkpoint)")
    } else if (Seq("sigs", "tombstones", "pairs")
        .exists(d => fs.exists(new org.apache.hadoop.fs.Path(s"$workDir/$d")))) {
      throw new IllegalStateException(
        s"$workDir carries near-dup state but no _format marker - written by the " +
          "pre-epoch-versioned format, whose batch-id `__b` units would misorder " +
          "tombstones against epochs; rebuild the state dir (delete it and re-run " +
          "the consumer from a fresh checkpoint)")
    } else if (create) {
      fs.mkdirs(new org.apache.hadoop.fs.Path(workDir))
      val out = fs.create(marker, true)
      out.write(NearDupStateFormat.getBytes("UTF-8"))
      out.close()
    }
  }

  private def sigSchema: StructType = StructType(Seq(
    StructField("__id", LongType), StructField("__grams", ArrayType(StringType)),
    StructField("__sig", ArrayType(LongType)), StructField("__b", LongType)))
  private def tombSchema: StructType = StructType(Seq(
    StructField("__id", LongType), StructField("__b", LongType)))
  private def pairSchema: StructType = StructType(Seq(
    StructField("id1", LongType), StructField("id2", LongType),
    StructField("jac", DoubleType), StructField("__b", LongType)))

  // an element versioned by batch __b is dead iff a STRICTLY later
  // tombstone exists for its id (remove+re-add in one batch: the add wins,
  // matching RowDiff's whole-row update = remove(old)+add(new) semantics)
  private def pruneDead(df: DataFrame, tomb: DataFrame,
      idCols: Seq[String]): DataFrame =
    idCols.foldLeft(df) { (acc, c) =>
      acc.join(tomb.select(col("__id").as("__tid"), col("__b").as("__tb")),
        acc(c) === col("__tid") && col("__tb") > acc("__b"), "left_anti")
    }

  /** [[pruneDead]] against the tombstone DIR: an append-only store with no
    * tombstone files yet (no document was ever removed/updated — the
    * common steady state) skips the anti-join plans entirely instead of
    * anti-joining against a provably empty frame per id column.
    */
  private def pruneDeadAt(spark: SparkSession, df: DataFrame, tombDir: String,
      idCols: Seq[String]): DataFrame =
    if (!exists(spark, tombDir)) df
    else pruneDead(df, spark.read.schema(tombSchema).parquet(tombDir), idCols)

  /** One incremental near-dup pass over everything committed since the
    * last run (checkpoint-tracked; `Trigger.AvailableNow` self-terminates
    * when the feed is drained). Parameters mirror
    * [[Dedup.minHashNearDuplicates]] so the accumulated [[nearDupPairs]]
    * equals the batch recompute on the epoch head exactly.
    */
  def incrementalNearDupRun(spark: SparkSession, storePath: String,
      workDir: String, idCol: String = "id", textCol: String = "text",
      n: Int = 2, numHashes: Int = 16, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L): Unit = {
    checkNearDupStateFormat(spark, workDir, create = true)
    val q = nodeFeed(spark, storePath)
      .writeStream
      .option("checkpointLocation", s"$workDir/_chk")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupBatch(batch, batchId, workDir, idCol, textCol,
          n, numHashes, bands, threshold, seed)
      }
      .start()
    q.awaitTermination()
  }

  private def nearDupBatch(batch: DataFrame, batchId: Long, workDir: String,
      idCol: String, textCol: String, n: Int, numHashes: Int, bands: Int,
      threshold: Double, seed: Long): Unit = {
    val debug = sys.props.contains("graft.cdc.debug") || sys.env.contains("GRAFT_CDC_DEBUG")
    def t[A](label: String)(f: => A): A =
      if (!debug) f else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[cdc-batch $batchId] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
    val spark = batch.sparkSession
    // Trigger.AvailableNow can drain SEVERAL commits into ONE micro-batch,
    // so rows must be versioned by their EPOCH, not the batch id: an id
    // updated across two drained epochs has two `add` rows and a tombstone
    // in the same batch — batch-id versioning cannot order them (an
    // arbitrary text won the dedup and the same-batch tombstone spared the
    // stale signature; found by this round's review). Every outbox file
    // name carries its epoch (`f<N>_part-*` staged promote, `e<N>_part-*`
    // delta copy) — recover it per row from the file name.
    // ONE pass over the batch files decides everything the control flow
    // needs (tombstone write needed? delta small enough to broadcast?) and
    // warms the cache every derived frame reads — the alternative is one
    // scan per decision plus one per consumer
    val b = batch.withColumn("__e",
      regexp_extract(element_at(split(input_file_name(), "/"), -1),
        "^[ef](\\d+)_", 1).cast("long"))
      .persist()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val stats = t("batch counts") {
      b.groupBy("change")
        .agg(count(lit(1)).as("n"), sum(length(col(textCol))).as("bytes"),
          count(when(col("__e").isNull, 1)).as("bad"),
          min("__e").as("emin"), max("__e").as("emax"))
        .collect()
    }
    val counts = stats.map(r => r.getString(0) -> r.getLong(1)).toMap
    // a feed row whose file name carries no epoch would silently version as
    // null and break tombstone ordering — the outbox contract is violated,
    // stop loudly (re-bootstrap the outbox rather than corrupt the state)
    if (stats.exists(_.getLong(3) > 0))
      throw new IllegalStateException(
        "CDC feed file without an f<epoch>_/e<epoch>_ name prefix - " +
          "unrecognized outbox layout; rebuild the outbox dir")
    // the common steady state — a consumer that runs after every commit —
    // drains exactly ONE epoch per micro-batch, and within one epoch ids
    // are unique per change side (whole-row diff semantics: an update is
    // one remove + one add). The max_by/max de-duplication groupBys below
    // exist only to order MULTI-epoch drains; skipping them in the
    // single-epoch case removes two shuffles from every steady-state batch.
    val singleEpoch = stats.nonEmpty &&
      stats.map(_.getLong(4)).min == stats.map(_.getLong(5)).max
    // total text bytes of the ADD side, from the same single pass — feeds
    // the fused-broadcast byte estimate below
    val addTextBytes = stats.collectFirst {
      case r if r.getString(0) == "add" && !r.isNullAt(2) => r.getLong(2)
    }.getOrElse(0L)
    val hasRemoves = counts.getOrElse("remove", 0L) > 0
    // small-delta batches write through ONE task: state files stay few (the
    // accumulated sig/pair stores are re-READ every batch — file count is
    // latency there too) and task-commit overhead shrinks. Large deltas
    // keep their full write parallelism.
    val maxBcast = spark.conf.getOption("spark.graft.cdc.broadcastMaxDocs")
      .map(_.toLong).getOrElse(65536L)
    val smallDelta = counts.values.sum <= maxBcast
    // the FUSED verification shape broadcasts grams × band fanout (each
    // new doc's shingle array rides every one of its `bands` band rows),
    // so its gate is three-fold: (a) its own doc cap, much tighter than
    // the id-only gate; (b) the id-only gate itself — an operator who
    // lowered broadcastMaxDocs below fuseMaxDocs to forbid broadcasts
    // must not still get one; (c) a byte ESTIMATE of the broadcast
    // (shingle bytes ≈ n overlapping word-grams per word ≈ n × text
    // bytes, riding each of the `bands` band rows), so a batch of few
    // but LARGE documents cannot build a multi-GB broadcast that the
    // doc-count caps alone would wave through.
    val fuseMax = spark.conf.getOption("spark.graft.cdc.fuseMaxDocs")
      .map(_.toLong).getOrElse(8192L)
    val fuseMaxBytes = spark.conf.getOption("spark.graft.cdc.fuseMaxBroadcastBytes")
      .map(_.toLong).getOrElse(512L << 20)
    val estFusedBytes = addTextBytes * n * bands
    val tinyDelta = counts.values.sum <= math.min(fuseMax, maxBcast) &&
      estFusedBytes <= fuseMaxBytes
    def narrow(df: DataFrame) = if (smallDelta) df.coalesce(1) else df

    // latest text per id (max_by over the epoch): an id re-added by a later
    // drained epoch must sign its NEWEST text — ids are unique per epoch,
    // so the max_by has no ties. Single-epoch drains skip the groupBy:
    // uniqueness within the epoch makes it the identity. Multi-epoch SMALL
    // deltas narrow FIRST: a coalesce(1) child is SinglePartition, which
    // satisfies the aggregate's clustered distribution, so the groupBy
    // plans NO exchange (r17 verdict: the multi-epoch drain paid a shuffle
    // stage per dedup over a ~300-row delta). Bulk multi-epoch loads keep
    // the full shuffled aggregation.
    val addRows = b.filter(col("change") === "add")
      .select(col(idCol).cast("long").as("__id"), col(textCol).as("__text"),
        col("__e"))
    val adds =
      if (singleEpoch) addRows
      else narrow(addRows).groupBy("__id")
        .agg(expr("max_by(__text, __e)").as("__text"), max("__e").as("__e"))
    // narrow BEFORE persist: a cached plan keeps its shuffle's partition
    // count (AQE may not re-shape cached output partitioning), so a
    // small-delta signature cache left at spark.sql.shuffle.partitions
    // blocks would hand EVERY downstream consumer 32 near-empty tasks —
    // profiled at ~0.1-0.3 s of fixed per-task overhead each, the
    // dominant cost of the whole batch at CDC delta sizes.
    val newSigs = narrow(adds
      .select(col("__id"), Dedup.shingles(col("__text"), n).as("__grams"),
        col("__e"))
      .select(col("__id"), col("__grams"),
        graft.functions.TextHashExpressions
          .minHashSig(col("__grams"), numHashes, seed).as("__sig"),
        col("__e").as("__b")))
      .persist()

    if (hasRemoves) {
      val removeRows = b.filter(col("change") === "remove")
        .select(col(idCol).cast("long").as("__id"), col("__e").as("__b"))
      // same narrow-before-aggregate trick as `adds`: exchange-free on
      // small deltas, unchanged on bulk ones
      val tombs =
        if (singleEpoch) removeRows
        else narrow(removeRows).groupBy("__id").agg(max("__b").as("__b"))
      narrow(tombs).write.mode(SaveMode.Append).parquet(s"$workDir/tombstones")
    }

    // live prior signatures (updates/removes up to and incl. this batch)
    val store = pruneDeadAt(spark,
      readOrEmpty(spark, s"$workDir/sigs", sigSchema),
      s"$workDir/tombstones", Seq("__id"))
    // an id whose FINAL state in the drained window is removed (added at
    // epoch E, removed at E' > E, never re-added) must neither pair nor
    // enter the store — the head-state recompute has no such document.
    // Same-epoch remove+add (an update) survives: the prune is strictly-
    // later, and the add carries the update's own epoch.
    val liveNew =
      if (hasRemoves) pruneDeadAt(spark, newSigs, s"$workDir/tombstones", Seq("__id"))
      else newSigs

    // steady-state CDC: the DELTA is small relative to the store, so the
    // delta-derived side (banded new signatures — bounded by the delta) is
    // the broadcast side and the store only ever STREAMS. Guarded by the
    // doc-count gate so a bulk initial load (delta = corpus) falls back to
    // shuffled joins instead of broadcasting the world.

    // candidates = band-key matches with ≥1 NEW member (old×old pairs were
    // found when their later member arrived); least/greatest + distinct
    // canonicalizes the asymmetric new×all join
    val all = store.unionByName(liveNew)
    def banded(df: DataFrame) = df.select(col("__id"), col("__b"),
      explode(Dedup.bandKeys(col("__sig"), numHashes, bands)).as("__bk"))
    // the pair verification and the signature-store append both hang off
    // the persisted newSigs and write to distinct dirs — overlap them
    def bcastIfSmall(df: DataFrame) = if (smallDelta) broadcast(df) else df
    val fPairs = Future { t("pairs write") {
      val verified = if (tinyDelta) {
        // steady-state (tiny-delta) shape: the grams RIDE the band join
        // so verification is a single broadcast join — no candidate
        // materialization round-trip, no gram re-join (two fewer jobs per
        // batch). Jaccard is symmetric, so computing it before the
        // least/greatest canonicalization gives the same value; duplicate
        // band matches recompute it (≤ `bands`×, trivial at delta size)
        // and collapse in the final dedup.
        def bandedG(df: DataFrame) = df.select(col("__id"), col("__grams"),
          col("__b"), explode(Dedup.bandKeys(col("__sig"), numHashes, bands)).as("__bk"))
        // pair version = newest member epoch: both texts are current as of
        // it, and any future change to either member commits at a strictly
        // later epoch, so the strictly-later tombstone prune retires right
        // dedup AFTER the narrow: tinyDelta implies smallDelta, so the
        // narrow below is coalesce(1) and the dropDuplicates aggregate is
        // satisfied by SinglePartition — no dedup exchange on the
        // steady-state path (duplicate band matches are a handful of rows)
        narrow(broadcast(bandedG(liveNew)).as("l")
          .join(bandedG(all).as("r"),
            col("l.__bk") === col("r.__bk") && col("l.__id") =!= col("r.__id"))
          .select(least(col("l.__id"), col("r.__id")).as("id1"),
            greatest(col("l.__id"), col("r.__id")).as("id2"),
            round(Dedup.jaccard(col("l.__grams"), col("r.__grams")), 6).as("jac"),
            greatest(col("l.__b"), col("r.__b")).as("__b"))
          .filter(col("jac") >= threshold))
          .dropDuplicates("id1", "id2")
      } else {
        // mid/bulk shape: dedup candidate PAIRS first, then fetch each
        // pair's grams exactly once — asymptotically fewer gram
        // comparisons when band collisions are plentiful. Deltas under
        // the id-only broadcast gate still broadcast the (id, band-key)
        // side and the canonical pair set (both delta-bounded, bytes-tiny
        // without grams); genuinely bulk loads fall back to shuffles.
        val candidates = narrow(bcastIfSmall(banded(liveNew)).as("l")
          .join(banded(all).as("r"),
            col("l.__bk") === col("r.__bk") && col("l.__id") =!= col("r.__id"))
          .select(least(col("l.__id"), col("r.__id")).as("id1"),
            greatest(col("l.__id"), col("r.__id")).as("id2"),
            greatest(col("l.__b"), col("r.__b")).as("__b")))
          .distinct()
        val g1 = all.select(col("__id").as("id1"), col("__grams").as("__g1"))
        val g2 = all.select(col("__id").as("id2"), col("__grams").as("__g2"))
        bcastIfSmall(candidates).join(g1, "id1").join(g2, "id2")
          .select(col("id1"), col("id2"),
            round(Dedup.jaccard(col("__g1"), col("__g2")), 6).as("jac"),
            col("__b"))
          .filter(col("jac") >= threshold)
      }
      narrow(verified.select(pairSchema.fieldNames.map(col): _*))
        .write.mode(SaveMode.Append).parquet(s"$workDir/pairs")
    }}
    val fSigs = Future { t("sigs write") {
      narrow(liveNew.select(sigSchema.fieldNames.map(col): _*))
        .write.mode(SaveMode.Append).parquet(s"$workDir/sigs")
    }}
    Await.result(Future.sequence(Seq(fPairs, fSigs)),
      scala.concurrent.duration.Duration.Inf)
    newSigs.unpersist()
    b.unpersist()
  }

  /** The accumulated near-dup pairs over everything consumed so far —
    * pairs whose members were since removed/updated are retired by their
    * tombstones. Equals [[Dedup.minHashNearDuplicates]] on the epoch head
    * (same parameters), having signed each document once.
    */
  def nearDupPairs(spark: SparkSession, workDir: String): DataFrame = {
    checkNearDupStateFormat(spark, workDir, create = false)
    pruneDeadAt(spark, readOrEmpty(spark, s"$workDir/pairs", pairSchema),
        s"$workDir/tombstones", Seq("id1", "id2"))
      .select(col("id1"), col("id2"), col("jac"))
  }
}
