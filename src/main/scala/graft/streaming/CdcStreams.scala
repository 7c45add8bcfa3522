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
  * All state is append-only parquet versioned by micro-batch id
  * (`sigs/`, `pairs/`, `tombstones/`); liveness at read time is
  * "no tombstone for the id from a LATER batch", so document updates
  * (remove + add of the same id in one epoch) retire the stale signature
  * and stale pairs and re-pair the new text in the same pass.
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
  def commitWithFeed(g: PropertyGraph, path: String, fullEvery: Int = 10): Long = {
    val spark = g.nodes.sparkSession
    val before = Epochs.list(spark, path)
    val epoch = Epochs.commitIncremental(g, path, fullEvery)

    def allAdd(df: DataFrame): DataFrame =
      df.select(lit("add").as("change") +: df.columns.map(col): _*)
    val isDelta = exists(spark, s"$path/e$epoch/_delta")
    def feedSide(deltaDir: String, full: DataFrame,
        prevOf: PropertyGraph => DataFrame): DataFrame =
      if (isDelta)
        // the commit already wrote exactly these rows — O(delta) read-back
        try spark.read.parquet(deltaDir).withColumnRenamed("chg", "change")
        catch { case _: Exception => allAdd(full).limit(0) } // empty delta
      else before.lastOption match {
        case Some(prev) =>
          val p = Epochs.asOf(spark, path, prev)
          val cur = prevOf(PropertyGraph(g.nodes, g.edges))
          val old = prevOf(p)
          graft.core.RowDiff.antiRows(cur, old).withColumn("change", lit("add"))
            .unionByName(graft.core.RowDiff.antiRows(old, cur)
              .withColumn("change", lit("remove")))
            .select(col("change") +: cur.columns.map(col): _*)
        case None => allAdd(full)
      }

    feedSide(s"$path/e$epoch/nodes_delta", g.nodes, _.nodes)
      .withColumn("epoch", lit(epoch))
      .write.mode(SaveMode.Append).parquet(s"$path/_cdc/nodes")
    feedSide(s"$path/e$epoch/edges_delta", g.edges, _.edges)
      .withColumn("epoch", lit(epoch))
      .write.mode(SaveMode.Append).parquet(s"$path/_cdc/edges")
    epoch
  }

  /** Streaming view of the node change feed — a plain FileStreamSource
    * over the append-only outbox (new commits arrive as new files).
    */
  def nodeFeed(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(s"$path/_cdc/nodes").schema
    spark.readStream.schema(schema).parquet(s"$path/_cdc/nodes")
  }

  def edgeFeed(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(s"$path/_cdc/edges").schema
    spark.readStream.schema(schema).parquet(s"$path/_cdc/edges")
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
    val spark = batch.sparkSession
    val removes = batch.filter(col("change") === "remove")
      .select(col(idCol).cast("long").as("__id")).distinct()
      .withColumn("__b", lit(batchId))
    if (!removes.isEmpty)
      removes.write.mode(SaveMode.Append).parquet(s"$workDir/tombstones")

    val tomb = readOrEmpty(spark, s"$workDir/tombstones", tombSchema)
    // live prior signatures (updates/removes up to and incl. this batch)
    val store = pruneDead(
      readOrEmpty(spark, s"$workDir/sigs", sigSchema), tomb, Seq("__id"))

    val adds = batch.filter(col("change") === "add")
      .select(col(idCol).cast("long").as("__id"), col(textCol).as("__text"))
      .dropDuplicates("__id")
    val newSigs = adds
      .select(col("__id"), Dedup.shingles(col("__text"), n).as("__grams"))
      .select(col("__id"), col("__grams"),
        graft.functions.TextHashExpressions
          .minHashSig(col("__grams"), numHashes, seed).as("__sig"),
        lit(batchId).as("__b"))
      .persist()

    // candidates = band-key matches with ≥1 NEW member (old×old pairs were
    // found when their later member arrived); least/greatest + distinct
    // canonicalizes the asymmetric new×all join
    val all = store.unionByName(newSigs)
    def banded(df: DataFrame) = df.select(col("__id"),
      explode(Dedup.bandKeys(col("__sig"), numHashes, bands)).as("__bk"))
    val candidates = banded(newSigs).as("l")
      .join(banded(all).as("r"),
        col("l.__bk") === col("r.__bk") && col("l.__id") =!= col("r.__id"))
      .select(least(col("l.__id"), col("r.__id")).as("id1"),
        greatest(col("l.__id"), col("r.__id")).as("id2"))
      .distinct()
    val g1 = all.select(col("__id").as("id1"), col("__grams").as("__g1"))
    val g2 = all.select(col("__id").as("id2"), col("__grams").as("__g2"))
    candidates.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        round(Dedup.jaccard(col("__g1"), col("__g2")), 6).as("jac"))
      .filter(col("jac") >= threshold)
      .withColumn("__b", lit(batchId))
      .write.mode(SaveMode.Append).parquet(s"$workDir/pairs")
    newSigs.select(sigSchema.fieldNames.map(col): _*)
      .write.mode(SaveMode.Append).parquet(s"$workDir/sigs")
    newSigs.unpersist()
  }

  /** The accumulated near-dup pairs over everything consumed so far —
    * pairs whose members were since removed/updated are retired by their
    * tombstones. Equals [[Dedup.minHashNearDuplicates]] on the epoch head
    * (same parameters), having signed each document once.
    */
  def nearDupPairs(spark: SparkSession, workDir: String): DataFrame = {
    val tomb = readOrEmpty(spark, s"$workDir/tombstones", tombSchema)
    pruneDead(readOrEmpty(spark, s"$workDir/pairs", pairSchema), tomb,
        Seq("id1", "id2"))
      .select(col("id1"), col("id2"), col("jac"))
  }
}
