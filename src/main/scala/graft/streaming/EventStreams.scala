package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events table — beyond-parity surface (the
  * reference has no streaming at all, SURVEY §1.6); this is the Spark-native
  * answer for incremental pipelines at 100 TB: the SAME transforms run in
  * batch (oracle-checked) and as a watermarked stream.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type — works on a batch OR streaming
    * DataFrame (identical plan; streaming adds the watermark).
    */
  def windowedCounts(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
  }

  /** Streaming dedup on event_id bounded by the watermark — the streaming
    * face of the dedup operator family.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")

  /** Gap-based sessionization via the NATIVE session_window operator —
    * the streaming-capable face of q_sessionize's window-cumsum
    * formulation: sessions merge while consecutive same-user events are
    * less than `gap` apart (a gap of exactly `gap` starts a new session —
    * session windows are half-open [start, last+gap)). Batch and stream
    * share the plan; state expires with the watermark.
    */
  def sessionCounts(events: DataFrame, gap: String = "6 hours",
      withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ss"), col("n"))
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStat(user_id: Long, n: Long, total: Double)

  /** Custom keyed state (KeyValueGroupedDataset.flatMapGroupsWithState):
    * running per-user counters — the mapGroupsWithState shape the reference's
    * users would reach for in a streaming deployment.
    */
  def runningUserStats(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStat]) => {
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserStat(uid, n, total)
          state.update(next)
          Iterator(next)
        })
      .toDF()
  }

  /** Watermarked stream-stream interval self-join (enrich by recent
    * same-user activity): pairs of events of one user at most `gap` apart,
    * ordered l_id < r_id. Both sides carry watermarks and the join condition
    * bounds event time on both ends, so Spark can expire join state — the
    * requirement for unbounded streams. The identical plan runs in batch
    * (oracle-checked as q_stream_join).
    */
  def intervalSelfJoin(left: DataFrame, right: DataFrame,
      gap: String = "10 minutes"): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
      .withWatermark("l_ts", "2 hours")
    val r0 = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
      .withWatermark("r_ts", "2 hours")
    // batch runs take the shuffle join on user_id explicitly: both sides
    // are the SAME full-size table, so the broadcast Catalyst would pick
    // at small SF (one scan partition -> the whole join+blowup runs on a
    // single task) is exactly the plan that cannot exist at scale — the
    // merge hint makes the benchmarked shape the 100-TB shape and spreads
    // the per-user pair expansion across the cluster. Stream-stream joins
    // plan their own stateful hash exchange; the hint is batch-only.
    //
    // The exchange width is PINNED (repartition with an explicit count):
    // the join's range condition multiplies rows AFTER the shuffle, so
    // AQE's bytes-based partition coalescing — blind to downstream fan-out
    // — collapsed the modest pre-join shuffle to 2 tasks and serialized
    // the whole per-user pair expansion onto them (measured: 2×0.25 s
    // tasks vs a ~0.1 s spread join). An explicit count is exactly what
    // AQE contracts never to rewrite; the value is the session's
    // configured shuffle parallelism, so deployments tune it the same
    // way they tune every other exchange.
    val (lb, r) = if (right.isStreaming) (l, r0) else {
      val n = left.sparkSession.sessionState.conf.numShufflePartitions
      (l.repartition(n, col("user_id")),
        r0.repartition(n, col("r_user")).hint("merge"))
    }
    lb.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $gap") &&
          col("l_id") < col("r_id"))
      .select(col("l_id"), col("r_id"))
  }

  /** Drive a streaming query over the events parquet synchronously (memory
    * sink) — used by tests; a deployment swaps source/sink, not the plan.
    */
  def runOnce(spark: SparkSession, dir: String, name: String,
      transform: DataFrame => DataFrame, outputMode: String): DataFrame = {
    // readStream needs an explicit schema; use the RAW parquet schema (ts may
    // be int64-nanos or TIMESTAMP_NTZ depending on testdata version) and then
    // apply the SAME normalization branch as the batch loader.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream
      .schema(rawSchema)
      .parquet {
        // FileStreamSource needs a directory; stage a symlink to the events
        // file (a real deployment streams from a directory of arriving files).
        val stage = java.nio.file.Files.createTempDirectory("graft_events")
        java.nio.file.Files.createSymbolicLink(
          stage.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        stage.toString
      }
    // lenient: one out-of-band ts row must quarantine (null ts → dropped by
    // the watermark), not kill the stream — see normalizeEventTs
    val events = graft.core.Tables.normalizeEventTs(raw, lenient = true)
    val q = transform(events).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
