package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries read straight from parquet so Catalyst's scan pushdown
  * (PushedFilters / ReadSchema pruning) applies — at 100 TB the scan is the
  * dominant cost and must never read columns or row groups it doesn't need.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Per-session memo of the loaded frames: spark.read.parquet pays a
  // driver-side file listing + footer/schema read on EVERY call, and the
  // catalog's queries re-load the same ten tables hundreds of times
  // (measured ~0.13 s per load — 0.4 s of pure driver time just to
  // CONSTRUCT a three-table lineage). DataFrames are immutable, so
  // returning the same instance is safe, and a stable plan object also
  // lets downstream plan caches hit. NOT a WeakHashMap: a cached DataFrame
  // strongly references its SparkSession, so weak KEYS whose values point
  // back at them are never collectable — the exact leak weak-keying was
  // supposed to prevent. Instead: access-ordered LRU bounded to a handful
  // of sessions, with stopped sessions (and their stale plans) evicted on
  // every access, so multi-session processes neither leak nor get handed
  // frames from a dead context.
  private val MaxSessions = 8
  private val memo =
    new java.util.LinkedHashMap[SparkSession, scala.collection.mutable.Map[(String, String), DataFrame]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, scala.collection.mutable.Map[(String, String), DataFrame]]): Boolean =
        size() > MaxSessions
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.synchronized {
      val it = memo.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      if (spark.sparkContext.isStopped) load(spark, dir, name) // fails loudly downstream; never cache a dead session
      else memo.computeIfAbsent(spark, _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate((dir, name), load(spark, dir, name))
    }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts varies across driver testdata versions: TIMESTAMP(NANOS)
      // (unreadable natively — read via nanosAsLong and truncate to µs,
      // matching DuckDB's ns→µs truncation on the oracle side) or
      // TIMESTAMP(US) with isAdjustedToUTC=false (read as TIMESTAMP_NTZ —
      // normalize to session-UTC TimestampType so interval arithmetic and
      // the oracle compare see identical instants). Branch on the schema
      // actually read, not on an assumed version.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Normalize the events `ts` column to session-UTC TimestampType, branching
    * on the type ACTUALLY read (never an assumed testdata version). Shared by
    * the batch loader above and the streaming reader
    * ([[graft.streaming.EventStreams.runOnce]]) so both faces decode
    * identical instants.
    *
    * `lenient = true` (the STREAMING face) quarantines out-of-band int64
    * values as NULL ts instead of raising: a long-lived stream must not be
    * killed by one undecodable row (watermarked operators then drop the
    * null-ts row, the streaming analogue of a dead-letter). Batch loads
    * keep the hard failure — a bad batch file should abort loudly, not
    * silently shrink the corpus.
    */
  def normalizeEventTs(df: DataFrame, lenient: Boolean = false): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // An int64 ts is nanos on the known testdata vintage, but a future
        // driver regeneration could silently emit epoch micros/millis/seconds
        // (the r8 schema-drift class). Infer the unit from the magnitude:
        // each unit's plausible range for 1973..2096 instants occupies a
        // disjoint decade band (s 1e8..4e9, ms 1e11..4e12, µs 1e14..4e15,
        // ns 1e17..4e18). A value in the GAPS between bands (e.g. a nano
        // timestamp for 1970..early-1973) is ambiguous — raise loudly rather
        // than decode into the wrong century; a min/max per-load inference
        // isn't an option because the streaming reader shares this path and
        // can't run an aggregate. Pure codegen'd CASE — no extra job.
        // ts = 0 decodes to 1970-01-01T00:00Z in EVERY unit — the one value
        // outside the bands that is still unambiguous, and a near-universal
        // int64 default/sentinel that must not abort a whole (streaming) job
        val outOfBand =
          if (lenient) "CAST(NULL AS TIMESTAMP)"
          else "raise_error(concat('events.ts value outside every epoch-unit band (s/ms/us/ns, 1973..2096): ', ts))"
        df.withColumn("ts", expr(
          s"""CASE WHEN ts = 0 THEN timestamp_seconds(0)
             |     WHEN ts >= 100000000000000000 AND ts < 4000000000000000000 THEN timestamp_micros(ts div 1000)
             |     WHEN ts >= 100000000000000 AND ts < 4000000000000000 THEN timestamp_micros(ts)
             |     WHEN ts >= 100000000000 AND ts < 4000000000000 THEN timestamp_millis(ts)
             |     WHEN ts >= 100000000 AND ts < 4000000000 THEN timestamp_seconds(ts)
             |     ELSE $outOfBand END""".stripMargin))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
