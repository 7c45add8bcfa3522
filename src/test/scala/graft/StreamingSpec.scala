package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming windowed counts equal batch windowed counts") {
    val batch = EventStreams
      .windowedCounts(Tables.events(spark, sf), withWatermark = false)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // complete mode: append would withhold windows newer than the watermark
    // (max ts - 2h) at end-of-stream, so equality only holds in complete.
    val streamed = EventStreams.runOnce(spark, sf, "win_out",
      df => EventStreams.windowedCounts(df, withWatermark = true), "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("stream-stream interval self-join matches the batch plan") {
    val batch = EventStreams
      .intervalSelfJoin(Tables.events(spark, sf), Tables.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = EventStreams.runOnce(spark, sf, "ssj_out",
      df => EventStreams.intervalSelfJoin(df, df), "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming dedup keeps one row per event_id") {
    val out = EventStreams.runOnce(spark, sf, "dedup_out",
      EventStreams.dedupStream, "append")
    assert(out.count() == Tables.events(spark, sf).select("event_id").distinct().count())
  }

  test("flatMapGroupsWithState accumulates per-user totals") {
    val out = EventStreams.runOnce(spark, sf, "state_out",
      EventStreams.runningUserStats, "update")
    // last update per user must equal the batch aggregate
    val finalStats = out.groupBy("user_id").agg(max(col("n")).as("n"))
    val batch = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("n"))
    val mismatches = finalStats.join(batch, "user_id")
      .filter(finalStats("n") =!= batch("n")).count()
    assert(mismatches == 0)
  }

  test("session_window sessionization: stream equals batch") {
    val batch = EventStreams
      .sessionCounts(Tables.events(spark, sf), withWatermark = false)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val streamed = EventStreams.runOnce(spark, sf, "sess_out",
      df => EventStreams.sessionCounts(df, withWatermark = true), "complete")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("normalizeEventTs infers the epoch unit from int64 magnitude") {
    import spark.implicits._
    // one instant, four encodings — all must decode to the same timestamp
    val instant = java.time.Instant.parse("2024-03-15T12:30:45Z")
    val s = instant.getEpochSecond
    val encodings = Seq(s, s * 1000L, s * 1000000L, s * 1000000000L)
    val decoded = encodings.map { v =>
      Tables.normalizeEventTs(Seq(v).toDF("ts"))
        .select(col("ts").cast("long")).head.getLong(0)
    }
    assert(decoded.forall(_ == s), s"decoded=$decoded expected=$s")
  }

  test("normalizeEventTs: lenient quarantines out-of-band values, strict raises") {
    import spark.implicits._
    val inBand = java.time.Instant.parse("2024-03-15T12:30:45Z").getEpochSecond
    val outOfBand = -12345L // pre-1970: in no epoch-unit band
    // strict (batch) face: hard failure
    intercept[Exception] {
      Tables.normalizeEventTs(Seq(outOfBand).toDF("ts")).collect()
    }
    // lenient (streaming) face: bad row → null ts, good rows still decode —
    // one undecodable event must not kill a long-lived stream
    val rows = Tables.normalizeEventTs(
        Seq(inBand, outOfBand).toDF("ts"), lenient = true)
      .select(col("ts").cast("long")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows.toSeq == Seq(Some(inBand), None))
  }
}
