package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.EventStreams

/** Windowed event aggregation (batch face of the streaming transform) and
  * exact percentile aggregates (PercentileCont/Disc, aggregate.rs:79-91).
  */
object StreamQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // Watermarked stream-stream interval self-join, run here in batch (the
    // identical plan; StreamingSpec asserts stream ≡ batch): same-user event
    // pairs at most 10 minutes apart.
    QueryDef(
      "q_stream_join",
      """SELECT a.event_id AS l_id, b.event_id AS r_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        | AND a.event_id < b.event_id
        |ORDER BY l_id NULLS FIRST, r_id NULLS FIRST""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      EventStreams.intervalSelfJoin(ev, ev).orderBy("l_id", "r_id")
    },

    // Tumbling 1-hour windows per event type — the exact transform
    // EventStreams runs as a watermarked stream (StreamingSpec).
    QueryDef(
      "q_event_windows",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY ws NULLS FIRST, event_type NULLS FIRST""".stripMargin) { (s, dir) =>
      EventStreams.windowedCounts(Tables.events(s, dir), withWatermark = false)
        .orderBy("ws", "event_type")
    },

    // Native session_window sessionization (EventStreams.sessionCounts) —
    // the streaming-capable operator, oracle-checked in batch against the
    // classic lag/cumsum gap formulation. Boundary semantics pinned: a gap
    // of EXACTLY 6h starts a new session (session windows are half-open),
    // so the oracle's new-session rule is `>=`, not `>`.
    QueryDef(
      "q_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000 THEN 1
        |              ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts,
        |         sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS ss, CAST(count(*) AS BIGINT) AS n
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, ss NULLS FIRST""".stripMargin) { (s, dir) =>
      EventStreams.sessionCounts(Tables.events(s, dir))
        .orderBy("user_id", "ss")
    },

    // Exact percentiles: continuous (linear interpolation, R-7 — both
    // engines) and discrete via an explicit sorted-list formula shared with
    // the oracle (no reliance on matching engine-specific disc semantics).
    QueryDef(
      "q_percentiles",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |       round(quantile_cont(l_quantity, 0.95), 6) AS p95,
        |       round(list_sort(list(l_quantity))[greatest(CAST(ceil(0.5 * count(*)) AS INT), 1)], 2) AS p50d
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50"),
          round(percentile(col("l_quantity"), lit(0.95)), 6).as("p95"),
          round(element_at(sort_array(collect_list(col("l_quantity"))),
            greatest(ceil(lit(0.5) * count(lit(1))).cast("int"), lit(1))), 2).as("p50d"))
        .orderBy("l_returnflag")
    },
  )
}
