package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.EventStreams

/** Windowed event aggregation (batch face of the streaming transform) and
  * exact percentile aggregates (PercentileCont/Disc, aggregate.rs:79-91).
  */
object StreamQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

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
