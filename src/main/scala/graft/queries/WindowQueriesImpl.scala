package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Window/analytic functions and sessionization — beyond the reference's
  * surface (SURVEY §2.3 notes it has no OVER/frames at all), but core to a
  * Spark-native analytics engine and fully oracle-checkable.
  */
object WindowQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // Ranking + offset + running-frame functions over orders per customer.
    QueryDef(
      "q_window_funcs",
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER w AS rn,
        |       rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus, o_orderkey) AS rk,
        |       lag(o_orderkey, 1) OVER w AS prev_ok,
        |       lead(o_orderkey, 1) OVER w AS next_ok,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders
        |WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val wr = Window.partitionBy("o_custkey").orderBy("o_orderstatus", "o_orderkey")
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(wr).as("rk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Gap-based sessionization of the event stream: a new session starts
    // after > 6h idle; session id = cumulative count of session starts.
    QueryDef(
      "q_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000 THEN 1
        |              ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id,
        |       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
        |       event_id
        |FROM flagged
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          // exact microsecond gap on both sides: unix_timestamp truncates to
          // seconds while DuckDB's epoch() keeps fractions — ns-precision
          // events land on different sides of the threshold otherwise
          when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 21600000000L, 1L)
            .otherwise(0L).as("new_session"))
        .select(col("user_id"),
          sum(col("new_session"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("session_id"),
          col("event_id"))
        .orderBy("user_id", "event_id")
    },
  )
}
