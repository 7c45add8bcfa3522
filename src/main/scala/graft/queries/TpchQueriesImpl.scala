package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** TPC-H-shaped multi-join aggregates (Q3/Q5/Q10 adapted to the available
  * columns) — the canonical scale shapes: selective dimension filters feeding
  * a fact-table join tree with aggregation and top-k, where join order,
  * broadcast choice, and partial aggregation decide 100 TB viability.
  */
object TpchQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // Q3-like: shipping-priority revenue for one segment, date-split.
    QueryDef(
      "q_tpch_q3",
      """SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       CAST(o_orderdate AS TIMESTAMP) AS odate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey NULLS FIRST
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").as("odate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("odate"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // Q5-like: revenue by nation where customer and supplier share the
    // nation, restricted to one region. The per-nation revenue sums span
    // MILLIONS of lineitems at sf >= 1, and a double-accumulated sum is
    // order-dependent in its last ulp — enough to flip the rounded cent
    // between Spark's partition order and the oracle's (sf1 measured
    // .93 vs .94 on one nation). Both sides therefore cast each row's
    // (deterministic) double product to DECIMAL and sum exactly: decimal
    // addition is associative, so the cent is the same in any order — the
    // correct money-aggregation shape at any scale.
    QueryDef(
      "q_tpch_q5",
      """SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(30,8)")), 2).cast("double")
          .as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // Q10-like: top returned-revenue customers.
    QueryDef(
      "q_tpch_q10",
      """SELECT c_custkey, c_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey NULLS FIRST
        |LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    // CBO-planned join (reference optimizer/mod.rs:74-90 statistics
    // seeding): ANALYZE'd catalog tables + spark.sql.cbo drive the join
    // planning from row counts and column stats instead of raw file sizes
    // — the compile-time complement to AQE's runtime re-planning. The
    // result is materialized INSIDE the CBO scope (localCheckpoint) so the
    // executed plan really is the stats-driven one.
    QueryDef(
      "q_cbo_join",
      """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_urgent
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1
        |ORDER BY nation NULLS FIRST""".stripMargin) { (s, dir) =>
      graft.core.Stats.analyze(s, dir,
        tables = Seq("nation", "customer", "orders"))
      graft.core.Stats.withCbo(s) {
        s.table("graft_stats.orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .join(s.table("graft_stats.customer"),
            col("o_custkey") === col("c_custkey"))
          .join(s.table("graft_stats.nation"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).as("n_urgent"))
          .orderBy("nation")
          .localCheckpoint()
      }
    },
  )
}
