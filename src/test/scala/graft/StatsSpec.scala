package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Stats

/** CBO statistics wiring (reference optimizer/mod.rs:74-90 seeds its cost
  * model from store stats). The contract under test: with ANALYZE'd catalog
  * tables and `spark.sql.cbo.enabled`, the COMPILE-TIME planner estimates a
  * filtered fact side below the broadcast threshold and plans a broadcast
  * join — where the stats-blind path carries the raw file size through the
  * Filter and falls back to sort-merge (until AQE rescues it at runtime,
  * one materialized shuffle too late).
  */
class StatsSpec extends AnyFunSuite {
  import TestSpark._

  private val db = "graft_stats_spec"

  test("ANALYZE row counts reach the optimized plan's stats") {
    Stats.analyze(spark, sf, db, tables = Seq("customer"))
    val n = spark.table(s"$db.customer").count()
    Stats.withCbo(spark) {
      val stats = spark.table(s"$db.customer")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(n)),
        s"expected rowCount $n in plan stats, got ${stats.rowCount}")
    }
  }

  test("column stats broadcast a filtered fact side at compile time") {
    Stats.analyze(spark, sf, db, tables = Seq("orders", "customer"))
    // isolate compile-time planning: no AQE runtime rescue, and a
    // threshold between the CBO estimate of the filtered orders side
    // (~10 rows ≈ 264 B from column min/max) and the stats-blind
    // estimates (file size scaled by projected-column width: orders
    // ~10 KB, customer ~4.4 KB at sf0.001)
    val prior = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
    try {
      def planOf(): String = {
        val o = spark.table(s"$db.orders")
          .filter(col("o_orderkey") < 10)
          .select("o_orderkey", "o_custkey")
        val c = spark.table(s"$db.customer")
          .select("c_custkey", "c_name", "c_acctbal")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .queryExecution.executedPlan.toString
      }
      val withStats = Stats.withCbo(spark)(planOf())
      assert(withStats.contains("BroadcastHashJoin"),
        s"CBO stats should shrink the filtered side under the threshold:\n$withStats")
      val without = planOf()
      assert(without.contains("SortMergeJoin"),
        s"stats-blind planning should keep the raw-size sort-merge:\n$without")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("withCbo restores prior conf values") {
    spark.conf.set("spark.sql.cbo.enabled", "false")
    Stats.withCbo(spark) {
      assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
    }
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false")
  }
}
