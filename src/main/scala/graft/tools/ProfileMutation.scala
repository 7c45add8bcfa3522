package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.TpchGraph

/** Split-profile for the mutation-chain queries (r7 latency item): times the
  * mutation stage and the verification read-back separately, so "where does
  * q_cypher_setmap's wall time go" is a measurement, not a guess.
  *
  * Usage: runMain graft.tools.ProfileMutation [sfDir]
  */
object ProfileMutation {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[split] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // same warm-up as Bench: fixture graphs persisted before measuring
    spark.range(1000000).selectExpr("sum(id)").collect()
    TpchGraph(spark, sfDir).nodes.count()
    TpchGraph(spark, sfDir).edges.count()

    // two rounds: round 1 pays residual one-time costs, round 2 is the
    // bench-comparable steady state
    // Spark mutations are lazy: the read-back stage below executes the whole
    // mutate-then-read plan. The honest attribution therefore needs the
    // BASELINE: the same read-back on the unmutated graph. residual mutation
    // cost = (mutated read) - (baseline read).
    for (pass <- 1 to 2) {
      println(s"-- baselines pass $pass")
      val g0 = TpchGraph(spark, sfDir)
      time("customer read-back + sort (no mutation)") {
        g0.nodesWithLabel("Customer")
          .select(TpchGraph.key(col("id")).as("k"), col("name").as("nm"),
            round(col("acctbal"), 4).as("bal"), col("category").as("cat"),
            array_contains(col("labels"), "Reset").as("flg"))
          .orderBy(col("k").asc_nulls_first, col("cat").asc_nulls_first)
          .write.format("noop").mode("overwrite").save()
      }
      time("CONTAINS re-aggregation (no mutation)") {
        g0.edges.filter(col("rel") === "CONTAINS")
          .agg(count(lit(1)).as("n"), sum(col("weight")).cast("double").as("total"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    for (pass <- 1 to 2) {
      println(s"-- q_cypher_setmap pass $pass")
      val session = new graft.GraftSession(spark, TpchGraph(spark, sfDir))
      val g2 = time("mutation 1 (SET += map, :Reset)") {
        session.cypherUpdate(
          """MATCH (c:Customer) WHERE c.acctbal < 0
            |SET c += {acctbal: 0.0, category: 'RESET'}, c:Reset""".stripMargin)
      }
      val g = time("mutation 2 (SET = map)") {
        new graft.GraftSession(spark, g2).cypherUpdate(
          "MATCH (r:Region) WHERE id(r) = 1000000000000 SET r = {category: 'zeroed'}")
      }
      if (pass == 2 && sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        val plan = g.nodesWithLabel("Customer")
          .select(TpchGraph.key(col("id")).as("k"))
          .queryExecution.executedPlan.toString
        println("== setmap read-back plan ==")
        println(plan.linesIterator.filter(l =>
          l.contains("Scan") || l.contains("Join") || l.contains("Union") ||
            l.contains("Checkpoint") || l.contains("Exchange")).mkString("\n"))
      }
      time("verification read-back + sort") {
        // mirrors q_cypher_setmap's single-pass read-back
        val isCust = array_contains(col("labels"), "Customer")
        g.nodes
          .filter(isCust ||
            (array_contains(col("labels"), "Region") && TpchGraph.key(col("id")) === 0))
          .select(TpchGraph.key(col("id")).as("k"), col("name").as("nm"),
            round(col("acctbal"), 4).cast("double").as("bal"),
            col("category").as("cat"),
            when(isCust, array_contains(col("labels"), "Reset"))
              .otherwise(lit(null).cast("boolean")).as("flg"))
          .orderBy(col("k").asc_nulls_first, col("cat").asc_nulls_first)
          .write.format("noop").mode("overwrite").save()
      }
    }

    for (pass <- 1 to 2) {
      println(s"-- q_mut_edge_set pass $pass")
      val tx = time("begin (edge-id assignment)") {
        new graft.GraftSession(spark, TpchGraph(spark, sfDir)).beginTransaction()
      }
      time("mutation 1 (SET r.weight)") {
        tx.cypherUpdate(
          """MATCH (:Order)-[r:CONTAINS]->(p:Part)
            |WHERE p.category = 'Brand#13'
            |SET r.weight = r.weight * 2""".stripMargin)
      }
      time("mutation 2 (DELETE r)") {
        tx.cypherUpdate(
          """MATCH (:Order)-[r:CONTAINS]->(p:Part)
            |WHERE p.category = 'Brand#23'
            |DELETE r""".stripMargin)
      }
      val g2 = time("commit") { tx.commit() }
      time("verification re-aggregation") {
        g2.edges.filter(col("rel") === "CONTAINS")
          .agg(count(lit(1)).as("n"), sum(col("weight")).cast("double").as("total"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
