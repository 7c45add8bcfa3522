package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-JVM attribution probe for the heavy Cypher-join stages: times the
  * pieces of the hot pipeline (cache scan, filtered scan, broadcast-join
  * sides, exchange) in isolation so per-stage cost can be pinned to an
  * operator instead of guessed from stage task totals.
  *
  * Usage: runMain graft.tools.ProbeScan [sfDir] [reps]
  */
object ProbeScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()

    val g = graft.graph.TpchGraph(spark, sfDir)
    g.nodes.count(); g.edges.count()
    val eg = g.withEdgeIds
    eg.edges.count() // materialize the eid cache

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-38s min ${times.min}%.3f s  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }

    time("nodes: bare cache scan")(g.nodes)
    time("edges: bare cache scan")(g.edges)
    time("eid edges: bare cache scan")(eg.edges)
    time("eid edges: filter rel=CONTAINS")(
      eg.edges.filter(col("rel") === "CONTAINS"))
    time("eid edges: CONTAINS count-only") {
      eg.edges.filter(col("rel") === "CONTAINS").groupBy().count()
    }
    val orders = g.nodes.filter(array_contains(col("labels"), "Order")).select(col("id").as("a"))
    val parts = g.nodes.filter(array_contains(col("labels"), "Part")).select(col("id").as("b"))
    time("left side: CONTAINS ⋈ Order ⋉ Part")(
      eg.edges.filter(col("rel") === "CONTAINS")
        .join(broadcast(orders), col("src") === col("a"))
        .join(broadcast(parts), col("dst") === col("b"), "left_semi")
        .select(col("a"), col("eid")))
    time("left side + exchange by eid")(
      eg.edges.filter(col("rel") === "CONTAINS")
        .join(broadcast(orders), col("src") === col("a"))
        .join(broadcast(parts), col("dst") === col("b"), "left_semi")
        .select(col("a"), col("eid"))
        .repartition(col("eid")))
    time("nodes: array_contains(labels) scan")(
      g.nodes.filter(array_contains(col("labels"), "Order")))
    spark.stop()
  }
}
