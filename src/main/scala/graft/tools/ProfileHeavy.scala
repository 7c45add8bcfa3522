package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling harness for the heaviest bench queries — same session
  * shape and warm-up as graft.Bench, restricted to the queries under
  * optimization so an edit-measure loop takes seconds, not a full bench run.
  *
  * Usage: runMain graft.tools.ProfileHeavy [sfDir] [query ...]
  */
object ProfileHeavy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_louvain", "q_sparql_path", "q_topo_levels", "q_pagerank",
        "q_knn_lsh", "q_label_prop", "q_knn_ivf", "q_shortest_path")
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
    graft.core.Tables.all.foreach { t =>
      try graft.core.Tables(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => }
    }
    try {
      graft.graph.TpchGraph(spark, sfDir).nodes.count()
      graft.graph.TpchGraph(spark, sfDir).edges.count()
      graft.graph.TpchGraph.partDag(spark, sfDir).nodes.count()
      graft.graph.TpchGraph.partDag(spark, sfDir).edges.count()
    } catch { case _: Throwable => }

    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $n%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
