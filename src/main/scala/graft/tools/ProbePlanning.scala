package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes a catalog query's steady-state wall into driver phases:
  * DataFrame construction (front-end + compile + analysis), physical
  * planning (executedPlan force), and execution (noop write, which re-plans
  * the write command itself). Pins how much of the bench floor is Catalyst
  * planning rather than job execution.
  *
  * Usage: runMain graft.tools.ProbePlanning <q1,q2,...> [sfDir] [reps]
  */
object ProbePlanning {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
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

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+physical
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[plan] $name%-24s rep $r construct ${(t1 - t0) / 1e9}%6.3f  plan ${(t2 - t1) / 1e9}%6.3f  write ${(t3 - t2) / 1e9}%6.3f  total ${(t3 - t0) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
