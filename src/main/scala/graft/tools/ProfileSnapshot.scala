package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level split of the q_graph_snapshot shape (full TpchGraph
  * save → load → filtered agg): times each phase and counts Spark jobs, to
  * attribute the r15 +0.3 s cross-window regression (VERDICT r15 #1).
  *
  * Usage: runMain graft.tools.ProfileSnapshot [sfDir]
  */
object ProfileSnapshot {
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })
    def time[A](label: String)(f: => A): A = {
      Thread.sleep(50)
      val j0 = jobCount.get
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(50)
      println(f"[snap] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s  ${jobCount.get - j0}%2d jobs")
      r
    }

    for (pass <- 1 to 3) {
      println(s"-- pass $pass")
      val path = java.nio.file.Files.createTempDirectory("graft_snapprof").toString
      val g = time("TpchGraph build")(graft.graph.TpchGraph(spark, sfDir))
      time("stats probe nodes") {
        val shrunk = graft.sources.GraphIO.shrinkForWrite(g.nodes)
        println(s"[snap]   nodes est=${g.nodes.queryExecution.analyzed.stats.sizeInBytes} shrunk=${shrunk ne g.nodes}")
      }
      time("stats probe edges") {
        val shrunk = graft.sources.GraphIO.shrinkForWrite(g.edges)
        println(s"[snap]   edges est=${g.edges.queryExecution.analyzed.stats.sizeInBytes} shrunk=${shrunk ne g.edges}")
      }
      time("save")(graft.sources.GraphIO.save(g, path))
      val back = time("load")(graft.sources.GraphIO.load(spark, path))
      time("agg") {
        back.edges.filter(col("rel").isin("FROM_NATION", "PLACED_BY"))
          .groupBy("rel").agg(count(lit(1)).as("cnt"))
          .orderBy("rel").collect()
      }
    }
    spark.stop()
  }
}
