package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{L, TpchRdf, TripleGraph, TriplePattern, V}

/** Intra-JVM A/B of the q_epoch_diff shape: e1 as a FULL snapshot commit
  * (diff = corpus anti-joins) vs e1 as a DELTA commit (diff = stored delta
  * readback). Alternating passes in one JVM cancel host-window drift.
  *
  * Usage: runMain graft.tools.ProfileDiff [sfDir]
  */
object ProfileDiff {
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })

    def phased(): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def ph[A](label: String)(f: => A): A = {
        Thread.sleep(30)
        val j0 = jobCount.get
        val t0 = System.nanoTime(); val r = f
        Thread.sleep(30)
        println(f"[diff]   $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s ${jobCount.get - j0}%2d jobs")
        out += label -> (System.nanoTime() - t0) / 1e9; r
      }
      val path = java.nio.file.Files.createTempDirectory("graft_pd").toString
      val seg = ph("lineage")(TripleGraph(TpchRdf(spark, sfDir).triples.filter(col("p") === "segment")))
      val e0 = ph("commit e0")(graft.sources.GraphIO.Epochs.commitTriples(seg, path))
      val seg0 = ph("asOf e0")(graft.sources.GraphIO.Epochs.asOfTriples(spark, path, e0))
      val (_, adds, removes) = ph("modifyWithDelta")(seg0.modifyWithDelta(
        where = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
        deleteTpl = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
        insertTpl = Seq(TriplePattern(V("c"), L("segment"), L("RETAIL")))))
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        adds.unionByName(removes).explain("formatted")
      }
      val e1 = ph("commit delta")(graft.sources.GraphIO.Epochs.commitTriplesDelta(spark, path, adds, removes))
      ph("diff+agg")(graft.sources.GraphIO.Epochs.diffTriples(spark, path, e0, e1)
        .groupBy("change", "o").agg(count(lit(1)).as("n"))
        .orderBy("change")
        .write.format("noop").mode("overwrite").save())
      out.toSeq
    }
    phased() // warm
    for (pass <- 1 to 3) {
      System.gc(); Thread.sleep(150)
      val r = phased()
      println(f"[diff] pass $pass  total=${r.map(_._2).sum}%.2f  " +
        r.map { case (l, t) => f"$l=$t%.2f" }.mkString("  "))
    }
    spark.stop()
  }
}
