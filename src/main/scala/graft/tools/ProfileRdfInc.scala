package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{L, TpchRdf, TripleGraph, TriplePattern, V}

/** Phase split of q_rdf_incremental (the e0-floor attribution tool, r17).
  * Usage: runMain graft.tools.ProfileRdfInc [sfDir] [reps]
  */
object ProfileRdfInc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
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
    val jc = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jc.incrementAndGet()
    })
    for (r <- 1 to reps) {
      def ph[A](label: String)(f: => A): A = {
        val j0 = jc.get; val t0 = System.nanoTime(); val res = f
        println(f"[rdfinc:r$r] $label%-18s ${(System.nanoTime() - t0) / 1e9}%5.2f s ${jc.get - j0}%2d jobs")
        res
      }
      val t0 = System.nanoTime()
      val path = java.nio.file.Files.createTempDirectory("graft_pri").toString
      val seg = TripleGraph(TpchRdf(spark, sfDir).triples.filter(col("p") === "segment"))
      val e0 = ph("commit e0")(graft.sources.GraphIO.Epochs.commitTriplesIncremental(seg, path))
      val seg0 = graft.sources.GraphIO.Epochs.asOfTriples(spark, path, e0)
      val (_, adds1, removes1) = ph("modify 1")(seg0.modifyWithDelta(
        where = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
        deleteTpl = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
        insertTpl = Seq(TriplePattern(V("c"), L("segment"), L("RETAIL")))))
      val e1 = ph("commit d1")(graft.sources.GraphIO.Epochs.commitTriplesDelta(spark, path, adds1, removes1))
      val m1 = graft.sources.GraphIO.Epochs.asOfTriples(spark, path, e1)
      val (_, adds2, removes2) = ph("modify 2")(m1.modifyWithDelta(
        where = Seq(TriplePattern(V("c"), L("segment"), L("MACHINERY"))),
        deleteTpl = Seq(TriplePattern(V("c"), L("segment"), L("MACHINERY"))),
        insertTpl = Seq.empty))
      val e2 = ph("commit d2")(graft.sources.GraphIO.Epochs.commitTriplesDelta(spark, path, adds2, removes2))
      ph("count union")(Seq(e0, e1, e2).map { e =>
        graft.sources.GraphIO.Epochs.asOfTriples(spark, path, e)
          .triples.select(lit(e).as("epoch"), col("o"))
      }.reduce(_ unionByName _)
        .groupBy("epoch")
        .agg(count(lit(1)).as("n_total"),
             count(when(col("o") === "BUILDING", 1)).as("n_building"),
             count(when(col("o") === "MACHINERY", 1)).as("n_machinery"))
        .orderBy("epoch")
        .write.format("noop").mode("overwrite").save())
      println(f"[rdfinc:r$r] TOTAL              ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
