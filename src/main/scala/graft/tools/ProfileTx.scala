package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.graph.TpchGraph

/** Phase breakdown of the q_tx_conflict body (r16 verdict: 1.21 → 1.68 s
  * cross-window, re-violating its ≤1.2 s bar — attribute before fixing).
  * Same-JVM repeated passes cancel host-window drift; per-phase job counts
  * separate fixed job-floor cost from data cost.
  *
  * Usage: runMain graft.tools.ProfileTx [sfDir] [reps]
  */
object ProfileTx {
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
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        jobNames.add(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
      }
    })
    // warm fixture caches exactly like the bench harness would
    TpchGraph(spark, sfDir).nodes.count()

    def pass(tag: String): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def ph[A](label: String)(f: => A): A = {
        val j0 = jobCount.get
        jobNames.clear()
        val t0 = System.nanoTime(); val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        val names = {
          val b = Seq.newBuilder[String]
          var s = jobNames.poll(); while (s != null) { b += s; s = jobNames.poll() }
          b.result()
        }
        println(f"[tx:$tag]   $label%-16s $dt%5.2f s ${jobCount.get - j0}%2d jobs  ${names.mkString(" | ")}")
        out += label -> dt
        r
      }
      val path = java.nio.file.Files.createTempDirectory("graft_ptx").toString
      val base = TpchGraph(spark, sfDir)
      val sess = new GraftSession(spark, graft.graph.PropertyGraph(
        base.nodes.filter(array_contains(col("labels"), "Customer")),
        base.edges.limit(0)))
      ph("commit e0")(graft.sources.GraphIO.Epochs.commit(sess.graph, path))
      val tx1 = ph("begin tx1")(sess.beginTransaction(path))
      val tx2 = ph("begin tx2")(sess.beginTransaction(path))
      ph("tx1 update")(tx1.cypherUpdate(
        "MATCH (c:Customer) WHERE c.category = 'BUILDING' SET c.acctbal = c.acctbal * 2"))
      ph("tx2 update")(tx2.cypherUpdate(
        "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'"))
      ph("tx1 commit")(tx1.commitEpochChecked())
      ph("tx2 conflict")(try { tx2.commitEpochChecked(); sys.error("expected conflict") }
        catch { case _: graft.tx.OptimisticTx.WriteConflictException => () })
      val retry = ph("begin retry")(sess.beginTransaction(path))
      ph("retry update")(retry.cypherUpdate(
        "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'"))
      val e = ph("retry commit")(retry.commitEpochChecked())
      ph("readback agg")(graft.sources.GraphIO.Epochs.asOf(spark, path, e).nodes
        .filter(array_contains(col("labels"), "Customer"))
        .groupBy(col("category").as("seg"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("acctbal")), 2).cast("double").as("total"))
        .withColumn("conflicts", lit(1L))
        .orderBy("seg")
        .write.format("noop").mode("overwrite").save())
      out.toSeq
    }

    val acc = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val phases = pass(s"r$r")
      println(f"[tx:r$r]   TOTAL            ${(System.nanoTime() - t0) / 1e9}%5.2f s")
      phases.foreach { case (l, d) => acc(l) = d :: acc.getOrElse(l, Nil) }
    }
    println("== min over reps ==")
    acc.foreach { case (l, ds) => println(f"   $l%-16s ${ds.min}%5.2f s") }
    println(f"   TOTAL(min-sum)   ${acc.values.map(_.min).sum}%5.2f s")
    spark.stop()
  }
}
