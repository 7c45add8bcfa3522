package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level split of the epoch-commit floor queries (q_tx_conflict /
  * q_epoch_diff_lpg shapes): times each commit / validation / diff phase
  * separately and counts the Spark jobs each one launches, so the fixed
  * per-job overhead is attributable to a specific call.
  *
  * Usage: runMain graft.tools.ProfileEpoch [sfDir]
  */
object ProfileEpoch {
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
      Thread.sleep(50) // let queued listener events drain
      val j0 = jobCount.get
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(50)
      println(f"[epoch] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s  ${jobCount.get - j0}%2d jobs")
      r
    }

    val tiny = sys.env.contains("GRAFT_TINY_PLAN")
    for (pass <- 1 to 3) {
      println(s"-- pass $pass (tinyPlan=$tiny)")
      if (tiny) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
      }
      val base = graft.graph.TpchGraph(spark, sfDir)
      val customers = graft.graph.PropertyGraph(
        base.nodes.filter(array_contains(col("labels"), "Customer")),
        base.edges.limit(0))
      val sess = new graft.GraftSession(spark, customers)
      println(s"[epoch]   customers nodes est=${customers.nodes.queryExecution.analyzed.stats.sizeInBytes} " +
        s"shrunk=${graft.sources.GraphIO.shrinkForWrite(customers.nodes) ne customers.nodes}")

      // q_tx_conflict shape
      val path = java.nio.file.Files.createTempDirectory("graft_pe_tx").toString
      time("full commit (e0)") {
        graft.sources.GraphIO.Epochs.commit(sess.graph, path)
      }
      val tx1 = sess.beginTransaction(path)
      val tx2 = sess.beginTransaction(path)
      time("tx1 cypherUpdate") {
        tx1.cypherUpdate(
          "MATCH (c:Customer) WHERE c.category = 'BUILDING' SET c.acctbal = c.acctbal * 2")
      }
      time("tx2 cypherUpdate") {
        tx2.cypherUpdate(
          "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'")
      }
      time("tx1 commitChecked (no val)") { tx1.commitEpochChecked() }
      time("tx2 commitChecked (conflict)") {
        try tx2.commitEpochChecked()
        catch { case _: graft.tx.OptimisticTx.WriteConflictException => -1L }
      }
      val retry = sess.beginTransaction(path)
      time("retry cypherUpdate") {
        retry.cypherUpdate(
          "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'")
      }
      time("retry commitChecked (merge)") { retry.commitEpochChecked() }

      // q_epoch_diff_lpg shape
      val path2 = java.nio.file.Files.createTempDirectory("graft_pe_diff").toString
      val e0 = time("lpg full commit (e0)") {
        graft.sources.GraphIO.Epochs.commitIncremental(customers, path2)
      }
      val retagged = graft.graph.Mutations.setNodeProperty(customers,
        col("category") === "BUILDING", "category", lit("RETAIL"))
      val e1 = time("lpg delta commit (e1)") {
        graft.sources.GraphIO.Epochs.commitIncremental(retagged, path2)
      }
      time("diffNodes + agg") {
        graft.sources.GraphIO.Epochs.diffNodes(spark, path2, e0, e1)
          .groupBy("change").agg(count(lit(1)).as("n"))
          .orderBy("change")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
