package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the fixture edge-cache rel clustering
  * (TpchGraph.partitioned): builds the edge frame twice — hash-partitioned
  * by src with and without sortWithinPartitions("rel") — caches both, and
  * times rel-filtered scans + a 1-hop expand against each. Both variants
  * live in one session, so host-window drift cancels.
  *
  * Usage: runMain graft.tools.ProfileRelCluster [sfDir] [reps]
  */
object ProfileRelCluster {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = graft.graph.TpchGraph.build(spark, sfDir)
    val p = spark.sparkContext.defaultParallelism
    val plain = g.edges.repartition(p, col("src")).persist()
    val sorted = g.edges.repartition(p, col("src"))
      .sortWithinPartitions("rel").persist()
    val nodes = g.nodes.repartition(p, col("id")).persist()
    println(s"[cluster] edges=${plain.count()} (sorted=${sorted.count()}), nodes=${nodes.count()}")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[cluster] $label%-34s $s%.3f s"); s
    }
    def scan(e: org.apache.spark.sql.DataFrame, rel: String): Unit =
      e.filter(col("rel") === rel).agg(sum("src")).collect()
    def hop(e: org.apache.spark.sql.DataFrame, rel: String): Unit =
      e.filter(col("rel") === rel)
        .join(nodes.select(col("id")), col("dst") === col("id"))
        .agg(count(lit(1))).collect()

    // warm both caches
    scan(plain, "FROM_NATION"); scan(sorted, "FROM_NATION")
    for (r <- 1 to reps) {
      println(s"== rep $r")
      for (rel <- Seq("FROM_NATION", "PLACED_BY", "CONTAINS")) {
        val a = time(s"scan  $rel plain")(scan(plain, rel))
        val b = time(s"scan  $rel sorted")(scan(sorted, rel))
        val c = time(s"hop   $rel plain")(hop(plain, rel))
        val d = time(s"hop   $rel sorted")(hop(sorted, rel))
        println(f"[cluster] $rel%-12s scan ${a / b}%.2fx  hop ${c / d}%.2fx (plain/sorted)")
      }
    }
    spark.stop()
  }
}
