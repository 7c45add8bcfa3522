package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.TpchGraph

/** Scratch profiler for the BFS hot path (not part of the driver contract). */
object ProfileBfs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val g = TpchGraph.partDag(spark, dir)
    time("edges.count")(g.edges.count())
    val src = g.nodes.filter(col("id") === 1).select(col("id").as("root"))
    val bfsDf = time("bfs build")(
      g.bfs(src, "root", Seq("LINK"), maxDepth = 6,
        filterNodes = Some(col("__node") <= 200)))
    time("bfs final action")(bfsDf.count())
    val vl = time("varlen build")(
      g.varLengthExpand(g.nodes.filter(col("id").between(1, 3)).select(col("id").as("s")),
        "s", Seq("LINK"), 1, 3))
    time("varlen final action")(vl.count())
    spark.stop()
  }
}
