package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-level split of q_cdc_neardup (the suite's slowest query): times
  * the two epoch commits, the two incremental streaming runs, and the
  * final pair read separately, so optimization effort lands on the actual
  * cost and not a guess.
  *
  * Usage: runMain graft.tools.ProfileCdc [sfDir]
  */
object ProfileCdc {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cdc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (pass <- 1 to 3) {
      println(s"-- pass $pass")
      val base = graft.core.Tables.documents(spark, sfDir).filter(col("doc_id") < 150)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val ws = split(col("text"), " ")
      val k = greatest(floor(size(ws) * 4 / 5).cast("int"), lit(3))
      val planted = base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(ws, lit(1), k)).as("text"))
      def asGraph(docs: org.apache.spark.sql.DataFrame) =
        graft.graph.PropertyGraph(
          docs.select(col("doc_id").as("id"),
            array(lit("Document")).as("labels"), col("text")),
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
            StructType(Seq(StructField("src", LongType),
              StructField("dst", LongType), StructField("rel", StringType)))))
      val store = java.nio.file.Files.createTempDirectory("graft_cdcp_store").toString
      val work = java.nio.file.Files.createTempDirectory("graft_cdcp_work").toString
      time("commit 1 (full)") {
        graft.streaming.CdcStreams.commitWithFeed(asGraph(base), store)
      }
      time("commit 2 (delta)") {
        graft.streaming.CdcStreams.commitWithFeed(
          asGraph(base.unionByName(planted)), store,
          prevGraph = Some(asGraph(base)))
      }
      time("catch-up run (both)") {
        graft.streaming.CdcStreams.incrementalNearDupRun(spark, store, work,
          idCol = "id", textCol = "text")
      }
      time("pair read + sort") {
        graft.streaming.CdcStreams.nearDupPairs(spark, work)
          .select(col("id1"), col("id2"), col("jac"))
          .orderBy("id1", "id2")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
