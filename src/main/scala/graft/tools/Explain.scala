package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally timings) of
  * catalog queries — `runMain graft.tools.Explain <sfDir> <query…>`.
  * Add `--time` to also execute each query and print wall seconds.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val time = args.contains("--time")
    val rest = args.filterNot(_ == "--time")
    val sfDir = rest(0)
    val names = rest.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (time) {
        val t0 = System.nanoTime()
        val cnt = df.count()
        println(f"[time] $n rows=$cnt ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
