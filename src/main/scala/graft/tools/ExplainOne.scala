package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed plan of one catalog query at a given SF — the
  * .explain feedback loop as a one-liner.
  * Usage: runMain graft.tools.ExplainOne <query> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same opt-in hook as Bench/Verify, so plan-shape probes can compare
    // cycleSplit modes at any SF
    sys.env.get("SPARK_GRAFT_CYCLE_SPLIT").foreach { v =>
      spark.conf.set("spark.graft.cypher.cycleSplit", v)
    }
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("== executed plan ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
