package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main: LSH near-dup candidate counts / wall time at
  * different signature sizings on a given sf dir (scale-gate follow-up).
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.embeddings(spark, dir)
    val aug = e.select(col("vec_id"), col("embedding")).unionAll(
      e.filter(col("vec_id") < 30)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))).cache()
    println("n=" + aug.count())
    for ((bits, tables) <- Seq((8, 4), (12, 8), (12, 4), (14, 4), (16, 8))) {
      val t0 = System.nanoTime()
      val b = graft.vector.Knn.lshBuckets(
          aug.select(col("vec_id").as("__id"), col("embedding").as("__v")),
          "__v", 64, bits, tables, 42L)
        .select(col("__id"), explode(col("__buckets")).as("__b"))
      val cand = b.as("l").join(b.as("r"),
          col("l.__b") === col("r.__b") && col("l.__id") < col("r.__id"))
        .select(col("l.__id"), col("r.__id")).distinct().count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val full0 = System.nanoTime()
      val nres = graft.vector.Knn.nearDupPairsLSH(
        aug, "vec_id", "embedding", 0.9, 64, bits, tables).count()
      val full1 = (System.nanoTime() - full0) / 1e9
      println(f"bits=$bits tables=$tables candidates=$cand%,d candTime=$t1%.1fs fullTime=$full1%.1fs results=$nres")
    }
    spark.stop()
  }
}
