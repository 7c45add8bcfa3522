package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only fixture generator: replicate the driver's sf0.1 parquet N×
  * with per-copy key offsets, producing an sf~1 dataset for the scale gate
  * (`runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies]`).
  *
  * This is NOT test input for the correctness gate (those read the driver's
  * tables verbatim) — it exists so the bench can be run at 10× data with the
  * distributed algorithm branches forced hot (SPARK_GRAFT_MAX_EDGES=0),
  * answering "does the plan survive a scale-up" with measurements instead of
  * plan-reading.
  *
  * Replication preserves referential integrity (every foreign key is offset
  * by the same per-copy stride as its target's primary key) and workload
  * shape: text/embedding payloads are perturbed per copy so near-duplicate
  * structure grows linearly with the data (10× pairs), not quadratically
  * (identical payloads across copies would manufacture 45× cross-copy
  * duplicate pairs and change the workload, not scale it).
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Key stride per table: one comfortably above the source max, shared by
    // every foreign-key reference so joins land on the same replica.
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionAll _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // region + nation keep their small fixed domains (nationkey/regionkey are
    // int32 dimension keys every replica shares, like a real warehouse dim).
    Seq("region", "nation").foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    }

    val cust = spark.read.parquet(s"$src/customer.parquet")
    val supp = spark.read.parquet(s"$src/supplier.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val ords = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val cs = stride(cust, "c_custkey"); val ss = stride(supp, "s_suppkey")
    val ps = stride(part, "p_partkey"); val os = stride(ords, "o_orderkey")

    write("customer", replicate(cust) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * cs))
    })
    write("supplier", replicate(supp) { (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * ss))
    })
    write("part", replicate(part) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * ps))
    })
    write("orders", replicate(ords) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * os))
        .withColumn("o_custkey", col("o_custkey") + lit(i * cs))
    })
    write("lineitem", replicate(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * os))
        .withColumn("l_partkey", col("l_partkey") + lit(i * ps))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * ss))
    })

    val ev = graft.core.Tables(spark, src, "events")
    val es = stride(ev, "event_id"); val us = stride(ev, "user_id")
    write("events", replicate(ev) { (d, i) =>
      // user_id offsets keep per-user event density constant (the
      // stream-join/sessionize keys); timestamps are shared so window
      // population grows 10× like a 10×-traffic day would.
      d.withColumn("event_id", col("event_id") + lit(i * es))
        .withColumn("user_id", col("user_id") + lit(i * us))
    })

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val ds = stride(docs, "doc_id")
    write("documents", replicate(docs) { (d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(i * ds))
        .withColumn("text", concat(col("text"), lit(s" rep$i")))
    })

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vs = stride(emb, "vec_id")
    write("embeddings", replicate(emb) { (d, i) =>
      if (i == 0) d
      else d.withColumn("vec_id", col("vec_id") + lit(i * vs))
        // rotate one coordinate per copy: breaks exact-duplicate identity
        // across copies while keeping the vector-space geometry (norms,
        // neighborhoods) statistically identical.
        .withColumn("embedding", transform(col("embedding"),
          (x, j) => when(j === lit(i % 64), x + lit(0.01f * i)).otherwise(x)))
    })

    spark.stop()
  }
}
