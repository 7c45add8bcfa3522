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
  * shape. Payload perturbation guarantees: embeddings get a per-copy
  * ORTHOGONAL transform (cyclic coordinate shift + seeded sign flips) —
  * intra-copy geometry (norms, distances, neighborhoods) is preserved
  * EXACTLY while cross-copy cosine collapses to ~0, far below every
  * near-dup/kNN threshold; document text gets a per-copy token interleaved
  * between words — intra-copy shingle structure is order-preserved while
  * cross-copy shingle Jaccard collapses to ~0. So BOTH exact- and
  * near-duplicate structure grows linearly with the data (10× pairs), not
  * quadratically (un-perturbed copies would manufacture C(10,2)=45×
  * cross-copy near-dup pairs and change the workload, not scale it).
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
    // every foreign-key reference so joins land on the same replica. Cast to
    // bigint first so an int32-keyed testdata regeneration can't ClassCast.
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("bigint"))).head.getLong(0) + 1

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

    // Replicated entities are NEW entities, not clones: entity-name columns
    // must be unique per copy, or name-keyed distinct semantics (Cypher
    // UNION dedup, DISTINCT name projections) diverge from the key-scaled
    // SQL oracles — with verbatim names the sf1 self-check's q_cypher_union
    // returned 691 distinct names against the oracle's 6910 rows. Copy 0
    // stays byte-identical to the source.
    def renamed(d: DataFrame, i: Int, nameCol: String): DataFrame =
      if (i == 0) d
      else d.withColumn(nameCol, concat(col(nameCol), lit(s"_r$i")))

    write("customer", replicate(cust) { (d, i) =>
      renamed(d, i, "c_name").withColumn("c_custkey", col("c_custkey") + lit(i * cs))
    })
    write("supplier", replicate(supp) { (d, i) =>
      renamed(d, i, "s_name").withColumn("s_suppkey", col("s_suppkey") + lit(i * ss))
    })
    write("part", replicate(part) { (d, i) =>
      renamed(d, i, "p_name").withColumn("p_partkey", col("p_partkey") + lit(i * ps))
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
    val hasNChars = docs.columns.contains("n_chars")
    write("documents", replicate(docs) { (d, i) =>
      if (i == 0) d
      else {
        // Tag every SECOND word with a copy-specific suffix: every 2-/3-gram
        // shingle window then contains a tagged word, so cross-copy shingle
        // Jaccard is EXACTLY 0 — zero manufactured near-dup pairs at the
        // output AND zero cross-copy LSH candidates (a partial overlap like
        // 0.4 would still band-collide ~75% of the C(10,2)=45 cross-copy
        // pairs per source doc at the 0.5-threshold banding, the quadratic
        // candidate distortion this perturbation exists to avoid). Word
        // count is unchanged and text volume grows only ~20%, so the
        // text-query workload stays ~linear in the copy count; docs that
        // were near-dups WITHIN the source stay near-dups in every copy
        // (both sides transformed identically, word order preserved).
        val perturbed = d.withColumn("doc_id", col("doc_id") + lit(i * ds))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+\\s+\\S+)", s"$$1·c$i"))
        if (hasNChars) perturbed.withColumn("n_chars", length(col("text")))
        else perturbed
      }
    })

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vs = stride(emb, "vec_id")
    // Derive the dimension from the data, never hardcode it.
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    write("embeddings", replicate(emb) { (d, i) =>
      if (i == 0) d
      else d.withColumn("vec_id", col("vec_id") + lit(i * vs))
        // Per-copy orthogonal transform: cyclically shift coordinates by a
        // copy-specific offset, then flip signs from a seeded hash. Both are
        // orthogonal maps applied uniformly within the copy, so EVERY
        // intra-copy norm/distance/neighborhood is preserved exactly (the
        // kNN / near-dup workload per replica is identical to the source),
        // while cross-copy cosine decorrelates to ~0 — no cross-copy
        // candidates survive any 0.8/0.9 similarity threshold.
        .withColumn("embedding", transform(col("embedding"), (_, j) => {
          val shifted = element_at(col("embedding"),
            (pmod(j + lit(i * 7 % dim), lit(dim)) + 1).cast("int"))
          when(pmod(hash(lit(i * 31), j), lit(2)) === 0, shifted)
            .otherwise(-shifted)
        }))
    })

    spark.stop()
  }
}
