package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vector.{Ivf, Knn}

/** Recall@k measurement for the approximate ANN paths against brute force —
  * the parity evidence the reference publishes for HNSW (>95% recall@10 at
  * ef=64, docs/ecosystem/performance.md:128). Prints recall of `lshTopK`
  * and `Ivf.topK` at the configurations the catalog queries use, over the
  * testdata embeddings at the given SF.
  *
  * Usage: runMain graft.tools.RecallCheck [sfDir] [nQueries] [k]
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < nq)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Knn.bruteForceTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k))

    def recallOf(name: String, got: Set[(Long, Long)]): Double = {
      val r = (brute & got).size.toDouble / brute.size
      println(f"[recall] $name%-28s recall@$k = $r%.4f")
      r
    }
    recallOf("lsh bits=8 tables=4",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 4)))
    recallOf("lsh bits=8 tables=8",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 8)))
    val m8 = Ivf.fit(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    recallOf("ivf nlist=8 nprobe=3",
      pairs(Ivf.topK(m8, queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, nprobe = 3)))
    val m16 = Ivf.fit(emb, "vec_id", "embedding", nlist = 16, iters = 3)
    recallOf("ivf nlist=16 nprobe=4",
      pairs(Ivf.topK(m16, queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, nprobe = 4)))
    recallOf("ivf nlist=16 nprobe=8",
      pairs(Ivf.topK(m16, queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, nprobe = 8)))
    recallOf("lsh bits=4 tables=16",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, dim = 64, bits = 4, tables = 16)))
    recallOf("lsh bits=8 tables=4 probes=2",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 4, probes = 2)))
    recallOf("lsh bits=8 tables=8 probes=3",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 8, probes = 3)))
    recallOf("hnsw m=16 efS=64",
      pairs(graft.vector.Hnsw.topK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k, efSearch = 64)))

    // Clustered corpus — the data shape real embedding spaces have (and the
    // shape the reference's >95%@ef=64 HNSW claim is measured on): 12 jittered
    // copies of every query vector planted into the corpus; true neighbors
    // are the same-cluster members.
    val jittered = (1 to 12).map { j =>
      queries.select((col("vec_id") * 1000 + j).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.0f) + lit((j * 7 % 5 - 2) * 0.01f)).as("embedding"))
    }.reduce(_ unionByName _)
    val corpus2 = emb.select("vec_id", "embedding").unionByName(jittered)
    val brute2 = pairs(Knn.bruteForceTopK(queries, "vec_id", "embedding",
      corpus2, "vec_id", "embedding", k))
    def recallC(name: String, got: Set[(Long, Long)]): Unit =
      println(f"[recall] $name%-28s recall@$k = ${(brute2 & got).size.toDouble / brute2.size}%.4f (clustered)")
    recallC("lsh bits=8 tables=4",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        corpus2, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 4)))
    recallC("lsh bits=8 tables=4 probes=2",
      pairs(Knn.lshTopK(queries, "vec_id", "embedding",
        corpus2, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 4, probes = 2)))
    val m2 = Ivf.fit(corpus2, "vec_id", "embedding", nlist = 8, iters = 2)
    recallC("ivf nlist=8 nprobe=3",
      pairs(Ivf.topK(m2, queries, "vec_id", "embedding",
        corpus2, "vec_id", "embedding", k, nprobe = 3)))

    // Auto-tune standing on the REAL corpus shape (not the clustered toy the
    // suite pins): start from the documented footgun config and let
    // autoTuneLsh walk the measured curve — the row RECALL.txt publishes is
    // the history plus the best config's recall, proving the walk behaves on
    // data whose distances concentrate (reference analog: the ef-tuning
    // table, performance.md:124-131).
    {
      import graft.frontends.gql.{GqlFrontend, GqlCreateVectorIndex, VectorIndexes}
      val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
      val stmt = GqlFrontend.parseStatement(
        "CREATE VECTOR INDEX recall_tuned ON Doc(embedding) USING LSH " +
          "OPTIONS(bits 16, tables 1)").asInstanceOf[GqlCreateVectorIndex]
      val (idx, best, hist) = VectorIndexes.autoTuneLsh(stmt, corpus, "id",
        floor = 0.9, maxSteps = 3)
      val walk = hist.map { case (b, t, r) => f"($b,$t)->$r%.2f" }.mkString(" ")
      println(f"[recall] lsh auto-tune walk: $walk%s")
      println(f"[recall] lsh auto-tuned bits=${idx.options("bits")}%d " +
        f"tables=${idx.options("tables")}%d recall@$k = $best%.4f (uniform)")
      idx.buckets.unpersist()
    }
    spark.stop()
  }
}
