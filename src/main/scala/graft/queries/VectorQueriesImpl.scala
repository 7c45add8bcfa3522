package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.vector.Knn

/** Vector search coverage (SURVEY §2.7: VectorScan plan.rs:752-786,
  * VectorJoin plan.rs:809-838, distance functions filter.rs:994-1050).
  * Oracles cast embeddings to DOUBLE[] because DuckDB's list_* kernels
  * compute in float32 on FLOAT lists while we compute in double.
  */
object VectorQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // The four distance metrics as column expressions over adjacent pairs.
    QueryDef(
      "q_vector_distance",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos,
        |       round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS dot,
        |       round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS euc,
        |       round(list_sum(list_transform(range(len(a.embedding)),
        |             i -> abs(CAST(a.embedding[i+1] AS DOUBLE) - CAST(b.embedding[i+1] AS DOUBLE)))), 6) AS man
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 30
        |ORDER BY id1 NULLS FIRST""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("__va")).filter(col("id1") < 30)
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("__vb"))
      a.join(b, col("id2") === col("id1") + 1)
        .select(col("id1"), col("id2"),
          round(cosineSimilarity(col("__va"), col("__vb")), 6).as("cos"),
          round(dotProduct(col("__va"), col("__vb")), 6).as("dot"),
          round(euclideanDistance(col("__va"), col("__vb")), 6).as("euc"),
          round(manhattanDistance(col("__va"), col("__vb")), 6).as("man"))
        .orderBy("id1")
    },

    // Brute-force k-NN (VectorJoin; the reference's own fallback path
    // scan_vector.rs) with map-side top-k pruning.
    QueryDef(
      "q_knn_brute",
      """SELECT qid, nid, score, CAST(rn AS INT) AS rank FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS score,
        |         row_number() OVER (
        |           PARTITION BY q.vec_id
        |           ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
        |                    c.vec_id) AS rn
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id) t
        |WHERE rn <= 5
        |ORDER BY qid NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Knn.bruteForceTopK(
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, metric = Knn.Cosine)
        .orderBy("qid", "rank")
    },

    // Embedding-cosine near-duplicate pairs (dedup primitive).
    QueryDef(
      "q_embed_neardup",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        |ORDER BY id1 NULLS FIRST, id2 NULLS FIRST""".stripMargin) { (s, dir) =>
      Knn.nearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.35)
        .orderBy("id1", "id2")
    },

    // IVF approximate k-NN (k-means coarse quantizer + probe lists) — the
    // other scale path; recall asserted in KnnSpec.
    QueryDef.noOracle("q_knn_ivf") { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val model = graft.vector.Ivf.fit(e, "vec_id", "embedding", nlist = 8, iters = 2)
      graft.vector.Ivf.topK(model,
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, nprobe = 3)
        .orderBy("qid", "rank")
    },

    // LSH-bucketed approximate k-NN — the 100 TB scale path. Approximate by
    // construction → rows-only driver check; recall vs brute force is
    // asserted in KnnSpec.
    QueryDef.noOracle("q_knn_lsh") { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Knn.lshTopK(
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, dim = 64,
          metric = Knn.Cosine, bits = 8, tables = 4)
        .orderBy("qid", "rank")
    },
  )
}
