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

    // Embedding cluster assignment (one k-means E-step with fixed, data-
    // derived centroids — the topic-bucketing op for corpus analysis):
    // every vector joins the BROADCAST 8-centroid table, takes its argmax
    // cosine (rounded-then-ranked with a cid tie-break, the q_knn_brute
    // determinism pattern), and cluster sizes + mean similarity come back.
    // One map-side pass over the corpus + a tiny per-vector top-1 — the
    // shape an iterative k-means repeats per step at 100 TB.
    QueryDef(
      "q_embed_cluster",
      """WITH cent AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
        |), a AS (
        |  SELECT e.vec_id AS vid, c.cid,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) AS sim,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) DESC,
        |                    c.cid) AS rn
        |  FROM embeddings e, cent c
        |)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n, round(avg(sim), 3) AS avg_sim
        |FROM a WHERE rn = 1
        |GROUP BY cid
        |ORDER BY cid NULLS FIRST""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Knn.assignToCentroids(e, "vec_id", "embedding", cent, "cid", "cvec")
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), round(avg(col("__sim")), 3).as("avg_sim"))
        .orderBy(col("cid").asc_nulls_first)
    },

    // Embedding-cosine near-duplicate pairs through the LSH-bucketed plan —
    // the 100-TB shape (band equi-join, no all-pairs). Exact copies of the
    // first 30 vectors are planted in-query (id + 100000): identical vectors
    // hash to identical signatures in every table, so at a true near-dup
    // threshold (0.9; the corpus' max natural pair is 0.60) LSH recall is 1
    // by construction and the query stays hash-exact against the all-pairs
    // oracle.
    QueryDef(
      "q_embed_neardup",
      """WITH aug AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id < 30)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |       round(list_cosine_similarity(a.v, b.v), 6) AS score
        |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9
        |ORDER BY id1 NULLS FIRST, id2 NULLS FIRST""".stripMargin) { (s, dir) =>
      Knn.nearDupPairsLSH(augmented(Tables.embeddings(s, dir), 30),
          "vec_id", "embedding", threshold = 0.9, dim = 64)
        .orderBy("id1", "id2")
    },

    // SemDeDup (Knn.semDedup, Abbas et al. 2023): cluster-then-dedup over
    // the same planted-copy corpus as q_embed_neardup — per-cluster member
    // and removal counts (every planted exact copy has a lower-id mate at
    // cosine 1 in its own cluster; legit pairs top out at ~0.49 here).
    QueryDef(
      "q_semdedup",
      """WITH aug AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id < 30),
        |cent AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |a AS (
        |  SELECT g.vec_id AS vid, g.v, c.cid,
        |         row_number() OVER (PARTITION BY g.vec_id
        |           ORDER BY round(list_cosine_similarity(g.v, c.cvec), 6) DESC,
        |                    c.cid) AS rn
        |  FROM aug g, cent c),
        |m AS (SELECT vid, v, cid FROM a WHERE rn = 1),
        |dup AS (
        |  SELECT DISTINCT b.vid
        |  FROM m a2 JOIN m b ON a2.cid = b.cid AND a2.vid < b.vid
        |  WHERE round(list_cosine_similarity(a2.v, b.v), 6) >= 0.99)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN vid IN (SELECT vid FROM dup) THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        |FROM m GROUP BY cid
        |ORDER BY cid NULLS FIRST""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Knn.semDedup(augmented(e, 30), "vec_id", "embedding",
          cent, "cid", "cvec", tau = 0.99)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"),
          sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"))
        .orderBy(col("cid").asc_nulls_first)
    },

    // Incremental near-dup at a low threshold: a small new batch scored
    // against the full corpus (broadcast batch, streaming corpus) — exact,
    // and the realistic continuous-ingest shape; exact ALL-pairs at low
    // thresholds is inherently O(n²) and lives only in tests.
    QueryDef(
      "q_embed_batchdup",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id AND (a.vec_id < 50 OR b.vec_id < 50)
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        |ORDER BY id1 NULLS FIRST, id2 NULLS FIRST""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Knn.nearDupAgainst(e.filter(col("vec_id") < 50), e,
          "vec_id", "embedding", threshold = 0.35)
        .orderBy("id1", "id2")
    },

    // IVF approximate k-NN (k-means coarse quantizer + probe lists). Exact
    // copies of the 5 query vectors are planted in the corpus: a copy lands
    // in the query's own cell (identical assignment), which the probe list
    // always contains, so top-1 is deterministic and oracle-exact. Recall@k
    // on natural data is asserted in IvfSpec.
    QueryDef(
      "q_knn_ivf",
      knnPlantedOracle) { (s, dir) =>
      val aug = augmented(Tables.embeddings(s, dir), 5)
      // fit-once via the model registry — the registered-index usage path;
      // re-fitting per execution would dominate the query's own time
      val model = graft.vector.Ivf.fitCached(s"aug5:$dir", aug,
        "vec_id", "embedding", nlist = 8, iters = 2)
      graft.vector.Ivf.topK(model,
          aug.filter(col("vec_id") < 5), "vec_id", "embedding",
          aug, "vec_id", "embedding", k = 1, nprobe = 3)
        .orderBy("qid", "rank")
    },

    // LSH-bucketed approximate k-NN — the 100 TB scale path. Same planted
    // top-1 contract: identical vectors collide in every hash table, so the
    // bucketed plan provably returns the planted copy at rank 1. Recall@k on
    // natural data is asserted in KnnSpec.
    QueryDef(
      "q_knn_lsh",
      knnPlantedOracle) { (s, dir) =>
      val aug = augmented(Tables.embeddings(s, dir), 5)
      // registered-index path: corpus buckets are hashed once and stored
      // (CREATE VECTOR INDEX lifecycle); the query hashes only its own side
      // and joins the stored assignment. Identical vectors still collide in
      // every base bucket, so the planted top-1 stays provable.
      val idx = lshIndexCache.getOrElseUpdate(s"aug5:$dir", {
        val i = graft.frontends.gql.VectorIndexes.create(
          graft.frontends.gql.GqlCreateVectorIndex("bench_lsh", "Embedding",
            "embedding", "lsh", Map("bits" -> 8, "tables" -> 4)),
          aug, "vec_id")
        i.buckets.count() // materialize the stored assignment at build time
        i
      })
      idx.search(aug.filter(col("vec_id") < 5), "vec_id", "embedding", k = 1)
        .orderBy("qid", "rank")
    },

    // Partitioned HNSW (the reference's own ANN engine, hnsw.rs; SURVEY
    // §2.7's block-partitioned plan): one graph per corpus partition,
    // broadcast queries, global top-k merge. Same planted top-1 contract —
    // the exact copy sits at cosine 1.0, rank 1 by the beam search's
    // distance order. Determinism: id-hashed layer levels, id tie-breaks.
    QueryDef(
      "q_knn_hnsw",
      knnPlantedOracle) { (s, dir) =>
      val aug = augmented(Tables.embeddings(s, dir), 5)
      // build-once via the index registry (the CREATE VECTOR INDEX
      // lifecycle); the query searches the stored per-partition graphs
      val idx = graft.vector.Hnsw.buildCached(s"aug5:$dir", aug,
        "vec_id", "embedding", m = 16, efConstruction = 100)
      graft.vector.Hnsw.searchIndex(idx,
          aug.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 1, efSearch = 64)
        .orderBy("qid", "rank")
    },

    // Persisted HNSW (the reference serializes its index with the
    // database): save the built per-partition graphs to parquet, load
    // them back, and search the LOADED index — the round-trip must still
    // find every planted duplicate, same oracle as q_knn_hnsw.
    QueryDef(
      "q_knn_hnsw_persist",
      knnPlantedOracle) { (s, dir) =>
      val aug = augmented(Tables.embeddings(s, dir), 5)
      val built = graft.vector.Hnsw.buildCached(s"aug5:$dir", aug,
        "vec_id", "embedding", m = 16, efConstruction = 100)
      val path = java.nio.file.Files.createTempDirectory("graft_hnsw").toString
      graft.vector.Hnsw.save(built, path)
      val loaded = graft.vector.Hnsw.load(s, path)
      try graft.vector.Hnsw.searchIndex(loaded,
          aug.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 1, efSearch = 64)
        .orderBy("qid", "rank")
        .localCheckpoint()
      finally loaded.unpersist(blocking = false)
    },

    // Scalar quantization (vector/quantization.rs): per-dimension min/max
    // codebook, code = floor((x-min)/(max-min)·255). min/max are exact
    // selections (not sums) and the map is one IEEE expression chain, so
    // both engines produce identical codes.
    QueryDef(
      "q_vector_quantize",
      """WITH e AS (
        |  SELECT vec_id,
        |         unnest(CAST(embedding AS DOUBLE[])) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings
        |),
        |mm AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM e GROUP BY pos)
        |SELECT e.vec_id, CAST(e.pos AS INT) AS pos,
        |       CAST(CASE WHEN mx = mn THEN 0
        |                 ELSE floor((e.v - mn) / (mx - mn) * 255) END AS BIGINT) AS q
        |FROM e JOIN mm ON mm.pos = e.pos
        |WHERE e.vec_id < 20
        |ORDER BY vec_id NULLS FIRST, pos NULLS FIRST""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val model = graft.vector.Quantization.fitScalar(emb, "embedding", bits = 8)
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id"),
          posexplode(model.quantize(col("embedding"))).as(Seq("pos0", "q")))
        .select(col("vec_id"), (col("pos0") + 1).cast("int").as("pos"), col("q"))
        .orderBy("vec_id", "pos")
    },

    // Binary (sign) quantization packed into 32-bit words — integer bit
    // sums are exact in any engine; dim 64 → two words per vector.
    QueryDef(
      "q_vector_binquant",
      """SELECT vec_id, CAST(word AS INT) AS word, CAST(sum(b) AS BIGINT) AS code
        |FROM (
        |  SELECT vec_id,
        |         (pos - 1) // 32 AS word,
        |         CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << ((pos - 1) % 32)) ELSE 0 END AS b
        |  FROM (SELECT vec_id,
        |               unnest(CAST(embedding AS DOUBLE[])) AS v,
        |               generate_subscripts(embedding, 1) AS pos
        |        FROM embeddings)
        |)
        |WHERE vec_id < 100
        |GROUP BY vec_id, word
        |ORDER BY vec_id NULLS FIRST, word NULLS FIRST""".stripMargin) { (s, dir) =>
      graft.vector.Quantization.binaryCodes(
          Tables.embeddings(s, dir).filter(col("vec_id") < 100),
          "vec_id", "embedding")
        .orderBy("vec_id", "word")
    },
  )

  /** Process-lifetime registered-index cache for the bench queries (the
    * CREATE VECTOR INDEX lifecycle; same pattern as Ivf.fitCached).
    */
  private val lshIndexCache = scala.collection.concurrent.TrieMap
    .empty[String, graft.frontends.gql.VectorIndexes.VectorIndex]

  /** Base embedding table plus exact copies of the first `n` vectors at
    * vec_id + 100000 — planted true near-duplicates for the ANN oracles.
    */
  private def augmented(e: org.apache.spark.sql.DataFrame, n: Int) =
    e.select(col("vec_id"), col("embedding")).unionAll(
      e.filter(col("vec_id") < n)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))

  /** Exact top-1 over the augmented corpus: for each query the planted copy
    * at cosine 1.0 — what any correct ANN path must return.
    */
  private val knnPlantedOracle: String =
    """WITH aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |         round(list_cosine_similarity(q.v, c.v), 6) AS score,
      |         row_number() OVER (PARTITION BY q.vec_id
      |           ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC, c.vec_id) AS rn
      |  FROM aug q JOIN aug c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5)
      |SELECT qid, nid, score, CAST(rn AS INT) AS rank FROM scored WHERE rn <= 1
      |ORDER BY qid NULLS FIRST, rank NULLS FIRST""".stripMargin
}
