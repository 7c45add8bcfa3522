package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** k-NN over an embedding column (SURVEY §2.7; reference VectorScan /
  * VectorJoin plan.rs:752-838, scan_vector.rs, vector_join.rs, HNSW in
  * index/vector/hnsw.rs).
  *
  * Spark has no ANN built-in; the parity path is brute force (the reference's
  * own fallback) with a 100-TB-shaped plan, plus an LSH-bucketed approximate
  * variant as the scale path.
  */
object Knn {

  sealed trait Metric
  case object Cosine extends Metric
  case object Euclidean extends Metric
  case object Dot extends Metric
  case object Manhattan extends Metric

  def score(metric: Metric, a: Column, b: Column): Column = metric match {
    case Cosine    => cosineSimilarity(a, b)
    case Euclidean => -euclideanDistance(a, b) // higher = closer, uniformly
    case Dot       => dotProduct(a, b)
    case Manhattan => -manhattanDistance(a, b)
  }

  /** Bounded top-k accumulator: keeps the k best (score desc, id asc) pairs.
    * As a Spark `Aggregator` it gets map-side partial aggregation for free —
    * each task ships at most k rows per group to the shuffle, which is what
    * makes brute-force k-NN viable on a large corpus (the shuffle is
    * O(queries × k), not O(queries × corpus)).
    */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    // k=0 would make reduce evaluate Seq.empty.last (task-killing
    // NoSuchElementException) on its first row; k flows from user input
    require(k >= 1, s"top-k requires k >= 1, got $k")
    private def prune(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (sc, id) => (-sc, id) }.take(k)
    def zero: Seq[(Double, Long)] = Seq.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.size >= k && b.last._1 > a._1) b else prune(b :+ a)
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      prune(x ++ y)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = prune(r)
    def bufferEncoder = ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder = ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Scored candidate pairs (`__qid`, `__score`, `__nid`) → the shared
    * k-NN output contract (qid, nid, score, rank): one shuffle on qid,
    * map-side pruned by [[TopKAgg]]. Every k-NN surface (brute, LSH, IVF,
    * HNSW waves, the GQL index search) finishes through here, so the rank
    * convention can only ever change in one place.
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy("__qid")
      .agg(topk(col("__score"), col("__nid")).as("__top"))
      .select(col("__qid"), posexplode(col("__top")).as(Seq("__pos", "__sn")))
      .select(
        col("__qid").as("qid"), col("__sn._2").as("nid"),
        col("__sn._1").as("score"), (col("__pos") + 1).as("rank"))
  }

  /** VectorJoin (plan.rs:809-838): for every row of `queries`, the top-k
    * corpus neighbors by `metric`. Queries are broadcast (the small side);
    * the corpus streams; the per-query candidate set is pruned map-side by
    * TopKAgg before the single shuffle on qid.
    *
    * Scores are rounded to 6 decimals *before* ranking so the (score, id)
    * order is reproducible across engines; ties break on ascending id.
    * Returns (qid, nid, score, rank).
    */
  def bruteForceTopK(queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, metric: Metric = Cosine, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qIdCol).as("__qid"), col(qVecCol).as("__qvec"))
    val c = corpus.select(col(idCol).as("__nid"), col(vecCol).as("__nvec"))
    val pairs = c.crossJoin(broadcast(q))
    val filtered = if (excludeSelf) pairs.filter(col("__qid") =!= col("__nid")) else pairs
    rankTopK(filtered
      .select(col("__qid"), col("__nid"),
        round(score(metric, col("__qvec"), col("__nvec")), 6).as("__score")), k)
  }

  /** Random-hyperplane LSH bucketing (the scale path; stands in for the
    * reference's HNSW index at cluster scale). Deterministic hyperplanes from
    * a fixed seed; vectors land in `tables` buckets of `bits`-bit signatures;
    * neighbor search only scores within-bucket candidates.
    */
  def lshBuckets(df: DataFrame, vecCol: String, dim: Int,
      bits: Int = 12, tables: Int = 3, seed: Long = 42L,
      probes: Int = 0): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Seq[Double]]] = // [table][bit][dim]
      Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian())))
    // Bucket keys are longs: (table << 32) | sig. Base signatures come from
    // the single native LshSigs expression — composing tables×bits VecDot
    // calls scales the GENERATED CODE with the signature width and blows the
    // JVM's 64 KB method limit at corpus-sized widths (12×8 = 96 dots), which
    // silently dropped the whole projection out of codegen (see LshSigs doc).
    if (probes <= 0)
      return df.withColumn("__buckets",
        graft.functions.LshExpressions.lshSigs(col(vecCol),
          planes.map(_.flatten.toArray).toArray, dim))
    // Multi-probe path (query-side only: small row count × default widths,
    // well under codegen limits): needs the per-plane margins, so the dots
    // stay composed.
    val sigs = planes.zipWithIndex.flatMap { case (tbl, t) =>
      val dots = tbl.map { plane =>
        // native codegen dot product — zip_with/aggregate lambdas are
        // CodegenFallback and were the LSH hot-path bottleneck (VERDICT r1 #5)
        dotProduct(col(vecCol), array(plane.map(lit): _*))
      }
      val sig = dots.zipWithIndex
        .map { case (d, i) => (d >= 0).cast("int") * lit(1 << i) }
        .reduce(_ + _)
      val tblKey = lit(t.toLong << 32)
      val base = tblKey + sig.cast("long")
      // Multi-probe (Lv et al., VLDB'07): additionally probe the buckets
      // reached by flipping the `probes` lowest-margin bits — the
      // hyperplanes the vector sits closest to, i.e. the likeliest
      // misassignments. Query-side only: recall of a (q, n) pair needs just
      // one side to probe across the boundary, and keeping the corpus at
      // one bucket per table leaves the index size unchanged.
      // margin ranking is per TABLE, not per probe — build it once and
      // index it j times
      val flipOrder = array_sort(array(dots.zipWithIndex.map { case (d, i) =>
        struct(abs(d).as("m"), lit(i).as("i")) }: _*))
      val probed = (1 to math.min(probes, bits)).map { j =>
        val flip = element_at(flipOrder, j).getField("i")
        tblKey + sig.bitwiseXOR(call_function("shiftleft", lit(1), flip)).cast("long")
      }
      base +: probed
    }
    df.withColumn("__buckets", array(sigs: _*))
  }

  /** Approximate top-k: bucket both sides with the same hyperplanes, score
    * only bucket-colliding pairs (any of `tables` tables), then global
    * per-query top-k. Recall < 1; throughput at scale is
    * O(collisions) instead of O(|q|·|corpus|).
    */
  def lshTopK(queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, metric: Metric = Cosine,
      bits: Int = 12, tables: Int = 3, seed: Long = 42L,
      probes: Int = 0): DataFrame = {
    val qb = lshBuckets(
      queries.select(col(qIdCol).as("__qid"), col(qVecCol).as("__qvec")),
      "__qvec", dim, bits, tables, seed, probes)
      .select(col("__qid"), col("__qvec"), explode(col("__buckets")).as("__b"))
    val cb = lshBuckets(
      corpus.select(col(idCol).as("__nid"), col(vecCol).as("__nvec")),
      "__nvec", dim, bits, tables, seed)
      .select(col("__nid"), col("__nvec"), explode(col("__buckets")).as("__b"))
    rankTopK(cb.join(broadcast(qb), Seq("__b"))
      .filter(col("__qid") =!= col("__nid"))
      .select(col("__qid"), col("__nid"),
        round(score(metric, col("__qvec"), col("__nvec")), 6).as("__score"))
      .distinct(), k) // a pair may collide in several tables
  }

  /** Exact embedding near-duplicate pairs (cosine >= threshold, id1 < id2).
    *
    * O(n²) all-pairs — this is the correctness BASELINE (mirrors the DuckDB
    * oracle), not the scale path. At corpus scale use [[nearDupPairsLSH]];
    * exact sub-quadratic cosine-threshold join does not exist for dense
    * vectors at low thresholds.
    */
  def nearDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).as("__v1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("__v2"))
    a.crossJoin(b)
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosineSimilarity(col("__v1"), col("__v2")), 6).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Incremental near-dup: score a small `batch` (new documents) against the
    * full corpus — the realistic shape of continuous dedup ingest. The batch
    * is broadcast; the corpus streams; cost is O(|batch|·|corpus|) spread
    * across executors with no shuffle of the corpus.
    */
  def nearDupAgainst(batch: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val b = batch.select(col(idCol).as("__bid"), col(vecCol).as("__bv"))
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    c.join(broadcast(b), col("__bid") =!= col("__cid"))
      .select(
        least(col("__bid"), col("__cid")).as("id1"),
        greatest(col("__bid"), col("__cid")).as("id2"),
        round(cosineSimilarity(col("__bv"), col("__cv")), 6).as("score"))
      .filter(col("score") >= threshold)
      // two near-identical NEW documents in one batch appear on neither
      // side of the corpus join until the batch is appended — their pair
      // must come from the batch's own (broadcast-small) self-join
      .unionByName(nearDupPairsExact(batch, idCol, vecCol, threshold))
      .distinct() // batch⊆corpus overlap → pair seen up to thrice
  }

  /** Hard cluster assignment: each vector to its argmax-cosine centroid,
    * deterministically (rounded score desc, then centroid id — the ONE
    * tie-break convention every oracle mirrors; q_embed_cluster and
    * [[semDedup]] both route through here so it cannot drift). Centroids
    * broadcast; output = (idCol, __v, cidCol, __sim).
    */
  def assignToCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__sim").desc, col(cidCol))
    vectors.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(centroids.select(col(cidCol), col(cvecCol).as("__cv"))))
      .select(col(idCol), col("__v"), col(cidCol),
        round(score(Cosine, col("__v"), col("__cv")), 6).as("__sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster embeddings, then
    * deduplicate WITHIN clusters only — pairwise cosine is confined to
    * cluster-mates, so the quadratic term is per-cluster, not corpus-wide
    * (the paper's k-means plays the candidate-generation role LSH bands
    * play in [[nearDupPairsLSH]]). Assignment = argmax cosine over the
    * broadcast `centroids` (deterministic: score desc, then centroid id);
    * within a cluster every member with a LOWER-id mate at cosine ≥ `tau`
    * is marked removed — the keep-one-representative policy with a total
    * deterministic order.
    *
    * SKEW GUARD: the within-cluster self-join is quadratic in the cluster
    * size, and at corpus scale a hub cluster (a centroid that attracts a
    * disproportionate share — boilerplate, near-empty docs) is the norm,
    * not the exception. The default cap (2048) bounds the exact arm's
    * worst per-cluster term at ~2M pairs — the r12 pipeline gate measured
    * the 8192 cap leaving a 13× decade (250→2500-member clusters, both
    * under cap) before the guard engaged. Clusters larger than
    * `maxClusterSize` therefore
    * re-shard their pairwise step by LSH band INSIDE the cluster (the same
    * random-hyperplane machinery as [[nearDupPairsLSH]], keyed on
    * (cluster, table, signature)), so no single cluster is ever O(m²) —
    * candidate work per hub cluster drops to its band collisions. The band
    * width is sized to the largest hub (`bits <= 0`, the default: expected
    * bucket occupancy held constant, bits ≈ log2(csz/8) capped at 16 with
    * tables doubled per +4 bits — the same law as [[nearDupPairsLSH]]); a
    * FIXED width would still be quadratic per decade, just with a smaller
    * constant. The banded arm is approximate for mid-range `tau` with the
    * standard LSH miss bound (a true pair is missed with probability
    * (1-p^bits)^tables, p = 1 - angle/π); at SemDeDup's operating point
    * (tau ≥ 0.99) the adaptive sizing keeps pair recall ≥ ~0.999, and
    * EXACT duplicates still collide in every table at any width. Clusters
    * at or under the cap keep the exact equi-join — the common path is
    * untouched.
    *
    * Returns (idCol, cid, removed).
    */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      tau: Double, maxClusterSize: Int = 1 << 11,
      bits: Int = 0, tables: Int = 0, seed: Long = 42L): DataFrame = {
    // materialized once: the scored cross-join + per-id argmax window feeds
    // BOTH self-join sides and the final flag join — without the checkpoint
    // the |V|·k scoring pass would re-run per consumer
    val assigned = assignToCentroids(vectors, idCol, vecCol,
        centroids, cidCol, cvecCol)
      .select(col(idCol).as("__vid"), col("__v"), col(cidCol))
      .localCheckpoint()
    val dups = semDedupDuplicates(assigned, cidCol, tau,
      maxClusterSize, bits, tables, seed)
    assigned.join(dups.withColumn("__removed", lit(true)), Seq("__vid"), "left_outer")
      .select(col("__vid").as(idCol), col(cidCol),
        coalesce(col("__removed"), lit(false)).as("removed"))
  }

  /** Band sizing for [[semDedup]]'s hub path: bits hold expected bucket
    * occupancy constant against the LARGEST hub (bits ≈ log2(csz/8),
    * capped 16 — the `nearDupPairsLSH` law); tables start from the shared
    * doubling rule (4 << ((bits-8)/4)) and GROW, capped at 32, toward the
    * count that brings the estimated true-pair miss (1-p^bits)^tables,
    * p = 1 - acos(tau)/π, under 1% — tau-aware, because more bits cost
    * recall precisely when tau is mid-range. Returns
    * (bits, tables, estimated miss at those sizes). Explicit `bits`/
    * `tables` overrides pass through untouched.
    */
  private[graft] def semDedupBandSizing(maxCsz: Long, tau: Double,
      bits: Int, tables: Int): (Int, Int, Double) = {
    val nBits =
      if (bits > 0) bits
      else math.min(16, math.max(8,
        math.ceil(math.log(math.max(1L, maxCsz) / 8.0) / math.log(2)).toInt))
    val p = 1.0 - math.acos(math.min(1.0, math.max(-1.0, tau))) / math.Pi
    val perTable = math.pow(p, nBits)
    val nTables =
      if (tables > 0) tables
      else {
        val base = math.min(16, 4 << ((nBits - 8) / 4))
        val needed =
          if (perTable >= 0.99) 1
          else math.ceil(math.log(0.01) / math.log1p(-perTable))
        math.min(32.0, math.max(base.toDouble, needed)).toInt
      }
    val estMiss = math.pow(1.0 - perTable, nTables)
    (nBits, nTables, estMiss)
  }

  /** The pairwise arm of [[semDedup]]: distinct `__vid`s with a lower-id
    * cluster-mate at cosine ≥ tau. Package-visible so specs can bound the
    * banded path's candidate count directly.
    */
  private[graft] def semDedupDuplicates(assigned: DataFrame, cidCol: String,
      tau: Double, maxClusterSize: Int, bits: Int, tables: Int,
      seed: Long): DataFrame = {
    // hub detection: per-cluster sizes are centroid-count-sized — the same
    // broadcast-scale contract the assignment itself already assumes
    val bigRows = assigned.groupBy(cidCol).agg(count(lit(1)).as("__csz"))
      .filter(col("__csz") > maxClusterSize)
      .select(col(cidCol), col("__csz")).collect()
    val bigCids = bigRows.map(_.get(0))
    // Band width sized to the LARGEST hub (same occupancy law as
    // nearDupPairsLSH): a FIXED width is still quadratic per decade —
    // bucket population csz/2^bits grows linearly with the cluster, so
    // within-bucket pairs grow csz² (the r12 pipeline gate measured 11×
    // wall per 10× data on exactly this). Holding expected occupancy
    // constant (bits ≈ log2(csz/8), tables doubled per +4 bits) keeps hub
    // candidate work ≈ O(csz^1.25). Exact duplicates collide at any width;
    // a true tau-pair is missed with probability (1-p^bits)^tables,
    // p = 1 - acos(tau)/π — at SemDeDup's tau ≥ 0.99 operating point,
    // 12 bits / 8 tables gives pair recall ≈ 0.9989.
    val maxCsz = if (bigRows.isEmpty) 0L else bigRows.map(_.getLong(1)).max
    val (nBits, nTables, estMiss) = semDedupBandSizing(maxCsz, tau, bits, tables)
    // The banded arm is honest about being approximate: when even the
    // capped table count leaves the estimated true-pair miss rate above
    // 5% (mid-range tau — outside SemDeDup's ≥0.95 operating point), say
    // so, LOUDLY, instead of silently degrading removals relative to the
    // exact arm. Exact duplicates are unaffected at any width.
    if (bigRows.nonEmpty && tables <= 0 && estMiss > 0.05)
      org.slf4j.LoggerFactory.getLogger("graft.vector.semDedup").warn(
        f"semDedup banded hub path at tau=$tau%.2f: estimated true-pair " +
          f"miss rate ${estMiss * 100}%.1f%% with $nBits bits × $nTables " +
          "tables — the banded arm degrades below tau≈0.95. To restore " +
          "EXACT pairing raise maxClusterSize past the largest cluster " +
          "(quadratic in its size); explicit bits/tables only re-tune " +
          "the approximation.")
    def pairDups(frame: DataFrame): DataFrame =
      frame.as("a").join(frame.as("b"),
          col(s"a.$cidCol") === col(s"b.$cidCol") &&
            col("a.__vid") < col("b.__vid"))
        .filter(round(score(Cosine, col("a.__v"), col("b.__v")), 6) >= tau)
        .select(col("b.__vid").as("__vid")).distinct()
    if (bigCids.isEmpty) return pairDups(assigned)
    val isBig = col(cidCol).isin(bigCids.toSeq: _*)
    val smallDups = pairDups(assigned.filter(!isBig))
    val big = assigned.filter(isBig)
    // dim probe: first hub row only — the banded arm is already off the
    // common path when this runs
    val dim = big.select(size(col("__v"))).head.getInt(0)
    val banded = lshBuckets(big, "__v", dim, nBits, nTables, seed)
      .select(col("__vid"), col("__v"), col(cidCol),
        explode(col("__buckets")).as("__band"))
    // a pair colliding in several tables must not re-verify per collision:
    // dedup the bare id pairs BEFORE the cosine filter re-join (same
    // shuffle-byte pattern as nearDupPairsLSH)
    val cand = banded.as("a").join(banded.as("b"),
        col(s"a.$cidCol") === col(s"b.$cidCol") &&
          col("a.__band") === col("b.__band") &&
          col("a.__vid") < col("b.__vid"))
      .select(col("a.__vid").as("__id1"), col("b.__vid").as("__id2"))
      .distinct()
    val vecs = big.select(col("__vid"), col("__v"))
    val bigDups = cand
      .join(vecs.select(col("__vid").as("__id1"), col("__v").as("__v1")), "__id1")
      .join(vecs.select(col("__vid").as("__id2"), col("__v").as("__v2")), "__id2")
      .filter(round(score(Cosine, col("__v1"), col("__v2")), 6) >= tau)
      .select(col("__id2").as("__vid")).distinct()
    smallDups.unionByName(bigDups).distinct()
  }

  /** LSH-bucketed near-duplicate pairs: random-hyperplane signatures → band
    * equi-join for candidates → exact cosine verification. The 100-TB shape:
    * the only join is an equi-join on (table, signature) buckets, so work is
    * O(collisions), not O(n²), and identical/near-identical vectors are
    * guaranteed to collide (equal vectors hash to equal signatures in every
    * table). Approximate for mid-range thresholds: a true pair is missed
    * with probability (1-p^bits)^tables where p = 1 - angle/π.
    *
    * `bits <= 0` (the default) sizes the signature to the corpus: a FIXED
    * signature width is asymptotically quadratic (bucket population grows
    * linearly with n, so within-bucket candidate pairs grow n²); holding the
    * expected bucket occupancy constant instead (bits ≈ log2(n/8), with
    * tables doubled per +4 bits to hold high-similarity recall roughly flat
    * — at s=0.9, recall stays ≈0.75 across 8→16 bits) keeps total candidate
    * work ≈ O(n^1.25). Exact duplicates still collide in every table at any
    * width. One count() of the id/vector projection pays for the sizing.
    */
  def nearDupPairsLSH(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      bits: Int = 0, tables: Int = 0, seed: Long = 42L): DataFrame = {
    val vecs = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val nBits =
      if (bits > 0) bits
      else {
        val n = math.max(1L, vecs.count())
        math.min(16, math.max(8,
          math.ceil(math.log(n / 8.0) / math.log(2)).toInt))
      }
    val nTables =
      if (tables > 0) tables else math.min(16, 4 << ((nBits - 8) / 4))
    val b = lshBuckets(vecs, "__v", dim, nBits, nTables, seed)
      .select(col("__id"), explode(col("__buckets")).as("__b"))
    // dedup the bare id pairs BEFORE re-joining vectors: the multi-table
    // collision dedup shuffles (long, long) rows, not 2×dim floats — at
    // wide dims the difference is the whole shuffle (same pattern as
    // minHashNearDuplicates)
    val candidates = b.as("l").join(b.as("r"),
        col("l.__b") === col("r.__b") && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id1"), col("r.__id").as("id2"))
      .distinct()
    candidates
      .join(vecs.select(col("__id").as("id1"), col("__v").as("__v1")), "id1")
      .join(vecs.select(col("__id").as("id2"), col("__v").as("__v2")), "id2")
      .select(col("id1"), col("id2"),
        round(cosineSimilarity(col("__v1"), col("__v2")), 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
