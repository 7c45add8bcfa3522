package graft.vector

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Partitioned HNSW — the Spark-native counterpart of the reference's ANN
  * engine (crates/grafeo-core/src/index/vector/hnsw.rs: multi-layer NSW,
  * Malkov & Yashunin 2018). One HNSW graph is built per corpus partition
  * inside mapPartitions (SURVEY §2.7's block-partitioned plan); the
  * broadcast query set searches every partition's graph and the
  * per-partition top-k merge via [[Knn.TopKAgg]] — so partitioning costs no
  * recall (every partition is searched), and both build and search scale
  * out with the number of partitions.
  *
  * Determinism: layer assignment hashes the vector id (no RNG), neighbor
  * sets and search frontiers break ties on ascending id — identical output
  * across runs on the same partitioning; across partitionings the merged
  * result agrees whenever each partition's beam finds its local true top-k
  * (guaranteed-approximate, like any HNSW).
  */
object Hnsw {

  /** In-memory single-graph HNSW over float vectors. `m` = max neighbors
    * per layer (2m on layer 0), `efC` = construction beam width; `metric`
    * covers the reference's four (plan.rs:777-786) with distance = the
    * uniform lower-is-closer transform of [[Knn.score]]. Serializable so a
    * built per-partition index can live in a persisted RDD — the
    * registered-index lifecycle (`CREATE VECTOR INDEX … USING HNSW` builds
    * once; queries search the stored graphs).
    */
  final class Index(private[Hnsw] val m: Int, private[Hnsw] val efC: Int,
      private[Hnsw] val metric: Knn.Metric = Knn.Cosine) extends Serializable {
    // m=1 makes mL = 1/log(1) = Infinity → levelOf = Int.MaxValue → the
    // first insert allocates ~2^31 layers (OOM); m=0 degenerates silently.
    // Fail the user-settable parameter loudly instead.
    require(m >= 2, s"hnsw m must be >= 2, got $m")
    require(efC >= 1, s"hnsw efConstruction must be >= 1, got $efC")
    private[Hnsw] val ids = mutable.ArrayBuffer.empty[Long]
    private[Hnsw] val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private[Hnsw] val norms = mutable.ArrayBuffer.empty[Double]
    // neighbors(layer)(node) = ArrayBuffer[node index]
    private[Hnsw] val layers = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]]
    private[Hnsw] val nodeLevel = mutable.ArrayBuffer.empty[Int]
    private[Hnsw] var entry: Int = -1
    private val mL = 1.0 / math.log(m.toDouble)

    private def dist(a: Array[Float], na: Double, b: Array[Float], nb: Double): Double =
      metric match {
        case Knn.Cosine =>
          var dot = 0.0
          var i = 0
          while (i < a.length) { dot += a(i) * b(i); i += 1 }
          val d = na * nb
          if (d == 0) 1.0 else 1.0 - dot / d
        case Knn.Euclidean =>
          var s = 0.0
          var i = 0
          while (i < a.length) { val x = a(i).toDouble - b(i); s += x * x; i += 1 }
          math.sqrt(s)
        case Knn.Dot =>
          var dot = 0.0
          var i = 0
          while (i < a.length) { dot += a(i) * b(i); i += 1 }
          -dot
        case Knn.Manhattan =>
          var s = 0.0
          var i = 0
          while (i < a.length) { s += math.abs(a(i).toDouble - b(i)); i += 1 }
          s
      }
    private def distTo(q: Array[Float], nq: Double, v: Int): Double =
      dist(q, nq, vecs(v), norms(v))

    /** Deterministic "random" level from the id (splitmix-style mix). */
    private def levelOf(id: Long): Int = {
      var z = id + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val u = ((z >>> 11).toDouble / (1L << 53).toDouble).max(1e-12)
      (-math.log(u) * mL).toInt
    }

    /** Greedy beam search on one layer; returns up to ef (dist, node) pairs
      * sorted ascending (closest first, ties on id).
      */
    private def searchLayer(q: Array[Float], nq: Double, ep: Seq[Int],
        ef: Int, layer: Int): mutable.ArrayBuffer[(Double, Int)] = {
      val visited = mutable.HashSet.empty[Int]
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by { case (d, v) => (d, ids(v)) }
      val cand = mutable.PriorityQueue.empty[(Double, Int)](ord.reverse) // min-heap
      val best = mutable.PriorityQueue.empty[(Double, Int)](ord)        // max-heap
      ep.foreach { v =>
        if (visited.add(v)) {
          val d = distTo(q, nq, v)
          cand.enqueue((d, v)); best.enqueue((d, v))
        }
      }
      while (best.size > ef) best.dequeue()
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (best.nonEmpty && dc > best.head._1 && best.size >= ef) {
          cand.clear()
        } else {
          val nbrs = layers(layer)(c)
          var i = 0
          while (i < nbrs.length) {
            val v = nbrs(i)
            if (visited.add(v)) {
              val d = distTo(q, nq, v)
              if (best.size < ef || d < best.head._1) {
                cand.enqueue((d, v)); best.enqueue((d, v))
                if (best.size > ef) best.dequeue()
              }
            }
            i += 1
          }
        }
      }
      val out = mutable.ArrayBuffer.empty[(Double, Int)]
      while (best.nonEmpty) out += best.dequeue()
      out.sortInPlace()(ord)
    }

    def insert(id: Long, vec: Array[Float]): Unit = {
      val idx = ids.length
      ids += id
      vecs += vec
      norms += math.sqrt(vec.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      val lvl = levelOf(id)
      nodeLevel += lvl
      while (layers.length <= lvl) layers += mutable.ArrayBuffer.empty
      for (l <- layers.indices) {
        while (layers(l).length <= idx) layers(l) += mutable.ArrayBuffer.empty[Int]
      }
      if (entry < 0) { entry = idx; return }
      val nq = norms(idx)
      var ep = Seq(entry)
      // descend from the top to lvl+1 greedily
      var l = nodeLevel(entry)
      while (l > lvl) {
        ep = Seq(searchLayer(vec, nq, ep, 1, l).head._2)
        l -= 1
      }
      // connect on layers min(lvl, topOfEntry)..0
      l = math.min(lvl, nodeLevel(entry))
      while (l >= 0) {
        val found = searchLayer(vec, nq, ep, efC, l)
        val cap = if (l == 0) 2 * m else m
        val chosen = found.take(cap)
        chosen.foreach { case (_, v) =>
          layers(l)(idx) += v
          val back = layers(l)(v)
          back += idx
          if (back.length > cap) {
            // prune v's neighbor list back to its cap, keeping the closest
            val pruned = back.map(w => (dist(vecs(v), norms(v), vecs(w), norms(w)), w))
              .sortBy { case (d, w) => (d, ids(w)) }.take(cap).map(_._2)
            back.clear(); back ++= pruned
          }
        }
        ep = found.map(_._2).toSeq
        l -= 1
      }
      if (lvl > nodeLevel(entry)) entry = idx
    }

    /** Top-k (id, score) for one query, ef-beam search; score follows the
      * [[Knn.score]] higher-is-closer convention (cosine similarity,
      * negated euclidean/manhattan, dot).
      */
    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      val nq = math.sqrt(q.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      var ep = Seq(entry)
      var l = nodeLevel(entry)
      while (l > 0) {
        ep = Seq(searchLayer(q, nq, ep, 1, l).head._2)
        l -= 1
      }
      searchLayer(q, nq, ep, math.max(ef, k), 0)
        .take(k).map { case (d, v) =>
          val score = metric match {
            case Knn.Cosine => 1.0 - d // distance back to similarity
            case Knn.Dot    => -d
            case _          => -d      // negated distance, as Knn.score
          }
          (ids(v), score)
        }.toSeq
    }
  }

  /** Build one HNSW per corpus partition and persist the graphs — the
    * index-build half of `CREATE VECTOR INDEX … USING HNSW` (the reference
    * builds hnsw.rs once and serves queries from it). The RDD of built
    * graphs lives in executor storage; `count()` materializes it so the
    * build cost is paid here, not on the first query.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 16, efConstruction: Int = 100,
      metric: Knn.Metric = Knn.Cosine): org.apache.spark.rdd.RDD[Index] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val idx = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .rdd
      .mapPartitions { it =>
        val index = new Index(m, efConstruction, metric)
        it.foreach { case (id, v) => index.insert(id, v) }
        Iterator.single(index)
      }
      .persist()
    idx.count()
    idx
  }

  private def metricName(m: Knn.Metric): String = m match {
    case Knn.Cosine    => "cosine"
    case Knn.Euclidean => "euclidean"
    case Knn.Dot       => "dot"
    case Knn.Manhattan => "manhattan"
  }
  private def metricOf(s: String): Knn.Metric = s match {
    case "cosine"    => Knn.Cosine
    case "euclidean" => Knn.Euclidean
    case "dot"       => Knn.Dot
    case "manhattan" => Knn.Manhattan
  }

  /** Persist a built index to parquet — the durable half of the
    * `CREATE VECTOR INDEX` lifecycle (the reference serializes its HNSW
    * with the database; the registry here is process-lifetime, so a
    * restart would otherwise pay the full rebuild). Layout:
    *
    *   <path>/nodes/  part, idx, id, level, vec, nbrs (per-layer adjacency)
    *   <path>/meta/   part, entry, m, efc, metric, num_parts
    *
    * One row per corpus vector — the write is a distributed dump of the
    * per-partition graphs, no driver materialization.
    */
  def save(index: org.apache.spark.rdd.RDD[Index], path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    val numParts = index.getNumPartitions
    index.mapPartitionsWithIndex { (p, it) =>
      it.flatMap { ix =>
        ix.ids.indices.iterator.map { i =>
          (p, i, ix.ids(i), ix.nodeLevel(i), ix.vecs(i),
            ix.layers.iterator.map(l =>
              if (i < l.length) l(i).toArray else Array.empty[Int]).toArray)
        }
      }
    }.toDF("part", "idx", "id", "level", "vec", "nbrs")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/nodes")
    index.mapPartitionsWithIndex { (p, it) =>
      it.map(ix => (p, ix.entry, ix.m, ix.efC, metricName(ix.metric), numParts))
    }.toDF("part", "entry", "m", "efc", "metric", "num_parts")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** Load a [[save]]d index: rows shuffle back to their original
    * partition (HashPartitioner sends part k to partition k) and each
    * partition reconstructs its graph — search results are identical to
    * the pre-save index because the whole structure round-trips, nothing
    * is rebuilt.
    */
  def load(spark: SparkSession, path: String): org.apache.spark.rdd.RDD[Index] = {
    val metaRows = spark.read.parquet(s"$path/meta").collect()
    require(metaRows.nonEmpty, s"no HNSW index stored at $path")
    val h = metaRows.head
    val (m, efc) = (h.getAs[Int]("m"), h.getAs[Int]("efc"))
    val metric = metricOf(h.getAs[String]("metric"))
    val numParts = h.getAs[Int]("num_parts")
    val entries = metaRows.map(r => r.getAs[Int]("part") -> r.getAs[Int]("entry")).toMap
    val rows = spark.read.parquet(s"$path/nodes")
      .select("part", "idx", "id", "level", "vec", "nbrs").rdd
      .map { r =>
        (r.getInt(0), (r.getInt(1), r.getLong(2), r.getInt(3),
          r.getSeq[Float](4).toArray,
          r.getSeq[scala.collection.Seq[Int]](5).map(_.toArray).toArray))
      }
      .partitionBy(new org.apache.spark.HashPartitioner(numParts))
    val idx = rows.mapPartitionsWithIndex { (p, it) =>
      val ix = new Index(m, efc, metric)
      val ns = it.map(_._2).toArray.sortBy(_._1)
      ns.foreach { case (i, id, level, vec, _) =>
        require(ix.ids.length == i, s"non-contiguous node index $i in part $p")
        ix.ids += id
        ix.vecs += vec
        ix.norms += math.sqrt(vec.foldLeft(0.0)((a, x) => a + x.toDouble * x))
        ix.nodeLevel += level
      }
      val numLayers = ns.iterator.map(_._5.length).maxOption.getOrElse(0)
      for (l <- 0 until numLayers) {
        val layer = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]
        ns.foreach { case (_, _, _, _, nbrs) =>
          layer += (if (l < nbrs.length) mutable.ArrayBuffer(nbrs(l).toSeq: _*)
                    else mutable.ArrayBuffer.empty[Int])
        }
        ix.layers += layer
      }
      ix.entry = entries.getOrElse(p, -1)
      Iterator.single(ix)
    }.persist()
    idx.count()
    idx
  }

  /** Process-lifetime index registry (same pattern as [[Ivf.fitCached]]):
    * build once per (corpus, params), search the stored graphs after.
    */
  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.rdd.RDD[Index]]

  def buildCached(corpusKey: String, corpus: DataFrame, idCol: String,
      vecCol: String, m: Int = 16, efConstruction: Int = 100,
      metric: Knn.Metric = Knn.Cosine): org.apache.spark.rdd.RDD[Index] =
    indexCache.getOrElseUpdate(
      Seq(corpusKey, idCol, vecCol, m, efConstruction, metric).mkString("\u0001"),
      build(corpus, idCol, vecCol, m, efConstruction, metric))

  /** The query side collects to the driver for broadcast (the reference's
    * batch_vector_search shape) — but in BOUNDED CHUNKS: a LAZY iterator
    * of one query partition per wave, and each wave is fully processed
    * (materialized + its broadcast destroyed) before the next partition is
    * collected — so driver memory holds at most one partition of queries
    * at a time. A corpus-sized query side becomes a sequence of broadcast
    * waves instead of a driver OOM (the round-6 scale caveat).
    */
  private def queryBatches(queries: DataFrame, qIdCol: String,
      qVecCol: String): Iterator[Array[(Long, Array[Float])]] = {
    val sc = queries.sparkSession.sparkContext
    val rdd = queries
      .select(col(qIdCol).cast("long"), col(qVecCol).cast("array<float>"))
      .rdd.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    rdd.partitions.indices.iterator.map { i =>
      sc.runJob(rdd, (it: Iterator[(Long, Array[Float])]) => it.toArray, Seq(i)).head
    }.filter(_.nonEmpty)
  }

  /** Per-wave search: each query batch runs to completion — beam search
    * over every index partition, per-batch top-k merge, localCheckpoint to
    * materialize the (small, k-bounded) result — then its broadcast is
    * destroyed before the next batch is collected. Per-batch top-k is
    * final because every qid lives in exactly one batch.
    */
  private def searchInWaves(spark: SparkSession,
      searchBatch: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Float])]] => DataFrame,
      batches: Iterator[Array[(Long, Array[Float])]], k: Int): DataFrame = {
    import spark.implicits._
    def finish(perPart: DataFrame): DataFrame = Knn.rankTopK(perPart, k)
    val waves = batches.map { qRows =>
      val bq = spark.sparkContext.broadcast(qRows)
      val out = finish(searchBatch(bq)).localCheckpoint() // eager
      bq.destroy()
      out
    }.toList
    waves.reduceOption(_ unionByName _).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Double, Int)].toDF("qid", "nid", "score", "rank")
    }
  }

  /** Search a built index: broadcast queries (chunked — see
    * [[queryBatches]]), per-partition beam search, global top-k merge.
    * Same output contract as [[Knn.bruteForceTopK]]: (qid, nid, score,
    * rank), score = cosine rounded to 6 decimals.
    */
  def searchIndex(index: org.apache.spark.rdd.RDD[Index],
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, efSearch: Int = 64, excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    searchInWaves(spark, bq => {
      index.flatMap { idx =>
        bq.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, if (excludeSelf) k + 1 else k, efSearch)
            .collect { case (nid, s) if !excludeSelf || nid != qid =>
              (qid, nid, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
            .take(k)
        }
      }.toDF("__qid", "__nid", "__score")
    }, queryBatches(queries, qIdCol, qVecCol), k)
  }

  /** One-shot distributed top-k (build + search in one pass) — the
    * unregistered-index path; repeated queries should go through
    * [[buildCached]] + [[searchIndex]].
    */
  def topK(queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, m: Int = 16, efConstruction: Int = 100, efSearch: Int = 64,
      excludeSelf: Boolean = true, metric: Knn.Metric = Knn.Cosine): DataFrame = {
    // build ONCE (per-partition graphs persisted), then search wave by
    // wave — the index insert loop is the dominant cost and must not be
    // repeated per query batch. The waves materialize inside searchIndex
    // (localCheckpoint), so the one-shot index can be released right away.
    val index = build(corpus, idCol, vecCol, m, efConstruction, metric)
    try searchIndex(index, queries, qIdCol, qVecCol, k, efSearch, excludeSelf)
    finally index.unpersist(blocking = false)
  }
}
