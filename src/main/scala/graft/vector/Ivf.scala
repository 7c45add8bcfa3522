package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.{vecDot, vecL2Sq}

/** IVF (inverted-file) approximate nearest neighbors — the second scale path
  * of SURVEY §2.7 next to LSH: a deterministic Lloyd k-means coarse
  * quantizer partitions the corpus into `nlist` cells; a query scores only
  * the `nprobe` nearest cells.
  *
  * Everything distributed except the centroid table itself (nlist × dim
  * doubles — broadcast-sized by construction, like any ANN codebook).
  * Determinism: centroids seeded from the `nlist` lowest-id vectors, fixed
  * Lloyd iterations, ties broken on cell index.
  */
object Ivf {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def nlist: Int = centroids.size

    /** Column: index of the nearest centroid (L2), ties to the lower index. */
    def cellOf(vec: Column): Column = {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        struct(vecL2Sq(vec, array(c.map(lit): _*)).as("d"), lit(i).as("i"))
      }
      array_min(array(scored: _*)).getField("i")
    }

    /** The `nprobe` nearest cell indices for a vector. */
    def probeCells(vec: Column, nprobe: Int): Column = {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        struct(vecL2Sq(vec, array(c.map(lit): _*)).as("d"), lit(i).as("i"))
      }
      transform(slice(array_sort(array(scored: _*)), 1, nprobe), _.getField("i"))
    }
  }

  /** Process-lifetime model registry: fit once per (corpus, params) — the
    * registered-vector-index usage pattern (a real user queries through
    * `CREATE VECTOR INDEX`, reference vector/index.rs builds once). Without
    * it the k-means re-fits inside every query execution: 2 Lloyd rounds ×
    * (full scan + posexplode) per run made q_knn_ivf the second-slowest
    * bench query in round 5.
    */
  private val modelCache = scala.collection.concurrent.TrieMap.empty[String, Model]

  def fitCached(corpusKey: String, df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): Model =
    modelCache.getOrElseUpdate(
      Seq(corpusKey, idCol, vecCol, nlist, iters).mkString("\u0001"),
      fit(df, idCol, vecCol, nlist, iters))

  /** Deterministic Lloyd k-means: seeds = the nlist lowest-id vectors,
    * `iters` assignment/update rounds. Assignment is distributed; the
    * per-cell mean reduction returns nlist×dim rows to the driver (the
    * codebook — small by definition).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      iters: Int = 3): Model = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    var centroids: Seq[Seq[Double]] = df
      .orderBy(col(idCol))
      .limit(nlist)
      // the rest of the stack (cellOf, the codegen kernels) takes float OR
      // double arrays; this driver-side read must too — a bare
      // getSeq[Float] ClassCastExceptions on an array<double> property
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toSeq)
      .toSeq
    for (_ <- 1 to iters) {
      val model = Model(centroids)
      val means = df
        .select(model.cellOf(col(vecCol)).as("cell"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        .toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    Model(centroids)
  }

  /** Approximate top-k: corpus assigned to cells once; each query scores only
    * its nprobe probe cells. Same output contract as Knn.bruteForceTopK.
    */
  def topK(model: Model, queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, metric: Knn.Metric = Knn.Cosine): DataFrame = {
    val q = queries.select(col(qIdCol).as("__qid"), col(qVecCol).as("__qvec"),
      explode(model.probeCells(col(qVecCol), nprobe)).as("__cell"))
    val c = corpus.select(col(idCol).as("__nid"), col(vecCol).as("__nvec"),
      model.cellOf(col(vecCol)).as("__cell"))
    Knn.rankTopK(c.join(broadcast(q), Seq("__cell"))
      .filter(col("__qid") =!= col("__nid"))
      .select(col("__qid"), col("__nid"),
        round(Knn.score(metric, col("__qvec"), col("__nvec")), 6).as("__score")), k)
  }
}
