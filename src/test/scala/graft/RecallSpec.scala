package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vector.{Hnsw, Ivf, Knn}

/** ANN recall floors per index type — the reference pins recall@10 >= 95%
  * for HNSW at efSearch=64 (docs/ecosystem/performance.md:128); graft
  * asserts the same floor for HNSW on the ADVERSARIAL shape (isotropic
  * random embeddings, where distances concentrate) and for the bucketed
  * LSH / IVF paths on the realistic shape (clustered corpus — jittered
  * copies of each query planted among the random vectors, the structure
  * real embedding spaces have). The sf0.1 measurement of the same
  * configurations is the committed `scale/RECALL.txt` artifact.
  */
class RecallSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.01"
  private val k = 10

  private lazy val emb = graft.core.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")
  private lazy val queries = emb.filter(col("vec_id") < 50)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // clustered corpus: 12 jittered copies of every query vector planted in
  // the corpus; the true top-k of each query is dominated by its cluster
  private lazy val clustered = {
    val jittered = (1 to 12).map { j =>
      queries.select((col("vec_id") * 1000 + j).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.0f) + lit((j * 7 % 5 - 2) * 0.01f)).as("embedding"))
    }.reduce(_ unionByName _)
    emb.unionByName(jittered)
  }

  private def recall(brute: Set[(Long, Long)], got: Set[(Long, Long)]): Double =
    (brute & got).size.toDouble / brute.size

  test("hnsw recall@10 >= 0.95 at efSearch=64 on the uniform corpus (reference pin)") {
    val brute = pairs(Knn.bruteForceTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k))
    val r = recall(brute, pairs(Hnsw.topK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k, efSearch = 64)))
    info(f"hnsw efS=64 recall@10 = $r%.4f")
    assert(r >= 0.95, f"hnsw recall $r%.4f below the reference 0.95 pin")
  }

  test("lsh recall@10 >= 0.95 on the clustered corpus (bits=8 tables=4 probes=2)") {
    val brute = pairs(Knn.bruteForceTopK(queries, "vec_id", "embedding",
      clustered, "vec_id", "embedding", k))
    val r = recall(brute, pairs(Knn.lshTopK(queries, "vec_id", "embedding",
      clustered, "vec_id", "embedding", k, dim = 64, bits = 8, tables = 4,
      probes = 2)))
    info(f"lsh clustered recall@10 = $r%.4f")
    assert(r >= 0.95, f"lsh recall $r%.4f below the 0.95 floor")
  }

  test("ivf recall@10 >= 0.95 on the clustered corpus (nlist=8 nprobe=3)") {
    val brute = pairs(Knn.bruteForceTopK(queries, "vec_id", "embedding",
      clustered, "vec_id", "embedding", k))
    val m = Ivf.fit(clustered, "vec_id", "embedding", nlist = 8, iters = 2)
    val r = recall(brute, pairs(Ivf.topK(m, queries, "vec_id", "embedding",
      clustered, "vec_id", "embedding", k, nprobe = 3)))
    info(f"ivf clustered recall@10 = $r%.4f")
    assert(r >= 0.95, f"ivf recall $r%.4f below the 0.95 floor")
  }

  test("index create surfaces a recall warning for a low-recall configuration") {
    // LSH at narrow defaults on the ISOTROPIC corpus is the documented
    // footgun (recall@10 as low as 0.07, scale/RECALL.txt): the build-time
    // estimate must measure it and recallAdvice must fire with concrete
    // tuning guidance; the same surface stays quiet for HNSW (recall 1.0)
    import graft.frontends.gql.{GqlFrontend, GqlCreateVectorIndex, VectorIndexes}
    val vectors = emb.limit(400).withColumnRenamed("vec_id", "id")
    def build(ddl: String): VectorIndexes.VectorIndex =
      VectorIndexes.create(
        GqlFrontend.parseStatement(ddl).asInstanceOf[GqlCreateVectorIndex],
        vectors, "id")
    val lsh = build("CREATE VECTOR INDEX r_lsh ON Doc(embedding) USING LSH " +
      "OPTIONS(bits 12, tables 1)")
    val rLsh = lsh.estimateRecall(nQueries = 40)
    info(f"lsh bits=12 tables=1 estimated recall@10 = $rLsh%.4f")
    assert(rLsh < 0.9, f"expected a low-recall estimate, got $rLsh%.4f")
    val advice = lsh.recallAdvice(rLsh)
    assert(advice.isDefined && advice.get.contains("hnsw"),
      s"advice must point at the high-recall method, got $advice")
    val hnsw = build("CREATE VECTOR INDEX r_hnsw ON Doc(embedding) USING HNSW")
    val rHnsw = hnsw.estimateRecall(nQueries = 40)
    info(f"hnsw estimated recall@10 = $rHnsw%.4f")
    assert(rHnsw >= 0.95 && hnsw.recallAdvice(rHnsw).isEmpty,
      f"hnsw must measure high recall with no advice, got $rHnsw%.4f")
  }

  test("auto-tune walks the LSH curve from a low-recall start to a better config") {
    import graft.frontends.gql.{GqlFrontend, GqlCreateVectorIndex, VectorIndexes}
    // the clustered corpus: auto-tune from the narrow footgun config must
    // measurably improve recall by moving along the documented curve
    // (fewer bits, more tables) and must return the BEST config tried
    val vectors = clustered.limit(600).withColumnRenamed("vec_id", "id")
    val stmt = GqlFrontend.parseStatement(
      "CREATE VECTOR INDEX r_tuned ON Doc(embedding) USING LSH " +
        "OPTIONS(bits 16, tables 1)").asInstanceOf[GqlCreateVectorIndex]
    val (idx, recall, hist) = VectorIndexes.autoTuneLsh(stmt, vectors, "id",
      floor = 0.9, maxSteps = 3)
    info(s"auto-tune history: ${hist.map { case (b, t, r) => f"($b,$t)->$r%.2f" }.mkString(" ")}")
    assert(hist.nonEmpty && hist.size <= 4, "bounded step budget")
    assert(recall == hist.map(_._3).max, "must return the best measured config")
    assert(recall > hist.head._3 || hist.head._3 >= 0.9,
      f"tuning must improve on the narrow start (start ${hist.head._3}%.2f, best $recall%.2f)")
    // each step moved in the curve's direction: bits never rise, tables never fall
    hist.sliding(2).foreach {
      case Seq((b1, t1, _), (b2, t2, _)) => assert(b2 <= b1 && t2 >= t1)
      case _ => ()
    }
    assert(idx.options("bits") <= 16 && idx.options("tables") >= 1)
  }
}
