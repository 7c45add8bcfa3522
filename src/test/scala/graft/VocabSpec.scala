package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.pipeline.TextAnalysis

/** Vocabulary construction: the exact shuffle count (q_vocab_topk) vs the
  * count-min-sketch estimate — the sketch is the 100 TB path when the term
  * domain outgrows a shuffle (one pass, mergeable, fixed memory). CMS
  * guarantees estimate >= exact and, with probability `confidence`,
  * estimate <= exact + eps * N; both bounds are asserted here against the
  * exact counts the oracle checks.
  */
class VocabSpec extends AnyFunSuite {
  import TestSpark._

  test("count-min sketch bounds the exact term counts") {
    val terms = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
    val total = terms.count()
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(20).collect().map(r => r.getString(0) -> r.getLong(1))

    val eps = 0.001
    val bytes = terms
      .select(expr(s"count_min_sketch(term, ${eps}d, 0.999d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))

    for ((term, n) <- exact) {
      val est = cms.estimateCount(term)
      assert(est >= n, s"CMS must never undercount: $term est=$est exact=$n")
      assert(est <= n + (eps * total).toLong + 1,
        s"CMS overcount beyond eps*N: $term est=$est exact=$n N=$total")
    }
  }
}
