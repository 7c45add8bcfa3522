package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Curation

/** The two physical forms of the repetition screens — per-row array
  * expressions vs explode + two-level aggregation — must be bit-identical,
  * including on the long (5k-token) documents the explode form exists for.
  */
class RepetitionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // synthetic web-scale docs: one highly repetitive (one gram dominates),
  // one mildly repetitive, one with all-distinct grams, plus edge shapes
  private lazy val docs = {
    val rng = new scala.util.Random(42)
    val spam = (Seq.fill(2500)("buy now").mkString(" "))                // 5000 words
    val mild = (0 until 5000).map(i => if (i % 10 == 0) "the" else s"w${rng.nextInt(50)}").mkString(" ")
    val uniq = (0 until 5000).map(i => s"u$i").mkString(" ")
    val tiny = "one two three two one"
    val single = "word" // < n words: must be dropped
    Seq((0L, spam), (1L, mild), (2L, uniq), (3L, tiny), (4L, single))
      .toDF("doc_id", "text")
  }

  test("explode form ≡ array form on 5k-token documents, doc dropped below n") {
    val allArray = Curation.repetitionStats(docs, "doc_id", "text",
        n = 2, longDocTokens = Int.MaxValue)
      .select("doc_id", "dupfrac", "topfrac").orderBy("doc_id").collect()
    val allExplode = Curation.repetitionStats(docs, "doc_id", "text",
        n = 2, longDocTokens = 2)
      .select("doc_id", "dupfrac", "topfrac").orderBy("doc_id").collect()
    assert(allArray.toSeq == allExplode.toSeq,
      "the two physical forms must produce bit-identical statistics")
    assert(allArray.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L),
      "sub-n-word documents carry no grams and are dropped")
  }

  test("default routing sends long docs through the aggregation form, same answer") {
    val routed = Curation.repetitionStats(docs, "doc_id", "text", n = 2)
      .select("doc_id", "dupfrac", "topfrac").orderBy("doc_id").collect()
    val allArray = Curation.repetitionStats(docs, "doc_id", "text",
        n = 2, longDocTokens = Int.MaxValue)
      .select("doc_id", "dupfrac", "topfrac").orderBy("doc_id").collect()
    assert(routed.toSeq == allArray.toSeq)
    // and the screens separate the engineered shapes as designed
    val byId = routed.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byId(0L)._1 > 0.99 && byId(0L)._2 > 0.49, "spam doc must trip both screens")
    assert(byId(2L)._1 == 0.0, "all-distinct doc has zero duplicate-gram fraction")
    assert(byId(1L)._1 > 0.05, "mildly repetitive doc exceeds the dupfrac threshold")
  }
}
