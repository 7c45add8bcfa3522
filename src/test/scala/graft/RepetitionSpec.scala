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

  test("GramStats counters match the HOF formulation on adversarial tokenizations") {
    // double/leading/trailing spaces (empty tokens KEPT, like split(text,' ')),
    // unicode, repeated unicode grams, exactly-n words, n-1 words
    val tricky = Seq(
      (0L, "a  b a  b a"), (1L, " lead"), (2L, "trail "),
      (3L, "héllo wörld héllo wörld héllo"), (4L, "x y"), (5L, "solo"),
      (6L, ""), (7L, "a a a a a a"), (8L, "日本 語 日本 語"))
      .toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val native = tricky
        .select(col("doc_id"),
          graft.functions.TextHashExpressions.gramStats(col("text"), n).as("st"))
        .select(col("doc_id"), col("st.total"), col("st.ndistinct"), col("st.top"))
        .orderBy("doc_id").collect().toSeq
      val ws = split(col("text"), " ")
      val grams = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => array_join(slice(ws, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      val hof = tricky
        .withColumn("g", grams)
        .select(col("doc_id"), size(col("g")).as("total"),
          size(array_distinct(col("g"))).as("ndistinct"),
          coalesce(array_max(transform(array_distinct(col("g")),
            gg => size(filter(col("g"), x => x === gg)))), lit(0)).as("top"))
        .orderBy("doc_id").collect().toSeq
      assert(native == hof, s"n=$n: gram_stats must equal the HOF counters")
    }
  }

  test("GramHashes ≡ transform(ngrams, xxhash64) — duplicates kept, order kept") {
    val tricky = Seq(
      (0L, "a  b a  b a"), (1L, "héllo wörld héllo wörld héllo"),
      (2L, "x y"), (3L, ""), (4L, "a a a a a a"))
      .toDF("doc_id", "text")
    for (n <- Seq(2, 8)) {
      val native = tricky.select(col("doc_id"),
          graft.functions.TextHashExpressions.gramHashes(col("text"), n).as("h"))
        .orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq
      val ws = split(col("text"), " ")
      val grams = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => array_join(slice(ws, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      val hof = tricky.select(col("doc_id"),
          transform(grams, s => xxhash64(s)).as("h"))
        .orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq
      assert(native == hof, s"n=$n: gram_hashes must equal xxhash64 over joined grams")
    }
  }
}
